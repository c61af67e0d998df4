"""Partitioned cuckoo-filter URL-seen set — deletable membership fallback.

The north rule asks for a cuckoo-filter fallback beside the bloom
(bloom.py): unlike blooms, cuckoo filters support DELETE, which matters
for retry-identity churn — a retried request's old identity can be
retired once the retry succeeds, keeping the approximate set tight when
identities are transient (Design.md:17-18 makes each retry a fresh
identity, so a long crawl accretes dead identities).

Standard partial-key cuckoo hashing (Fan et al., CoNEXT'14, public
algorithm): buckets of 4 slots × 16-bit fingerprints; an item's two
candidate buckets are ``i1 = h mod B`` and ``i2 = i1 XOR hash(fp)``;
insertion kicks a random-ish victim (deterministic LCG here — no RNG in
executors, resume-safe) up to 500 displacements. ~2^-13 fpp at 95% load.

Partitioning mirrors bloom.py: hash lanes JVM-side (``xxhash64``), one
filter row per bucket-partition, numpy-only batch math in cogrouped
pandas UDFs. The same prune-not-drop hybrid applies: ``contains`` False
is definitive, True routes to the exact anti-join.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CUCKOO_SCHEMA = "bucket int, n_buckets_fp long, n_items long, table binary"
_SLOTS = 4
_MAX_KICKS = 500


@dataclass(frozen=True)
class CuckooParams:
    expected_per_bucket: int = 1_000_000
    n_buckets: int = 64  # spark-level partitions, each holding one filter

    @property
    def n_fp_buckets(self) -> int:
        """Internal cuckoo buckets: next pow2 >= expected/(slots*0.95)."""
        need = max(16, int(self.expected_per_bucket / (_SLOTS * 0.95)))
        return 1 << (need - 1).bit_length()


class CuckooFilter:
    """In-core filter over a uint16 table of shape (n_buckets, 4).

    Fingerprint 0 marks an empty slot; real fingerprints are 1..65535.
    """

    def __init__(self, n_fp_buckets: int, table: np.ndarray | None = None):
        self.nb = n_fp_buckets
        self.table = (
            table
            if table is not None
            else np.zeros((n_fp_buckets, _SLOTS), dtype=np.uint16)
        )
        self._lcg = 1234567891  # deterministic victim picker

    @staticmethod
    def _fp(h: np.ndarray) -> np.ndarray:
        # splitmix-style multiply before taking the top bits, so inputs
        # with low high-bit entropy still spread across fingerprints
        mixed = h.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        mixed ^= mixed >> np.uint64(29)
        fp = (mixed >> np.uint64(48)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h.astype(np.uint64) % np.uint64(self.nb)).astype(np.int64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key displacement: i XOR (fp * odd-constant) mod nb
        mix = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) % np.uint64(self.nb)
        return (i.astype(np.uint64) ^ mix).astype(np.int64) % self.nb

    def _rand(self) -> int:
        self._lcg = (self._lcg * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        return self._lcg

    def add_one(self, h: int) -> bool:
        fp = int(self._fp(np.array([h]))[0])
        i1 = int(self._i1(np.array([h]))[0])
        i2 = int(self._alt(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        for i in (i1, i2):
            empty = np.where(self.table[i] == 0)[0]
            if len(empty):
                self.table[i, empty[0]] = fp
                return True
        i = i1 if self._rand() & 1 else i2
        for _ in range(_MAX_KICKS):
            slot = self._rand() % _SLOTS
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = int(self._alt(np.array([i]), np.array([fp], dtype=np.uint16))[0])
            empty = np.where(self.table[i] == 0)[0]
            if len(empty):
                self.table[i, empty[0]] = fp
                return True
        return False  # table over capacity

    def add_many(self, hashes: np.ndarray) -> int:
        """Bulk insert, vectorized: each round places the first occurrence
        of every distinct target bucket into its first empty slot (a
        scatter over unique rows — race-free), items whose primary bucket
        is full retarget to their alternate once, and only items with
        BOTH buckets full fall back to the per-item displacement loop.
        Below the design load factor the kick path is near-empty, so the
        build is numpy-bound instead of Python-loop-bound."""
        n = len(hashes)
        if n == 0:
            return 0
        h = np.asarray(hashes).astype(np.uint64)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._alt(i1, fp)
        target = i1.copy()
        on_alt = np.zeros(n, dtype=bool)
        kick: list[int] = []
        ok = 0
        pending = np.arange(n)
        while len(pending):
            t = target[pending]
            # first occurrence per bucket this round: scatter-safe
            _, first_idx = np.unique(t, return_index=True)
            sel = pending[first_idx]
            rest = np.delete(pending, first_idx)
            emp = self.table[target[sel]] == 0
            has = emp.any(axis=1)
            slot = emp.argmax(axis=1)
            place = sel[has]
            self.table[target[place], slot[has]] = fp[place]
            ok += len(place)
            full = sel[~has]
            exhausted = full[on_alt[full]]  # both buckets full -> kick
            switch = full[~on_alt[full]]
            target[switch] = i2[switch]
            on_alt[switch] = True
            kick.extend(int(x) for x in exhausted)
            pending = np.concatenate([rest, switch])
        for idx in kick:
            ok += self.add_one(int(hashes[idx]))
        return ok

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        fp = self._fp(hashes)
        i1 = self._i1(hashes)
        i2 = self._alt(i1, fp)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete(self, hashes: np.ndarray) -> np.ndarray:
        """Remove one copy of each present fingerprint; returns removed mask."""
        out = np.zeros(len(hashes), dtype=bool)
        fp = self._fp(hashes)
        i1 = self._i1(hashes)
        i2 = self._alt(i1, fp)
        for n in range(len(hashes)):
            for i in (int(i1[n]), int(i2[n])):
                slots = np.where(self.table[i] == fp[n])[0]
                if len(slots):
                    self.table[i, slots[0]] = 0
                    out[n] = True
                    break
        return out


def _lanes(df: DataFrame, params: CuckooParams, identity_col: str) -> DataFrame:
    ident = F.col(identity_col)
    return df.withColumn("__h", F.xxhash64(ident)).withColumn(
        "__bucket", F.pmod(F.xxhash64(ident, F.lit(7)), F.lit(params.n_buckets)).cast("int")
    )


def build_cuckoo(
    seen: DataFrame,
    params: CuckooParams | None = None,
    identity_col: str = "identity",
    existing: DataFrame | None = None,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Fold identities into per-bucket cuckoo rows; optionally start from
    ``existing`` and apply ``deletes`` (retired identities) first."""
    params = params or CuckooParams()
    nb = params.n_fp_buckets
    lanes = _lanes(seen, params, identity_col).select(
        "__bucket", "__h", F.lit(False).alias("__del")
    )
    if deletes is not None:
        lanes = lanes.unionByName(
            _lanes(deletes, params, identity_col).select(
                "__bucket", "__h", F.lit(True).alias("__del")
            )
        )
    if existing is not None:
        prior = existing.select(
            F.col("bucket").alias("__bucket"),
            F.col("n_items").alias("__prior_n"),
            F.col("table").alias("__prior_table"),
        )
        lanes = lanes.join(prior, "__bucket", "left")
    else:
        lanes = lanes.withColumn("__prior_n", F.lit(None).cast("long")).withColumn(
            "__prior_table", F.lit(None).cast("binary")
        )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["__bucket"].iloc[0])
        prior = pdf["__prior_table"].iloc[0]
        table = (
            np.frombuffer(bytes(prior), dtype=np.uint16).reshape(nb, _SLOTS).copy()
            if prior is not None
            else None
        )
        cf = CuckooFilter(nb, table)
        n = int(pdf["__prior_n"].iloc[0] or 0) if prior is not None else 0
        dels = pdf[pdf["__del"]]
        if len(dels):
            n -= int(cf.delete(dels["__h"].to_numpy()).sum())
        adds = pdf[~pdf["__del"]]
        if len(adds):
            n += cf.add_many(adds["__h"].to_numpy())
        return pd.DataFrame(
            {
                "bucket": [bucket],
                "n_buckets_fp": [nb],
                "n_items": [max(n, 0)],
                "table": [cf.table.tobytes()],
            }
        )

    folded = lanes.groupBy("__bucket").applyInPandas(fold, CUCKOO_SCHEMA)
    if existing is not None:
        # carry prior filters of buckets untouched by this delta forward
        # (groupBy emits only buckets present in the delta — same
        # forgotten-bucket hazard as bloom.build_blooms)
        untouched = existing.join(folded.select("bucket"), "bucket", "left_anti")
        folded = folded.unionByName(untouched.select(*folded.columns))
    return folded


def probe_cuckoo(
    candidates: DataFrame,
    filters: DataFrame,
    params: CuckooParams | None = None,
    identity_col: str = "identity",
    flag_col: str = "maybe_seen",
) -> DataFrame:
    params = params or CuckooParams()
    lanes = _lanes(candidates, params, identity_col)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in lanes.schema.fields
    ) + f", {flag_col} boolean"

    def probe(cand: pd.DataFrame, filt: pd.DataFrame) -> pd.DataFrame:
        if filt.empty:
            cand[flag_col] = False
            return cand
        nb = int(filt["n_buckets_fp"].iloc[0])
        table = (
            np.frombuffer(bytes(filt["table"].iloc[0]), dtype=np.uint16)
            .reshape(nb, _SLOTS)
        )
        cf = CuckooFilter(nb, table.copy())
        cand[flag_col] = cf.contains(cand["__h"].to_numpy())
        return cand

    return (
        lanes.groupBy("__bucket")
        .cogroup(filters.groupBy("bucket"))
        .applyInPandas(probe, out_schema)
        .drop("__h", "__bucket")
    )
