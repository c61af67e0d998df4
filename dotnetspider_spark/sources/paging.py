"""DB-paged lazy frontier generation — the
``PagingQueueDuplicateRemovedScheduler`` analog (reference:
PagingQueueDuplicateRemovedScheduler.cs:56-155, SURVEY §2.1).

The reference keeps the request store in a DB and CLAIMS one page of it
at a time, materializing Request objects lazily so the full frontier
never exists in memory. The Spark-native shape (SURVEY's mapping):

    spark.range(page_lo, page_hi) -> mapInPandas(page generator)

- generation is EXECUTOR-side and O(pages_per_claim x page_size) per
  claim — the driver never holds request rows;
- the claim/complete state is an atomically-renamed JSON manifest (the
  same pattern as the crawl loop's snapshot manifest), so a killed run
  resumes mid-page-range: completed claims are never regenerated;
- a claim that was handed out but never completed IS regenerated after
  restart — safe, because ``page_rows`` must be deterministic and the
  downstream ``dedup_push`` (or any seen-set) makes re-emitted requests
  no-ops. Net effect: exactly-once request generation across restarts.

Typical wiring: claim -> ``seeds_to_frontier``/``dedup_push`` into the
frontier snapshot tables (or ``crawl(seeds=claim_df)``) -> ``complete``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from dotnetspider_spark.testing.datagen import SEED_SCHEMA

# derived from SEED_SCHEMA (not hand-listed) so a schema change cannot
# silently misalign the generator's DataFrame columns
_SEED_COLS = [f.split()[0] for f in SEED_SCHEMA.split(", ")]


@dataclass(frozen=True)
class PageClaim:
    page_lo: int
    page_hi: int  # exclusive


class PagedFrontierGenerator:
    """Claim-based lazy request generator over ``n_pages`` logical pages.

    ``page_rows``: a picklable, DETERMINISTIC ``fn(page_id) -> list[dict]``
    producing seed-schema rows (url required; missing keys defaulted,
    ``seq`` defaults to a page-monotone encoding) — the analog of the
    reference's per-page ``LoadRequests`` query (:101-155).
    """

    def __init__(
        self,
        spark: SparkSession,
        n_pages: int,
        page_rows,
        state_dir: str,
        pages_per_claim: int = 4,
        seq_stride: int = 1 << 20,
    ):
        self.spark = spark
        self.n_pages = n_pages
        self.page_rows = page_rows
        self.state_dir = state_dir
        self.pages_per_claim = pages_per_claim
        self.seq_stride = seq_stride
        os.makedirs(state_dir, exist_ok=True)
        self._completed: list[list[int]] = self._load()

    # ------------------------------------------------------------ state

    def _manifest(self) -> str:
        return f"{self.state_dir}/_PAGES.json"

    def _load(self) -> list[list[int]]:
        try:
            with open(self._manifest()) as f:
                return json.load(f)["completed"]
        except (FileNotFoundError, json.JSONDecodeError, KeyError):
            return []

    def _save(self) -> None:
        tmp = self._manifest() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"completed": self._completed}, f)
        os.replace(tmp, self._manifest())

    def _next_page(self) -> int:
        """First page not covered by a completed claim (claims complete
        in order in the sequential protocol; merged scan handles gaps)."""
        nxt = 0
        for lo, hi in sorted(self._completed):
            if lo > nxt:
                break
            nxt = max(nxt, hi)
        return nxt

    def remaining_pages(self) -> int:
        return self.n_pages - self._next_page()

    # ------------------------------------------------------------ claims

    def claim_next(self) -> tuple[PageClaim, DataFrame] | None:
        """Claim the next uncompleted page range and generate its
        requests DISTRIBUTED. Returns None when the range is exhausted.
        The claim is not persisted until :meth:`complete` — a crash
        between the two regenerates it (deterministic => exactly-once
        after dedup)."""
        import pandas as pd

        lo = self._next_page()
        if lo >= self.n_pages:
            return None
        hi = min(lo + self.pages_per_claim, self.n_pages)
        page_rows = self.page_rows
        stride = self.seq_stride
        defaults = {
            "method": "GET", "referer": None, "origin": None, "content": None,
            "headers": None, "priority": 0, "depth": 1, "retried": 0,
        }

        def gen(batches):
            for pdf in batches:
                rows = []
                for pid in pdf["id"]:
                    for i, r in enumerate(page_rows(int(pid))):
                        row = dict(defaults)
                        row.setdefault("seq", int(pid) * stride + i)
                        row.update(r)
                        rows.append(row)
                yield pd.DataFrame(rows, columns=_SEED_COLS)

        df = self.spark.range(
            lo, hi, numPartitions=max(1, hi - lo)
        ).mapInPandas(gen, schema=SEED_SCHEMA)
        return PageClaim(lo, hi), df

    def complete(self, claim: PageClaim) -> None:
        """Durably mark the claim done (atomic manifest rename)."""
        self._completed.append([claim.page_lo, claim.page_hi])
        self._save()
