"""Entity sinks — the four DB write modes over parquet tables.

Reference: ``DbEntityPipeline`` (DbEntityPipeline.cs:105-138) dispatches
to one of four modes (MySqlEntityPipeline.cs:118-176+):

- ``Insert``                   -> plain append
- ``InsertAndIgnoreDuplicate`` -> ``INSERT IGNORE`` (first write wins;
  the DEFAULT, DbEntityPipeline.cs:49-54)
- ``InsertNewAndUpdateOld``    -> ``ON DUPLICATE KEY UPDATE`` (upsert,
  last write wins)
- ``Update``                   -> update only the ``[Update]`` columns of
  matching keys

In production these are Iceberg ``MERGE INTO`` statements (SURVEY §2.8);
the sandbox has no Iceberg runtime, so ``ParquetTable`` implements the
same row-level semantics as read-modify-overwrite with an atomic
directory swap — correct single-writer snapshot semantics, the layout
the crawl checkpointer already uses. Batch-internal duplicates resolve
by ``seq_col`` order when given (mirroring arrival order through
``PipelineCachedSize`` batching, Spider.cs:1168-1186) else arbitrarily
via key order.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class ParquetTable:
    """Keyed table with DB-pipeline write modes (single-writer)."""

    def __init__(self, spark: SparkSession, path: str, key_cols: list[str]):
        assert key_cols
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)

    # -------------------------------------------------------------- util

    def exists(self) -> bool:
        return os.path.exists(f"{self.path}/_SUCCESS")

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def _swap_in(self, df: DataFrame) -> None:
        """Write to a temp dir, then atomically swap the table dir."""
        tmp = f"{self.path}.__tmp_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}.__old_{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)

    def _first_per_key(self, df: DataFrame, seq_col: str | None, last: bool) -> DataFrame:
        order_col = F.col(seq_col) if seq_col else F.concat_ws("\u0001", *self.key_cols)
        order = order_col.desc() if last else order_col.asc()
        w = Window.partitionBy(*self.key_cols).orderBy(order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    # ------------------------------------------------------------- modes

    def insert(self, df: DataFrame) -> None:
        """Plain append (Insert)."""
        df.write.mode("append").parquet(self.path)

    def insert_ignore(self, df: DataFrame, seq_col: str | None = None) -> None:
        """INSERT IGNORE: existing keys keep their row; within the batch
        the FIRST row per key wins (MySqlEntityPipeline.cs:118-145)."""
        batch = self._first_per_key(df, seq_col, last=False)
        if self.exists():
            existing_keys = self.read().select(*self.key_cols).distinct()
            batch = batch.join(existing_keys, self.key_cols, "left_anti")
        self.insert(batch)

    def upsert(self, df: DataFrame, seq_col: str | None = None) -> None:
        """InsertNewAndUpdateOld: new keys insert, existing keys take the
        batch's LAST row (MySqlEntityPipeline.cs:147-176)."""
        batch = self._first_per_key(df, seq_col, last=True)
        if not self.exists():
            self._swap_in(batch)
            return
        current = self.read()
        keep = current.join(
            batch.select(*self.key_cols).distinct(), self.key_cols, "left_anti"
        )
        self._swap_in(keep.unionByName(batch.select(*current.columns)))

    def update(
        self, df: DataFrame, update_cols: list[str], seq_col: str | None = None
    ) -> None:
        """Update mode: only ``[Update]`` columns change, and only for
        keys already present; unknown keys are DROPPED (not inserted)."""
        cols = self.key_cols + update_cols + ([seq_col] if seq_col else [])
        batch = self._first_per_key(df.select(*cols), seq_col, last=True)
        if seq_col:
            batch = batch.drop(seq_col)
        current = self.read()
        renames = {c: f"__new_{c}" for c in update_cols}
        b = batch
        for c, n in renames.items():
            b = b.withColumnRenamed(c, n)
        joined = current.join(b, self.key_cols, "left")
        out = joined.select(
            *[
                F.coalesce(F.col(renames[c]), F.col(c)).alias(c)
                if c in renames
                else F.col(c)
                for c in current.columns
            ]
        )
        self._swap_in(out)


def resolve_table_name(name: str, postfix: str = "none", today=None) -> str:
    """Schema.TableNamePostfix resolution (Schema.cs:58-90): tables roll
    by date — ``{name}_2017_12_12`` (today / monday / first_day_of_month)
    or ``{name}_2017_12`` (month / last_month).

    ``today`` is injectable for tests/resume determinism. NB the
    reference's Monday branch computes ``now + 1 day`` for every day
    except Sunday (Schema.cs:75-81 — ``? 6 : -1`` where the intent is
    the day-of-week delta); this implements the documented intent (the
    most recent Monday), matching the Selectable 'monday' environment
    macro the same codebase uses (Selectable.cs:95-101).
    """
    import datetime as _dt

    today = today or _dt.date.today()
    first = today.replace(day=1)
    if postfix == "none":
        return name
    if postfix == "today":
        return f"{name}_{today:%Y_%m_%d}"
    if postfix == "monday":
        monday = today - _dt.timedelta(days=today.weekday())
        return f"{name}_{monday:%Y_%m_%d}"
    if postfix == "first_day_of_month":
        return f"{name}_{first:%Y_%m_%d}"
    if postfix == "month":
        return f"{name}_{first:%Y_%m}"
    if postfix == "last_month":
        last = (first - _dt.timedelta(days=1)).replace(day=1)
        return f"{name}_{last:%Y_%m}"
    raise ValueError(f"unknown table postfix {postfix!r}")
