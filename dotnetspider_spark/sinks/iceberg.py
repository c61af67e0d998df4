"""Optional Apache Iceberg backend for the keyed-table sinks.

The north rule names Iceberg tables as the frontier/corpus substrate.
This sandbox ships no Iceberg runtime jar, so the engine's default
backend is ``ParquetTable`` (sinks/tables.py) — an atomic-swap
delta-parquet emulation of the same single-writer snapshot semantics.
This module makes the design claim executable on a real cluster
WITHOUT code changes: when the active ``SparkSession`` has an Iceberg
catalog configured (``spark.sql.catalog.<name> =
org.apache.iceberg.spark.SparkCatalog`` and the class on the
classpath), :func:`open_table` returns an :class:`IcebergTable` that
implements the exact ``ParquetTable`` write-mode interface with native
``MERGE INTO`` / snapshot time travel; otherwise it returns the
parquet implementation.

Write-mode mapping (DbEntityPipeline.cs:105-138 semantics, same as
ParquetTable):

====================  =============================================
mode                  Iceberg statement
====================  =============================================
``insert``            ``writeTo(t).append()``
``insert_ignore``     ``MERGE ... WHEN NOT MATCHED THEN INSERT *``
``upsert``            ``MERGE ... WHEN MATCHED UPDATE * / INSERT *``
``update``            ``MERGE ... WHEN MATCHED THEN UPDATE SET
                      <update_cols>`` (no NOT MATCHED: unknown keys
                      are dropped, like the reference's ``Update``)
====================  =============================================

Batch-internal duplicate resolution (first/last per key by ``seq_col``)
is shared with ``ParquetTable`` so both backends resolve identically.

Time travel: ``read(version=...)`` maps to ``VERSION AS OF`` — the
native form of what ``crawler/timetravel.py`` provides over the
delta-parquet manifests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dotnetspider_spark.sinks.tables import ParquetTable

_ICEBERG_CATALOG_CLASSES = (
    "org.apache.iceberg.spark.SparkCatalog",
    "org.apache.iceberg.spark.SparkSessionCatalog",
)


def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of a usable Iceberg catalog on this session, or None.

    A catalog counts only when BOTH the conf entry exists and its
    implementation class loads (conf without the jar is a
    misconfiguration, not a backend). Checks the RUNTIME SQL conf
    (``SET``) merged over the SparkConf snapshot: catalogs registered
    after session creation (``spark.conf.set(...)``) live only in
    SQLConf and are fully usable — reading just
    ``sparkContext.getConf()`` would silently ignore them.
    """
    try:
        confs = dict(spark.sparkContext.getConf().getAll())
        confs.update(
            (r["key"], r["value"])
            for r in spark.sql("SET").collect()
            if r["key"].startswith("spark.sql.catalog.")
        )
    except Exception:  # pragma: no cover - defensive: session torn down
        return None
    for k, v in confs.items():
        if not k.startswith("spark.sql.catalog."):
            continue
        name = k[len("spark.sql.catalog."):]
        if "." in name:  # sub-keys like spark.sql.catalog.x.type
            continue
        if v in _ICEBERG_CATALOG_CLASSES and _class_loadable(spark, v):
            return name
    return None


def _class_loadable(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


class IcebergTable:
    """``ParquetTable``-interface adapter over a native Iceberg table.

    ``ident`` is the catalog-qualified table name
    (``<catalog>.<db>.<table>``). The first write creates the table
    (``createOrReplace`` on insert paths when absent).
    """

    def __init__(self, spark: SparkSession, ident: str, key_cols: list[str]):
        assert key_cols
        self.spark = spark
        self.ident = ident
        self.key_cols = list(key_cols)

    # -------------------------------------------------------------- util

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.ident)

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        """Current table, or time travel to an Iceberg SNAPSHOT ID via
        the documented ``snapshot-id`` read option. Note this is
        Iceberg's generated long id, NOT the parquet layer's sequential
        iteration number — map iterations to snapshot ids through the
        ``TableCheckpointer`` manifests (which record what was current
        at each checkpoint), the same indirection
        ``crawler/timetravel.py`` uses over delta-parquet manifests."""
        if snapshot_id is None:
            return self.spark.read.table(self.ident)
        return (
            self.spark.read.option("snapshot-id", snapshot_id)
            .table(self.ident)
        )

    def _dedup(self, df: DataFrame, seq_col: str | None, last: bool) -> DataFrame:
        # identical batch-internal resolution to the parquet backend
        return ParquetTable._first_per_key(self, df, seq_col, last)

    def _merge(self, batch: DataFrame, clauses: str) -> None:
        batch.createOrReplaceTempView("__iceberg_merge_src")
        on = " AND ".join(f"t.{k} = s.{k}" for k in self.key_cols)
        self.spark.sql(
            f"MERGE INTO {self.ident} t USING __iceberg_merge_src s "
            f"ON {on} {clauses}"
        )

    # ------------------------------------------------------------- modes

    def insert(self, df: DataFrame) -> None:
        if not self.exists():
            df.writeTo(self.ident).create()
        else:
            df.writeTo(self.ident).append()

    def insert_ignore(self, df: DataFrame, seq_col: str | None = None) -> None:
        batch = self._dedup(df, seq_col, last=False)
        if not self.exists():
            batch.writeTo(self.ident).create()
            return
        self._merge(batch, "WHEN NOT MATCHED THEN INSERT *")

    def upsert(self, df: DataFrame, seq_col: str | None = None) -> None:
        batch = self._dedup(df, seq_col, last=True)
        if not self.exists():
            batch.writeTo(self.ident).create()
            return
        self._merge(
            batch,
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        )

    def update(
        self, df: DataFrame, update_cols: list[str], seq_col: str | None = None
    ) -> None:
        cols = self.key_cols + update_cols + ([seq_col] if seq_col else [])
        batch = self._dedup(df.select(*cols), seq_col, last=True)
        if seq_col:
            batch = batch.drop(seq_col)
        sets = ", ".join(f"t.{c} = s.{c}" for c in update_cols)
        # no NOT MATCHED clause: unknown keys dropped (Update mode)
        self._merge(batch, f"WHEN MATCHED THEN UPDATE SET {sets}")


class TableCheckpointer:
    """``Checkpointer``-interface twin (crawler/loop.py:495) that stores
    the per-iteration manifests as ROWS of a keyed table instead of
    ``_MANIFEST.json`` files — the backend comes from :func:`open_table`,
    so on an Iceberg-equipped cluster each ``save_manifest`` is a native
    ``MERGE INTO`` commit (snapshot history = Iceberg's own snapshot
    list), while the sandbox leg runs on the atomic-swap parquet table
    and is fully testable offline. The manifest payload layout is
    byte-identical to the file-based Checkpointer's JSON, so
    ``crawler/timetravel.py`` consumers can parse either source.
    """

    def __init__(self, spark: SparkSession, location: str,
                 backend: str = "auto"):
        self.spark = spark
        self.table = open_table(spark, location, ["iter"], backend=backend)

    def save_manifest(self, it: int, state: dict) -> None:
        import json
        import time

        payload = json.dumps({"last_iter": it, "ts": time.time(), **state})
        df = self.spark.createDataFrame(
            [(it, payload)], "iter long, payload string"
        )
        # upsert: re-running an iteration after a crash overwrites its
        # manifest row (same idempotence as os.replace on the JSON file)
        self.table.upsert(df)

    def load_manifest(self) -> dict | None:
        import json

        if not self.table.exists():
            return None
        from pyspark.sql import functions as F

        rows = (
            self.table.read().orderBy(F.col("iter").desc()).limit(1).collect()
        )
        if not rows:
            return None
        try:
            m = json.loads(rows[0]["payload"])
            m["last_iter"]
            return m
        except (ValueError, KeyError):
            return None

    def last_iter(self) -> int | None:
        m = self.load_manifest()
        return None if m is None else m["last_iter"]

    def manifest_for(self, it: int) -> dict | None:
        """Versioned-manifest read (the ``manifests/iter=N.json`` analog
        — every row is retained, so any checkpointed iteration is
        reconstructable)."""
        import json

        if not self.table.exists():
            return None
        from pyspark.sql import functions as F

        rows = self.table.read().filter(F.col("iter") == it).collect()
        return json.loads(rows[0]["payload"]) if rows else None


def open_table(
    spark: SparkSession,
    location: str,
    key_cols: list[str],
    backend: str = "auto",
):
    """Backend-selecting factory for keyed sink tables.

    ``backend='auto'``: Iceberg when a configured+loadable catalog
    exists on the session AND ``location`` is a table identifier, else
    delta-parquet. ``location`` is either a filesystem path (contains a
    path separator — always the parquet backend; a path is not a valid
    SQL identifier, so 'auto' must not feed it to a catalog) or a table
    identifier: a full ``catalog.db.table`` or a bare name qualified
    into ``<catalog>.default.<name>``.
    """
    if backend not in ("auto", "iceberg", "parquet"):
        raise ValueError(f"unknown backend {backend!r}")
    is_path = "/" in location or "\\" in location
    cat = (
        iceberg_catalog(spark) if backend in ("auto", "iceberg") else None
    )
    if backend == "iceberg":
        if cat is None:
            raise RuntimeError(
                "Iceberg backend requested but no Iceberg catalog is "
                "configured/loadable on this SparkSession"
            )
        if is_path:
            raise ValueError(
                f"Iceberg backend needs a table identifier, got the "
                f"filesystem path {location!r} — pass 'catalog.db.table' "
                "or a bare table name"
            )
    if cat is not None and not is_path:
        ident = location if "." in location else f"{cat}.default.{location}"
        return IcebergTable(spark, ident, key_cols)
    return ParquetTable(spark, location, key_cols)
