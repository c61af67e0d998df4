"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32), but every
config below is chosen for the 1000-executor / 100 TB design point:

- AQE on (runtime coalesce + skew-join splitting),
- Arrow on (all our Python hot paths are pandas UDFs / mapInPandas),
- UTC session timezone (determinism across engines — the DuckDB oracle
  compares timestamps),
- shuffle partitions sized by env (32 locally; a real cluster submit
  overrides with ``--conf spark.sql.shuffle.partitions=...``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # parquet scans: keep row groups aligned with executor memory at scale
    "spark.sql.files.maxPartitionBytes": "134217728",
    # our pandas UDFs stream batches; bound batch size so image-bytes rows
    # (up to MBs each) never blow the Arrow batch
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "8g",
    # iterative loops build plans whose leaves are localCheckpointed
    # LogicalRDDs with UNKNOWN size; Catalyst's default stats visitor
    # multiplies child sizes, and unknown defaults to Long.MaxValue —
    # deep plans then produce million-digit BigInteger size estimates and
    # the driver burns minutes in BigInteger.multiply (observed via
    # jstack). A finite default keeps estimates sane.
    "spark.sql.defaultSizeInBytes": str(64 * 1024 * 1024),
}


def get_spark(
    app: str = "dotnetspider-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master``/``shuffle_partitions`` default from env so the same code path
    serves pytest (small), bench (local[8] vs local[32] scaling runs) and a
    real ``spark-submit`` (which passes its own master and ignores ours).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
        )
    b = SparkSession.builder.appName(app).master(master)
    for k, v in _DEFAULTS.items():
        b = b.config(k, v)
    b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    b = b.config("spark.default.parallelism", str(shuffle_partitions))
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def sf_dir(default: str = "/root/testdata/sf0.1") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)
