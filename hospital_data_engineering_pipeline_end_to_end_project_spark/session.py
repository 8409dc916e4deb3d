"""SparkSession factory.

The reference relies on an ambient Databricks session with implicit AQE
(SURVEY.md section 4).  Here the session is explicit and tuned for both
the local[32] test harness and a real multi-executor cluster: AQE on
(runtime coalesce + skew-join handling), Arrow on (fast pandas-UDF and
toPandas paths), and a shuffle-partition count sized from the
environment rather than Spark's 200 default.

At 100 TB the same settings hold: AQE re-plans post-shuffle partition
counts from actual map output sizes, so an over-provisioned static
``spark.sql.shuffle.partitions`` is coalesced for free; skewed join
keys are split by the skew-join rule instead of stalling one executor.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _cpus() -> str:
    return os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(
    app_name: str = "hospital-engine",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Settings are chosen for scale-out behavior, not just local runs:

    - ``spark.sql.adaptive.enabled`` + coalescePartitions + skewJoin:
      runtime re-planning from real shuffle statistics.
    - ``spark.sql.execution.arrow.pyspark.enabled``: Arrow-batched
      transfer for the pandas-UDF extension operators.
    - ``spark.sql.shuffle.partitions``: sized to the harness; on a real
      cluster set this to ~2-3x total cores (AQE coalesces the rest).
    - ``spark.sql.parquet.filterPushdown`` / vectorized reader are Spark
      defaults and intentionally left on.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # push full-scan MIN/MAX/COUNT to parquet footer statistics
        # (exact — the reader falls back to a normal scan whenever a
        # predicate, group-by, or non-pushable type makes stats
        # insufficient); at 100 TB this turns bare row-count/extent
        # probes into metadata reads
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # events.parquet stores ts as INT64 TIMESTAMP(NANOS) which the
        # Spark parquet reader rejects; read it as epoch-nanos LongType
        # and convert explicitly (exact integer arithmetic, never via
        # double division — 1.7e18 ns exceeds double's 2^53 integer range)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local-harness hygiene; harmless on a cluster where master is
        # supplied by the submitter
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{_cpus()}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
