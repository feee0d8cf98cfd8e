"""SparkSession factory with the engine's config posture.

Reference parity (SURVEY.md §4): the reference is fail-fast on parse errors
(``MsgIO.scala:93-96``, ``MsgTransformations.scala:216-221``). We reproduce
that *posture* with ``spark.sql.ansi.enabled=true`` so casts throw instead of
silently yielding NULL. Individual operators that intentionally tolerate bad
input use ``try_cast`` explicitly, so they behave identically whether or not
the session that runs them is ANSI (the driver harness supplies its own
session; nothing in this package may depend on session-level ANSI).

Scale posture: shuffle partitions default to the local core count for tests
(on a real cluster you'd size this to ~2-3x total executor cores or rely on
AQE coalescing, which is enabled here). AQE handles skew-join splitting and
partition coalescing at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "monster-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    ansi: bool = True,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # default: one shuffle partition per core — right for the test SFs.
        # At derived scale (sf100: 600M-row lineitem) the rule is ~128-256MB
        # per partition, NOT per-core: 32 partitions x 19M rows each spills
        # or OOMs the sort. SPARK_GRAFT_SHUFFLE_PARTITIONS overrides for
        # scale soaks (AQE coalesces the excess back down at small SFs).
        env_sp = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        if env_sp:
            shuffle_partitions = int(env_sp)
        else:
            shuffle_partitions = os.cpu_count() or 32 if cpus == "*" else int(cpus)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true" if ansi else "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
