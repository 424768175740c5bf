"""SparkSession factory with scale-oriented defaults.

The reference pins every DB session to UTC (``SET TIME_ZONE='+00:00'``,
src/paradump/paradump.go:177,:385,:538); we mirror that with
``spark.sql.session.timeZone=UTC`` so temporal values round-trip identically.

Defaults are chosen for the "would this survive 100 TB" test:

* AQE on (runtime coalescing, skew-join splitting) — replaces the
  reference's adaptive chunk growth (src/paradump/paradump.go:1742-1747).
* Arrow on for pandas-UDF interchange (the dialect renderers).
* shuffle partitions sized from the local core count here; on a real
  cluster callers pass ``shuffle_partitions`` ~ 2-3x total cores or rely
  on AQE coalescing from a higher initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Arrow batch size bounds pandas-UDF memory per task (SURVEY §4 X8).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Parquet input split target; at 100 TB this keeps ~128 MB tasks.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
}

# Local-mode heap: plain `python script.py` launches the JVM with the 1g
# default, which throttles 32 concurrent parquet writers (row-group
# buffers) and makes mid-size shuffles spill.  Builder conf IS honored
# here because it reaches spark-submit before JVM launch; it no-ops on a
# JVM that is already running (cluster mode sets executor memory itself).
_DRIVER_MEM = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")


def build_session(
    app_name: str = "paradump_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    cluster pass ``None`` with a pre-set master in spark-submit and these
    confs still apply.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if master.startswith("local"):
        conf["spark.driver.memory"] = _DRIVER_MEM
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def get_session() -> SparkSession:
    """Return the active session, building a default one if absent."""
    active = SparkSession.getActiveSession()
    return active if active is not None else build_session()
