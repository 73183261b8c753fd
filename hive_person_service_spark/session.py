"""SparkSession construction + the engine's config block (SURVEY.md §4).

Two entry paths:
  * ``get_spark()``      -- build a local session (tests, bench.py).
  * ``configure(spark)`` -- apply runtime-settable engine confs to a session
                            we did not build (the driver hands us one).

Config rationale (each is required for oracle agreement or scale):
  - session.timeZone=UTC .......... DuckDB oracle agreement on timestamps
  - legacy.parquet.nanosAsLong .... events.parquet is TIMESTAMP(NANOS); Spark
                                    4.x hard-errors without this (FIXTURES.md)
  - adaptive.enabled .............. AQE: runtime coalesce, skew-join split,
                                    broadcast promotion -- the 100 TB story
  - shuffle.partitions ............ 2x cores locally; at cluster scale AQE
                                    coalesces from a high initial number
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

# Directory that holds the vendored pure-Python google.protobuf fallback
# (vendor/protobuf_shim/google/protobuf). transformWithStateInPandas needs a
# protobuf runtime in BOTH the driver and the Python workers; this container
# ships no protobuf wheel, so we provide a minimal wire-format shim and put
# it on sys.path + PYTHONPATH (workers inherit PYTHONPATH through the JVM).
_PROTOBUF_SHIM_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "vendor", "protobuf_shim"
)


def _ensure_protobuf_runtime() -> None:
    """Make ``google.protobuf`` importable, preferring a real install.

    Must run BEFORE the JVM starts: Python workers are launched by the JVM
    with a PYTHONPATH merged from the JVM process environment, so mutating
    os.environ afterwards would only affect the driver."""
    try:
        import google.protobuf  # noqa: F401  (real wheel present)
        return
    except ImportError:
        pass
    if _PROTOBUF_SHIM_DIR not in sys.path:
        sys.path.insert(0, _PROTOBUF_SHIM_DIR)
    parts = os.environ.get("PYTHONPATH", "")
    if _PROTOBUF_SHIM_DIR not in parts.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _PROTOBUF_SHIM_DIR + (os.pathsep + parts if parts else "")
        )

# Confs that are runtime-settable (SQLConf) -- safe to apply to any session.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas_udf / applyInPandas paths (the only sanctioned
    # Python-in-the-data-path mechanism in this engine).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an externally built session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Static conf on this build -- leave whatever the session has.
            pass
    _ensure_protobuf_runtime()
    try:
        # Python functions capture sc.environment at creation; appending the
        # shim here makes workers of an externally built session import it
        # too (PythonWorkerFactory merges this PYTHONPATH with its own).
        env = spark.sparkContext.environment
        if _PROTOBUF_SHIM_DIR in sys.path:  # shim active in the driver
            prev = env.get("PYTHONPATH", "")
            if _PROTOBUF_SHIM_DIR not in prev.split(os.pathsep):
                env["PYTHONPATH"] = (
                    _PROTOBUF_SHIM_DIR + (os.pathsep + prev if prev else "")
                )
    except Exception:
        pass
    return spark


def get_spark(
    app_name: str = "hive-person-service-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine config block.

    Locally: ``local[$SPARK_GRAFT_CPUS]`` (default all cores). On a real
    cluster the same code runs unchanged -- master comes from spark-submit.
    """
    _ensure_protobuf_runtime()
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_s = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = 2 * int(cpus_s) if cpus_s and cpus_s.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Files: 128 MiB split targets -- the same knob that sizes scan tasks
        # against 100 TB of parquet on a cluster.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())
