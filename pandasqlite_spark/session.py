"""SparkSession factory with SQLite-parity and scale-oriented defaults.

Parity configs (SURVEY.md §4.2-2):

- ``spark.sql.ansi.enabled=false`` — SQLite casts are lossy-but-silent
  (bad casts yield NULL, not errors); the reference's generated SQL relies
  on that forgiveness (reference ``pandasqlite/pandasqlite.py:223``).
- ``spark.sql.caseSensitive=false`` — SQLite identifiers are
  case-insensitive.
- ``spark.sql.session.timeZone=UTC`` — deterministic timestamp semantics,
  matching DuckDB's UTC-naive timestamps for the correctness oracle.

Scale configs: AQE on (runtime re-plan, skew-join handling, partition
coalescing), Arrow on (fast toPandas / pandas_udf), shuffle partitions
sized to the local core count (overridable; on a real cluster this would
be ~2-3× total cores or left to AQE's coalescing).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession

# A known location of a PURE-PYTHON google.protobuf (Apache-2.0, vendored
# by the Google Cloud SDK) in containers that lack a pip-installed one.
_PROTOBUF_FALLBACK_DIR = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def enable_spark4_stateful_runner() -> bool:
    """Best-effort enablement of Spark 4's ``transformWithStateInPandas``
    driver worker, which hard-requires ``google.protobuf`` in the Python
    that the JVM spawns.  If protobuf isn't importable but a vendored
    pure-Python copy exists on disk, prepend it to ``PYTHONPATH`` (the
    spawned runner inherits the env) and append it to ``sys.path`` (so
    this process never shadows site-packages).  Returns True when
    ``google.protobuf.descriptor`` is importable after the attempt.

    MUST run before the first SparkSession is created in the process:
    the JVM captures its environment at launch and passes it to every
    runner it spawns — called at this module's import for that reason.
    ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` is protobuf's own
    documented escape hatch for the minor-version gap between Spark's
    generated StateMessage bindings and the vendored runtime.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        if not os.path.isdir(os.path.join(_PROTOBUF_FALLBACK_DIR, "google", "protobuf")):
            return False
        existing = os.environ.get("PYTHONPATH", "")
        if _PROTOBUF_FALLBACK_DIR not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                _PROTOBUF_FALLBACK_DIR + ((os.pathsep + existing) if existing else "")
            )
        if _PROTOBUF_FALLBACK_DIR not in sys.path:
            sys.path.append(_PROTOBUF_FALLBACK_DIR)
        try:
            from google.protobuf import descriptor  # noqa: F401
        except ImportError:
            return False
        # the version-check escape hatch is for the VENDORED pure-Python
        # runtime's minor-version gap only — when a healthy site-packages
        # protobuf imported on the first try, leave the check on so a
        # genuine gencode/runtime incompatibility on a properly
        # provisioned cluster still fails loudly
        os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
    return True


# import-time: the shim is only effective if it precedes JVM launch
SPARK4_STATEFUL_AVAILABLE = enable_spark4_stateful_runner()


def get_spark(
    app_name: str = "pandasqlite_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` (driver contract) sets local parallelism;
    defaults to all cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("PANDASQLITE_SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        ncpu = os.cpu_count() or 8 if cpus == "*" else int(cpus)
        shuffle_partitions = max(8, ncpu)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # --- parity with the reference's SQLite semantics ---
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.caseSensitive", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # --- scale / performance posture ---
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("PANDASQLITE_SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
