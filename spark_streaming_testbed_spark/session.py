"""SparkSession factory and testdata table loaders.

Defaults tuned for the driver's local[32] single-JVM harness, but every
setting is a scale-out default too: AQE on (runtime re-plan / skew join /
partition coalescing), UTC session timezone (oracle comparison), Arrow
enabled for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver materializes per scale factor (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


_SCRATCH_ROOTS: set[str] = set()


def session_scratch_dir(spark: SparkSession, prefix: str) -> str:
    """Scratch path that outlives the caller's scope (removed at
    interpreter exit, keyed by the Spark application id).

    For operators whose lazily-evaluated result must be re-readable
    after a streaming replay's ``TemporaryDirectory`` has vanished —
    the alternative is collecting the whole result to the driver, which
    is O(state) and a scale-killer (VERDICT r4 on streaming_upsert)."""
    import atexit
    import shutil
    import tempfile
    import uuid

    root = os.path.join(
        tempfile.gettempdir(),
        f"sst_scratch_{spark.sparkContext.applicationId}",
    )
    os.makedirs(root, exist_ok=True)
    if root not in _SCRATCH_ROOTS:
        _SCRATCH_ROOTS.add(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return os.path.join(root, f"{prefix}{uuid.uuid4().hex[:8]}")


def get_session(app_name: str = "spark_streaming_testbed_spark") -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS); read as long and
        # convert in load_table (Spark has no native nanos timestamp).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()


#: event-time columns whose parquet physical type varies across testdata
#: generations (TIMESTAMP(NANOS) → bigint under ``nanosAsLong``; micro
#: timestamps without the UTC flag → TIMESTAMP_NTZ). Both are normalized
#: to plain TimestampType at load so every downstream ``unix_millis``/
#: window expression sees one type; with the session timezone pinned to
#: UTC the NTZ→LTZ cast is value-identical.
_NANO_TS_COLS = {"events": ("ts",)}


def _ship_engine_to_workers(spark: SparkSession) -> None:
    """Make this package importable in Python workers regardless of the
    driver process's cwd/PYTHONPATH (pandas-UDF closures pickle module
    references, so workers must import ``spark_streaming_testbed_spark``).
    Ships a zip of the package via ``addPyFile`` once per session."""
    if getattr(spark, "_sst_engine_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    sources = []
    for root, _dirs, files in os.walk(pkg_dir):
        for f in files:
            if f.endswith(".py"):
                sources.append(os.path.join(root, f))
    # cache key = newest source mtime, so edits anywhere in the package
    # invalidate the shipped zip (a stale zip breaks worker unpickling)
    stamp = max(int(os.path.getmtime(p)) for p in sources)
    zpath = os.path.join(tempfile.gettempdir(), f"sst_engine_{stamp}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for full in sources:
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                z.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    spark._sst_engine_shipped = True


def pickle_datasources_by_value() -> None:
    """Make the Python DataSource modules cloudpickle BY VALUE.

    Batch UDF workers prepend ``addPyFile`` includes to ``sys.path``
    before unpickling, but the streaming Python DataSource planner
    (``python_streaming_source_runner``) on PySpark 4.1 does not — so a
    pickled-by-reference source instance raises ``ModuleNotFoundError``
    whenever the driver process's cwd/PYTHONPATH doesn't already expose
    this package (e.g. the driver harness running from its own cwd).
    Registering the modules the pickled instance closes over — the two
    DataSource modules and the pure-Python plan arithmetic they use —
    embeds their code in the pickle itself, so the runner needs nothing
    but pyspark + stdlib. Idempotent; cheap (the modules are small)."""
    from pyspark import cloudpickle

    from .plans import phases
    from .sources import profile_datasource, rs_tcp

    for mod in (phases, profile_datasource, rs_tcp):
        cloudpickle.register_pickle_by_value(mod)


def ensure_session_confs(spark: SparkSession) -> None:
    """Set runtime confs the engine depends on, even on a caller-owned session.

    The driver (and any embedding app) builds its own SparkSession; both
    confs below are runtime-settable, so we pin them at every table load:
    - ``nanosAsLong``: events.parquet stores TIMESTAMP(NANOS), unreadable
      by Spark's parquet reader otherwise;
    - UTC session timezone: keeps ``date_format``/windowing aligned with
      the (UTC-naive) DuckDB oracle.
    Also ships the engine package to Python workers (see above).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _ship_engine_to_workers(spark)


def fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Spread a narrow scan across the cluster before a CPU-heavy
    row-local stage (explode + md5/regex hot loops).

    The r12 measurement round found every testdata parquet file is ONE
    row group, so every scan is a single task and each "row-local, no
    shuffle" pipeline runs its per-row compute on one core until the
    first exchange (guide §2.5 input skew: "one huge unsplittable
    file... repartition immediately after the read"). A bare
    ``repartition(key)`` does NOT fix it: AQE plans it at
    ``spark.sql.shuffle.partitions`` but then coalesces the few-MB
    shuffle back to ONE partition (byte-based coalescing cannot see
    downstream per-row CPU cost) — measured on ``winnow_fingerprints``,
    whose fan-out comment round 9 believed was working.

    Scale-adaptive, not a local-mode constant: the fan-out only fires
    when the plan's current partition count is below
    ``defaultParallelism`` (cores locally, cluster cores at scale). At
    100 TB a table scan already yields thousands of splits, so this is
    a no-op there and the input rows are never shuffled; locally it
    costs one tiny exchange of pre-explode rows (1/fan-out-factor of
    the exploded volume). The explicit partition count pins the plan
    against AQE re-coalescing; hash keys (when given) keep placement
    deterministic and co-partition the stage with a downstream
    groupBy/window on the same key.

    HAZARD (found r12, cost cdc_chunk_dedup 109 of 500 rows): do NOT
    feed one fanned frame into several branches of a union that a
    keyed op (distinct / groupBy / window) then consumes. Spark 4.1.2
    treats a union of identically-hash-partitioned children as
    satisfying the child's required distribution and elides the
    shuffle; that merge is handled correctly standalone, but once
    exchange REUSE rewrites the branches (the same subtree appearing
    elsewhere in the query, e.g. both sides of a self-join) the
    merged-partition bookkeeping breaks and the keyed op runs
    per-branch — silently wrong results, correct again under
    spark.sql.exchange.reuse=false. Fan out inside a single branch
    instead (see cdc_chunk_dedup)."""
    if df.isStreaming:
        # micro-batch partitioning is the source's business (and
        # ``.rdd`` is undefined on a streaming frame) — no-op
        return df
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    cols = [F.col(k) for k in keys]
    return df.repartition(par, *cols) if cols else df.repartition(par)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table (schema from footer, no inference)."""
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLS.get(name, ()):
        dt = dict(df.dtypes).get(col)
        if dt == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (mirrors the DuckDB oracle)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
