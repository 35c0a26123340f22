"""Log-lake: regex-extract parsers + the batch analytics pipeline.

Rebuild of the reference's log-processor (SURVEY.md §2.1 S6-S9, §2.2-2.5)
as declarative DataFrame transforms: ``spark.read.text`` → cheap
``contains`` pre-filter → ``regexp_extract`` columns → ``try_cast`` +
null-filter (malformed lines drop silently, matching the reference's
partial-function regex match).

Line families and their reference parsers:
- memory    "… Added input-… (size: 431.7 KB, free: 264.9 MB)"
            (log-processor RunLogData.scala:67,71-84)
- execution "batch result: <ms>\\t<batch_ms>\\t<value>\\t<stream>\\t<count>…"
            (RunLogData.scala:68,86-91; emitted by SimpleStreamingApp.scala:106-108)
- pid       "time = …, # records = …, processing time = …, scheduling delay = …"
            (RunLogData.scala:69,93-98)
- tick      "… DataGeneratorActor …, <count> times <value>"
            (ApplicationLogData.scala:52,56-61)
- dropped   "… to deliver <n> values to client <k>" (ApplicationLogData.scala:53,63-68)
- requested "… received request for <n> values from client <k>" (ApplicationLogData.scala:54,70-75)
- feedback  "… a new rate limit for <stream> : <limit>." (ReceiverLogData.scala:21,24-29)
- ratio     "… stream <s> … with ratio of <r>." (ReceiverLogData.scala:22,31-36)

All times surface as **epoch millis bigint** (the reference's native time
type); the two timestamp text formats (",SSS+0000" receiver-style and
".SSS+0000" application-style) are parsed with explicit patterns.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECEIVER_TS_FMT = "yyyy-MM-dd HH:mm:ss,SSSZ"  # 2015-09-04 13:08:06,609+0000
APP_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSZ"       # 2015-07-02 10:58:12.402+0000


def _ts_ms(date_expr: F.Column, fmt: str) -> F.Column:
    return F.unix_millis(F.try_to_timestamp(date_expr, F.lit(fmt)))


def _date_prefix() -> F.Column:
    return F.regexp_extract("value", r"^([^ ]+ [^ ]+)", 1)


# ---------------------------------------------------------------------------
# Parsers: lines DataFrame (column `value`) → typed DataFrame
# ---------------------------------------------------------------------------

SPARK_LOG_TS_FMT = "yy/MM/dd HH:mm:ss"  # 15/06/16 12:30:03 (Spark 1.x log4j)


def parse_memory(lines: DataFrame, ts_fmt: str = RECEIVER_TS_FMT) -> DataFrame:
    """Free-memory samples; MB normalized to KB (RunLogData.scala:74-84).

    Accepts both the receiver-style and Spark-1.x log4j date prefixes
    (the reference's lenient SimpleDateFormat parsed the latter to
    nonsense years — fixed here, divergence documented)."""
    free = F.regexp_extract("value", r"free: ([^ ]+) (..)\)", 1)
    unit = F.regexp_extract("value", r"free: ([^ ]+) (..)\)", 2)
    return (
        lines.where(F.col("value").contains("Added input"))
        .select(
            F.coalesce(
                _ts_ms(_date_prefix(), ts_fmt),
                _ts_ms(_date_prefix(), SPARK_LOG_TS_FMT),
            ).alias("time_ms"),
            F.when(unit == "MB", free.try_cast("double") * 1024)
            .otherwise(free.try_cast("double"))
            .alias("free_kb"),
        )
        .where(F.col("time_ms").isNotNull() & F.col("free_kb").isNotNull())
    )


_EXEC_RE = r"[^\d]*(\d+)\t(\d+)\t(\d+)\t(\d+)\t(\d+).*"


def parse_execution(lines: DataFrame) -> DataFrame:
    """Per-batch per-value stats lines (RunLogData.scala:86-91).

    Hot path at scale: one ``rlike`` validation + tab split instead of
    evaluating the 5-group regex five times per row (~2× on parse-heavy
    scans). The anchored rlike is the malformed-line gate (the Scala
    regex pattern-match equivalent); rows passing it are all-digit
    fields, so the casts null only on >64-bit overflow — kept as nulls,
    matching the DuckDB oracle's CAST (a per-column isNotNull filter
    here would also push below the projection and re-evaluate the
    split+casts once per column, doubling parse cost)."""
    parts = F.split(F.col("value"), "\t")
    field0 = F.regexp_extract(F.element_at(parts, 1), r"(\d+)$", 1)
    return (
        lines.where(F.col("value").contains("batch result:"))
        # full anchor mirrors Scala's regex pattern-match (which anchors)
        .where(F.col("value").rlike("^" + _EXEC_RE + "$"))
        .select(
            field0.try_cast("bigint").alias("time_ms"),
            F.element_at(parts, 2).try_cast("bigint").alias("batch_time_ms"),
            F.element_at(parts, 3).try_cast("int").alias("value"),
            F.element_at(parts, 4).try_cast("int").alias("stream_id"),
            F.element_at(parts, 5).try_cast("int").alias("count"),
        )
    )


_PID_RE = (
    r"time = (\d+), # records = (\d+), processing time = (\d+), "
    r"scheduling delay = (\d+)"
)


def parse_pid(lines: DataFrame) -> DataFrame:
    """Scheduler PID lines; zero-record rows dropped (TestData.scala:194)."""
    g = functools.partial(F.regexp_extract, "value", _PID_RE)
    return (
        lines.where(F.col("value").contains("# records"))
        .select(
            g(1).try_cast("bigint").alias("time_ms"),
            g(2).try_cast("int").alias("records"),
            g(3).try_cast("int").alias("processing_ms"),
            g(4).try_cast("int").alias("delay_ms"),
        )
        .where(F.col("time_ms").isNotNull() & (F.col("records") != 0))
    )


def parse_tick(lines: DataFrame) -> DataFrame:
    """Generator tick histogram lines (ApplicationLogData.scala:56-61)."""
    pat = r", (\d+) times (\d+)"
    return (
        lines.where(F.col("value").contains("DataGeneratorActor"))
        .select(
            _ts_ms(_date_prefix(), APP_TS_FMT).alias("time_ms"),
            F.regexp_extract("value", pat, 2).try_cast("int").alias("value"),
            F.regexp_extract("value", pat, 1).try_cast("int").alias("count"),
        )
        .where(F.col("time_ms").isNotNull() & F.col("value").isNotNull())
    )


def parse_dropped(lines: DataFrame) -> DataFrame:
    pat = r"to deliver (\d+) values to client (\d+)"
    return (
        lines.where(F.col("value").contains("to deliver"))
        .select(
            _ts_ms(_date_prefix(), APP_TS_FMT).alias("time_ms"),
            F.regexp_extract("value", pat, 1).try_cast("int").alias("count"),
            F.regexp_extract("value", pat, 2).try_cast("int").alias("client_id"),
        )
        .where(F.col("time_ms").isNotNull())
    )


def parse_requested(lines: DataFrame) -> DataFrame:
    pat = r"received request for (\d+) values from client (\d+)"
    return (
        lines.where(F.col("value").contains("received request for"))
        .select(
            _ts_ms(_date_prefix(), APP_TS_FMT).alias("time_ms"),
            F.regexp_extract("value", pat, 1).try_cast("int").alias("count"),
            F.regexp_extract("value", pat, 2).try_cast("int").alias("client_id"),
        )
        .where(F.col("time_ms").isNotNull())
    )


def parse_feedback(lines: DataFrame) -> DataFrame:
    """Rate-limit pushes; zero limits dropped (TestData.scala:227)."""
    pat = r"a new rate limit for (\d+) : (\d+)\."
    return (
        lines.where(F.col("value").contains("rate limit for"))
        .select(
            _ts_ms(_date_prefix(), RECEIVER_TS_FMT).alias("time_ms"),
            F.regexp_extract("value", pat, 1).try_cast("int").alias("stream_id"),
            F.regexp_extract("value", pat, 2).try_cast("int").alias("limit"),
        )
        .where(F.col("time_ms").isNotNull() & (F.col("limit") != 0))
    )


def parse_ratio(lines: DataFrame) -> DataFrame:
    pat = r"stream (\d+).*with ratio of ([\d.]+)\."
    df = (
        lines.where(F.col("value").contains("with ratio of"))
        .select(
            _ts_ms(_date_prefix(), RECEIVER_TS_FMT).alias("time_ms"),
            F.regexp_extract("value", pat, 1).try_cast("int").alias("stream_id"),
            F.regexp_extract("value", pat, 2).try_cast("double").alias("ratio"),
        )
    )
    return df.where(F.col("time_ms").isNotNull() & F.col("ratio").isNotNull())


# ---------------------------------------------------------------------------
# Lake loading (S6/S8: file families + receiver glob)
# ---------------------------------------------------------------------------

def load_loglake(spark: SparkSession, base_dir: str) -> dict[str, DataFrame]:
    """Read the three file families of a test-run folder into the 8 typed
    tables (TestData.scala:178-236). Receiver logs match ``receiver*.log``
    — the glob replaces the reference's FilenameFilter regex."""
    run = spark.read.text(f"{base_dir}/run.log")
    app = spark.read.text(f"{base_dir}/application.log")
    recv = spark.read.text(f"{base_dir}/receiver*.log")
    return {
        "memory": parse_memory(run, ts_fmt=RECEIVER_TS_FMT),
        "execution": parse_execution(run),
        "pid": parse_pid(run),
        "tick": parse_tick(app),
        "dropped": parse_dropped(app),
        "requested": parse_requested(app),
        "feedback": parse_feedback(recv),
        "ratio": parse_ratio(recv),
    }


# ---------------------------------------------------------------------------
# Derived pipeline (the reference's analytics, as joins/windows/pivots)
# ---------------------------------------------------------------------------

def time_shift_tables(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Normalize every time column to the first execution batch time
    (TestData.scala:81-92) via a broadcast 1-row anchor — no collect."""
    anchor = tables["execution"].agg(F.min("batch_time_ms").alias("t0"))
    out = {}
    for name, df in tables.items():
        shifted = df.crossJoin(F.broadcast(anchor))
        for col in df.columns:
            if col.endswith("time_ms"):
                shifted = shifted.withColumn(col, F.col(col) - F.col("t0"))
        out[name] = shifted.drop("t0")
    return out


def per_second_rollup(df: DataFrame, count_col: str = "count") -> DataFrame:
    """1-second tumbling sum keyed by client (TestData.scala:20-35)."""
    return (
        df.groupBy(
            (F.floor(F.col("time_ms") / 1000) * 1000).alias("second_ms"),
            "client_id",
        )
        .agg(F.sum(count_col).alias(count_col))
        .orderBy("second_ms", "client_id")
    )


def execution_dedup(execution: DataFrame) -> DataFrame:
    """One row per batch time, earliest line wins (RunLogData.scala:17-23)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("batch_time_ms").orderBy("time_ms", "value", "stream_id")
    return (
        execution.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("time_ms", "batch_time_ms")
        .orderBy("batch_time_ms")
    )


def execution_pivot(execution: DataFrame) -> DataFrame:
    """Long→wide: one count column per distinct value, missing = null
    (RunLogData.scala:40-54). Dynamic pivot (batch-only)."""
    return (
        execution.groupBy("batch_time_ms")
        .pivot("value")
        .agg(F.first("count"))
        .orderBy("batch_time_ms")
    )


def stacked_counts(pivoted: DataFrame, value_cols: list[str]) -> DataFrame:
    """Left-to-right running totals across value columns; a missing cell
    stays null (reference renders '?') and does NOT advance the
    accumulator (TestData.scala:155-168 accCountsWithMissing)."""
    out = pivoted
    for k, col in enumerate(value_cols):
        acc = functools.reduce(
            operator.add,
            [F.coalesce(F.col(c), F.lit(0)) for c in value_cols[: k + 1]],
        )
        out = out.withColumn(
            f"acc_{col}", F.when(F.col(col).isNull(), None).otherwise(acc)
        )
    return out.select(
        "batch_time_ms", *[f"acc_{c}" for c in value_cols]
    )


def global_extent(tables: dict[str, DataFrame]) -> DataFrame:
    """min/max time over the union of all tables (TestData.scala:119-140)."""
    parts = [
        df.select(F.col("time_ms").alias("t"))
        for name, df in tables.items()
        if "time_ms" in df.columns
    ]
    allt = functools.reduce(DataFrame.unionByName, parts)
    return allt.agg(F.min("t").alias("min_ms"), F.max("t").alias("max_ms"))


def dump(df: DataFrame, path: str) -> None:
    """Space-separated dump with '?' for missing (TestData.scala:97-114).
    The reference's blank-line gap markers are a gnuplot presentation
    quirk — documented, not replicated."""
    df.write.mode("overwrite").option("sep", " ").option(
        "nullValue", "?"
    ).csv(path)
