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


# ---------------------------------------------------------------------------
# S10: gnuplot multiplot script generator (presentation sink)
# ---------------------------------------------------------------------------

def generate_gnuplot_script(
    tables: dict[str, DataFrame], title: str
) -> str:
    """Rebuild of the reference's gnuplot multiplot generator
    (log-processor Main.scala:36-158): one memory/PID panel, one panel
    per stream (execution stacks + optional drop-ratio + optional
    feedback bound), one panel per client (drops + optional requests +
    tick fillsteps), driven by data extents.

    This is the presentation sink (SURVEY §2.1 S10): the only
    driver-side data are EXTENT SCALARS (global min/max time, max tick
    count) and the tiny id/value vocabularies (streams, clients,
    distinct item values) — each a one-row or few-row aggregate; the
    plotted series themselves stay in the dumped files (``dump``) and
    never pass through the driver. Layout arithmetic (333·streams+666
    terminal height, streams+2 multiplot rows, ±5000 ms xrange pad,
    1.2× tick headroom, $N column indexing) mirrors Main.scala
    line-for-line as the format contract."""
    ext = global_extent(tables).first()
    min_ms = 0 if ext.min_ms is None else int(ext.min_ms)
    max_ms = 0 if ext.max_ms is None else int(ext.max_ms)
    streams = [
        int(r.stream_id)
        for r in tables["execution"]
        .select("stream_id").distinct().orderBy("stream_id").collect()
    ]
    ratio_streams = {
        int(r.stream_id)
        for r in tables["ratio"].select("stream_id").distinct().collect()
    }
    feedback_streams = {
        int(r.stream_id)
        for r in tables["feedback"].select("stream_id").distinct().collect()
    }
    exec_values = {
        s: [
            int(r.value)
            for r in tables["execution"]
            .where(F.col("stream_id") == s)
            .select("value").distinct().orderBy("value").collect()
        ]
        for s in streams
    }
    clients = [
        int(r.client_id)
        for r in tables["dropped"]
        .select("client_id").distinct().orderBy("client_id").collect()
    ]
    requested_clients = {
        int(r.client_id)
        for r in tables["requested"].select("client_id").distinct().collect()
    }
    tick_values = [
        int(r.value)
        for r in tables["tick"]
        .select("value").distinct().orderBy("value").collect()
    ]
    max_tick = tables["tick"].agg(F.max("count").alias("m")).first().m or 0

    out = ["""
set y2range [0:]
set y2tics
set yrange [0:]
set lmargin 12
set rmargin 10
set datafile missing "?"
set style fill transparent solid 0.25

set style arrow 1 nohead ls 1
set style arrow 2 nohead ls 1 lc 3
set ytics nomirror
"""]
    out.append(
        '\nset terminal pngcairo dashed enhanced font "arial,10" '
        f"fontscale 1.0 size 1500,{len(streams) * 333 + 666}\n"
    )
    out.append('\nset output "graph.png"\n')
    out.append(
        f'\nset multiplot layout {len(streams) + 2}, 1 title "{title}"\n'
    )
    out.append(f"\nset xrange [ {min_ms - 5000} : {max_ms + 5000} ]")
    out.append("""
set xtics format " "
set bmargin 1
set ylabel "execution time (in milliseconds)"
set y2label "memory (in MB)"

plot "memory.log" using 1:(5000) with line lt 0 lc 3 title "batch interval", \\
  "memory.log" using 1:($2/1024) axes x1y2 with lines title "Spark - free memory to store the blocks" lt 1 lc 2, \\
  "pid.log" using ($1-$3-$4):(0):3:3 with vector title "processing time" arrowstyle 2, \\
  "pid.log" using ($1-$4):3:4:4 with vector title "scheduling delay" arrowstyle 1

""")
    out.append("""
set tmargin 0
set ylabel "# of items"
set y2label "drop ratio"
set y2range [ 0 : 1.1 ]

""")
    for s in streams:
        out.append("\nplot ")
        if s in ratio_streams:
            out.append(
                f'"ratio_{s}.log" using 1:2 axes x1y2 with lines title '
                '"Congestion strategie - drop ratio, for each block" '
                'lt 1 lc rgb "#DDDDDD", \\\n'
                f'  "ratio_{s}.log" u 1:2 axes x1y2 smooth bezier title '
                '"smoothed drop ratio" lt 1 lc "black", \\\n'
            )
        exec_lines = [
            f'"execution_{s}.log" using 2:(${i + 3}) with filledcurve x1 '
            f'title "Spark - # of items {v} processed per batch" '
            f"lt 1 lc {i + 3}"
            for i, v in enumerate(exec_values[s])
        ]
        out.append(", \\\n".join(exec_lines))
        if s in feedback_streams:
            out.append(
                f', \\\n  "feedback_{s}.log" using 1:($2 * 5) with lines '
                'title "Spark - feedback bound, max # of item per batch" '
                "lt 1 lc 2"
            )
        out.append("\n\n")
    out.append('\nset xlabel "timeline (in milliseconds)"\n\n')
    out.append("""
set xtics format "%.0f"
set bmargin 3
set ylabel "# of items"
unset y2label
unset y2tics
unset y2range

""")
    out.append(f"\nset yrange [ 0 : {int(max_tick * 1.2)} ]\n")
    out.append("\nset boxwidth 1000\n\n")
    for c in clients:
        out.append(
            f'plot "droppedValuesPerSecond_{c}.log" using 1:2 with boxes '
            'title "testbed, # of item dropped per second" lt 1 lc 1, \\\n'
        )
        if c in requested_clients:
            out.append(
                f'     "requestedValuesPerSecond_{c}.log" using 1:2 with '
                'lines title "testbed, # of item requested per second" '
                "lt 1 lc 2, \\\n"
            )
        tick_lines = [
            f'"tick.log" using 1:(${i + 2}) with fillsteps title '
            f'"testbed, # of item {v} to send at each second" lt 1 lc {i + 3}'
            for i, v in enumerate(tick_values)
        ]
        out.append(", \\\n".join(tick_lines))
    out.append("\nunset multiplot\n")
    return "".join(out)
