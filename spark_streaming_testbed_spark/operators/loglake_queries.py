"""Oracle-checked log-lake pipeline queries.

Each query synthesizes reference-format log lines deterministically FROM
the ``events`` table (so the DuckDB oracle can build the identical
corpus), then drives the real parsers/pipeline from ``sources/loglake.py``
— a full synthesize → serialize → parse → analyze roundtrip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import fan_out, load_table
from ..sources import loglake

#: value domain for the synthesized execution lines
N_VALUES = 5


def _exec_lines(spark: SparkSession, sf_dir: str,
                fan: bool = False) -> DataFrame:
    """Reference-format ``batch result:`` lines derived from events
    (format mirrors SimpleStreamingApp.scala:106-108).

    ``fan=True`` widens the narrow local events scan before the
    regex-parse hot loop (r12 A/B: wins for the plain roundtrip, loses
    for the dedup/pivot consumers whose parse feeds straight into an
    aggregate that shuffles anyway)."""
    ev = load_table(spark, sf_dir, "events")
    if fan:
        ev = fan_out(ev, "event_id")
    time_ms = F.unix_millis("ts")
    batch_ms = (F.floor(time_ms / 5000) * 5000).cast("bigint")
    return ev.select(
        F.concat_ws(
            "\t",
            F.concat(F.lit("batch result: "), time_ms.cast("string")),
            batch_ms.cast("string"),
            (F.floor("value").cast("int") % N_VALUES).cast("string"),
            (F.col("user_id") % 4).cast("string"),
            F.expr(r"regexp_extract(props, '\"k\": (\\d+)', 1)"),
        ).alias("value")
    )


_EXEC_LINES_SQL = """
SELECT concat_ws(chr(9),
         'batch result: ' || CAST(epoch_ms(ts) AS VARCHAR),
         CAST((epoch_ms(ts) // 5000) * 5000 AS VARCHAR),
         CAST(CAST(floor(value) AS INT) % {n} AS VARCHAR),
         CAST(user_id % 4 AS VARCHAR),
         regexp_extract(props, '"k": (\\d+)', 1)) AS line
FROM events
""".format(n=N_VALUES)

# TRY_CAST + the regexp_matches pre-filter mirror the Spark parser's
# P1 drop-unparseable contract: a malformed feed (NULL value/props
# fields make concat_ws emit 4-field lines in BOTH engines) must DROP
# those lines, exactly as parse_execution's try_cast+null-drop does —
# a plain CAST('' AS BIGINT) errored the whole oracle instead
# (r9 nulls sweep)
_EXEC_PARSE_SQL = r"""
SELECT TRY_CAST(regexp_extract(line, '[^\d]*(\d+)\t(\d+)\t(\d+)\t(\d+)\t(\d+).*', 1) AS BIGINT) AS time_ms,
       TRY_CAST(regexp_extract(line, '[^\d]*(\d+)\t(\d+)\t(\d+)\t(\d+)\t(\d+).*', 2) AS BIGINT) AS batch_time_ms,
       TRY_CAST(regexp_extract(line, '[^\d]*(\d+)\t(\d+)\t(\d+)\t(\d+)\t(\d+).*', 3) AS INT) AS value,
       TRY_CAST(regexp_extract(line, '[^\d]*(\d+)\t(\d+)\t(\d+)\t(\d+)\t(\d+).*', 4) AS INT) AS stream_id,
       TRY_CAST(regexp_extract(line, '[^\d]*(\d+)\t(\d+)\t(\d+)\t(\d+)\t(\d+).*', 5) AS INT) AS count
FROM lines
WHERE regexp_matches(line, '[^\d]*(\d+)\t(\d+)\t(\d+)\t(\d+)\t(\d+).*')
"""


def loglake_execution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serialize → parse roundtrip of the execution family (S7/F3 + P1)."""
    parsed = loglake.parse_execution(_exec_lines(spark, sf_dir, fan=True))
    return parsed.orderBy("time_ms", "value", "stream_id")


LOGLAKE_EXECUTION_ROUNDTRIP_ORACLE = f"""
WITH lines AS ({_EXEC_LINES_SQL}),
parsed AS ({_EXEC_PARSE_SQL})
SELECT * FROM parsed ORDER BY time_ms, value, stream_id
"""


def loglake_execution_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roundtrip + one-row-per-batch dedup (A4, RunLogData.scala:17-23)."""
    parsed = loglake.parse_execution(_exec_lines(spark, sf_dir))
    return loglake.execution_dedup(parsed)


LOGLAKE_EXECUTION_DEDUP_ORACLE = f"""
WITH lines AS ({_EXEC_LINES_SQL}),
parsed AS ({_EXEC_PARSE_SQL}),
ranked AS (
  SELECT time_ms, batch_time_ms,
         row_number() OVER (PARTITION BY batch_time_ms
                            ORDER BY time_ms, value, stream_id) AS rn
  FROM parsed)
SELECT time_ms, batch_time_ms FROM ranked WHERE rn = 1
ORDER BY batch_time_ms
"""


def loglake_stacked_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roundtrip → pivot by value (A5) → stacked running counts with
    missing propagation (P11, TestData.scala:155-168). Counts are summed
    per (batch, value) for cross-engine determinism (the reference's
    find-first depends on list order)."""
    parsed = loglake.parse_execution(_exec_lines(spark, sf_dir))
    vals = list(range(N_VALUES))
    pivoted = (
        parsed.groupBy("batch_time_ms")
        .pivot("value", vals)
        .agg(F.sum("count"))
    )
    stacked = loglake.stacked_counts(pivoted, [str(v) for v in vals])
    return stacked.orderBy("batch_time_ms")


def _stacked_oracle() -> str:
    cells = ",\n         ".join(
        f"CAST(sum(count) FILTER (value = {v}) AS BIGINT) AS c{v}"
        for v in range(N_VALUES)
    )
    accs = []
    for k in range(N_VALUES):
        running = " + ".join(f"coalesce(c{i}, 0)" for i in range(k + 1))
        accs.append(
            f"CASE WHEN c{k} IS NULL THEN NULL ELSE {running} END AS acc_{k}"
        )
    acc_sql = ",\n       ".join(accs)
    return f"""
WITH lines AS ({_EXEC_LINES_SQL}),
parsed AS ({_EXEC_PARSE_SQL}),
pv AS (
  SELECT batch_time_ms,
         {cells}
  FROM parsed GROUP BY batch_time_ms)
SELECT batch_time_ms,
       {acc_sql}
FROM pv ORDER BY batch_time_ms
"""


LOGLAKE_STACKED_PIVOT_ORACLE = _stacked_oracle()


def loglake_memory_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memory-line roundtrip incl. the MB→KB unit branch (P6/P7): events
    with even ids serialize as KB, odd as MB."""
    # fan_out (r12 A/B: 2.7 -> 1.9 s at sf0.1): the ,SSS timestamp
    # format + regex parse is a row-local hot loop that otherwise runs
    # at the narrow local scan's parallelism
    ev = fan_out(load_table(spark, sf_dir, "events"), "event_id")
    unit = F.when(F.col("event_id") % 2 == 0, "KB").otherwise("MB")
    lines = ev.select(
        F.concat(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss,SSS"), F.lit("+0000"),
            F.lit(" INFO BlockManagerInfo: Added input-0-"),
            F.col("event_id").cast("string"),
            F.lit(" in memory on host:1234 (size: 1.0 KB, free: "),
            F.round("value", 1).cast("string"), F.lit(" "), unit, F.lit(")"),
        ).alias("value")
    )
    return loglake.parse_memory(lines).orderBy("time_ms", "free_kb")


LOGLAKE_MEMORY_ROUNDTRIP_ORACLE = r"""
WITH lines AS (
  SELECT strftime(ts, '%Y-%m-%d %H:%M:%S,%g') || '+0000'
         || ' INFO BlockManagerInfo: Added input-0-' || CAST(event_id AS VARCHAR)
         || ' in memory on host:1234 (size: 1.0 KB, free: '
         || CAST(round(value, 1) AS VARCHAR) || ' '
         || CASE WHEN event_id % 2 = 0 THEN 'KB' ELSE 'MB' END || ')' AS line
  FROM events),
parsed AS (
  SELECT epoch_ms(strptime(regexp_extract(line, '^([^ ]+ [^ ]+)', 1),
                           '%Y-%m-%d %H:%M:%S,%g%z')) AS time_ms,
         CASE WHEN regexp_extract(line, 'free: ([^ ]+) (..)\)', 2) = 'MB'
              THEN CAST(regexp_extract(line, 'free: ([^ ]+) (..)\)', 1) AS DOUBLE) * 1024
              ELSE CAST(regexp_extract(line, 'free: ([^ ]+) (..)\)', 1) AS DOUBLE)
         END AS free_kb
  -- a NULL value makes the whole concat'd line NULL in both engines;
  -- the parser's P1 contract drops it (r9 nulls sweep)
  FROM lines WHERE line IS NOT NULL)
SELECT * FROM parsed ORDER BY time_ms, free_kb
"""


def loglake_per_second_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dropped-values per-second rollup (A3, TestData.scala:20-35): synth
    'to deliver N values to client K' lines, parse, 1s tumbling sum."""
    # fan_out (r12 A/B: 1.8 -> 1.5 s at sf0.1): same regex-parse hot
    # loop as the memory roundtrip
    ev = fan_out(load_table(spark, sf_dir, "events"), "event_id")
    lines = ev.select(
        F.concat(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS"), F.lit("+0000"),
            F.lit(" WARN DataGeneratorActor: unable to deliver "),
            F.floor("value").cast("int").cast("string"),
            F.lit(" values to client "),
            (F.col("user_id") % 3).cast("string"),
        ).alias("value")
    )
    parsed = loglake.parse_dropped(lines)
    return loglake.per_second_rollup(parsed, "count")


LOGLAKE_PER_SECOND_ROLLUP_ORACLE = r"""
WITH parsed AS (
  SELECT epoch_ms(ts) AS time_ms,
         CAST(floor(value) AS INT) AS count,
         CAST(user_id % 3 AS INT) AS client_id
  FROM events
  -- the Spark side's synthesized line is NULL for a NULL value (concat
  -- null-propagates) and the parser drops it; this oracle skips the
  -- line step, so it must drop the same rows here (r9 nulls sweep)
  WHERE value IS NOT NULL)
SELECT (time_ms // 1000) * 1000 AS second_ms, client_id,
       CAST(sum(count) AS BIGINT) AS count
FROM parsed GROUP BY 1, 2 ORDER BY second_ms, client_id
"""


LOGLAKE_QUERIES = {
    "loglake_execution_roundtrip": loglake_execution_roundtrip,
    "loglake_execution_dedup": loglake_execution_dedup,
    "loglake_stacked_pivot": loglake_stacked_pivot,
    "loglake_memory_roundtrip": loglake_memory_roundtrip,
    "loglake_per_second_rollup": loglake_per_second_rollup,
}

LOGLAKE_ORACLES = {
    "loglake_execution_roundtrip": LOGLAKE_EXECUTION_ROUNDTRIP_ORACLE,
    "loglake_execution_dedup": LOGLAKE_EXECUTION_DEDUP_ORACLE,
    "loglake_stacked_pivot": LOGLAKE_STACKED_PIVOT_ORACLE,
    "loglake_memory_roundtrip": LOGLAKE_MEMORY_ROUNDTRIP_ORACLE,
    "loglake_per_second_rollup": LOGLAKE_PER_SECOND_ROLLUP_ORACLE,
}
