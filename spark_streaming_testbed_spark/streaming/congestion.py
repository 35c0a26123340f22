"""Oracle-checked congestion-strategy accounting (SURVEY.md §2.6 T3).

The reference runs its receiver with four congestion strategies
(``-s ignore|drop|sampling|pushback``, test-runs-001/README.md:20-61)
and logs per-block requested/dropped observables that the log processor
parses back (log-processor ReceiverLogData.scala:31-36). Here the same
strategies are *enacted on a live Structured Streaming query* by the
``rate_profile`` DataSource's admission path
(sources/profile_datasource.py), which emits the accounting records;
these contract queries run such a stream to completion and return the
accounting table.

The DuckDB oracles re-derive the expected accounting from first
principles: the generator's 10 ms bucket arithmetic gives offered rows
per trigger, and the admission recurrence (``admitted = min(backlog +
offered, budget)``) is replayed with a recursive CTE for pushback and
closed-form arithmetic for drop/sampling. The conservation invariant
``offered = admitted + dropped + Δqueued`` is therefore value-checked
end-to-end, not just asserted in tests.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

#: fixed 250 rows/sec for 6 plan-seconds → 1500 rows, 250 per trigger
_PLAN = (
    '{"sequence": [{"type": "fixed", "value": 3, "rate": 250, '
    '"duration": 6}]}'
)
_RATE_LIMIT = 150  # rows/sec budget; quantum is 1 s → 150 rows/trigger

ACCOUNTING_SCHEMA = (
    "trigger int, offered int, requested int, admitted int, "
    "dropped int, queued int"
)


def _run_accounting(spark: SparkSession, strategy: str) -> DataFrame:
    from ..sources.profile_datasource import register

    register(spark)
    with tempfile.TemporaryDirectory(prefix=f"congestion_{strategy}_") as tmp:
        acct = os.path.join(tmp, "accounting.jsonl")
        name = f"cg_{strategy}_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.format("rate_profile")
            .option("plan", _PLAN)
            .option("seconds_per_batch", 1)
            .option("strategy", strategy)
            .option("rate_limit", _RATE_LIMIT)
            .option("accounting_file", acct)
            .load()
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        with open(acct) as fh:
            recs = [json.loads(line) for line in fh]
    rows = [
        (
            r["trigger"], r["offered"], r["requested"], r["admitted"],
            r["dropped"], r["queued"],
        )
        for r in recs
    ]
    return spark.createDataFrame(rows, ACCOUNTING_SCHEMA).orderBy("trigger")


def congestion_drop_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live ``drop`` strategy: surplus over the 150-row budget is
    discarded each trigger; nothing queues."""
    return _run_accounting(spark, "drop")


def congestion_sampling_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Live ``sampling`` strategy: over budget → admit every k-th row
    (k = ceil(offered/budget)), deterministic systematic sampling."""
    return _run_accounting(spark, "sampling")


def congestion_pushback_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Live ``pushback`` strategy: surplus stays queued at the source
    (the offset stalls) and drains at the budget rate after the
    generator finishes — nothing is ever dropped."""
    return _run_accounting(spark, "pushback")


#: offered rows per trigger from the generator's 10 ms bucket arithmetic
_GEN_CTE = """
gen AS (
  SELECT s AS t,
         CAST(SUM(CAST(floor((i+1) * 2.5) AS INT)
                  - CAST(floor(i * 2.5) AS INT)) AS INT) AS offered
  FROM (SELECT unnest(range(6)) AS s), (SELECT unnest(range(100)) AS i)
  GROUP BY s)
"""

CONGESTION_DROP_ORACLE = f"""
WITH {_GEN_CTE}
SELECT t AS trigger, offered, {_RATE_LIMIT} AS requested,
       least(offered, {_RATE_LIMIT}) AS admitted,
       offered - least(offered, {_RATE_LIMIT}) AS dropped,
       0 AS queued
FROM gen ORDER BY trigger
"""

CONGESTION_SAMPLING_ORACLE = f"""
WITH {_GEN_CTE}
SELECT t AS trigger, offered, {_RATE_LIMIT} AS requested,
       CASE WHEN offered <= {_RATE_LIMIT} THEN offered
            ELSE CAST(floor((offered - 1)
                 / CAST(ceil(offered / {_RATE_LIMIT}.0) AS INT)) AS INT) + 1
       END AS admitted,
       offered - (CASE WHEN offered <= {_RATE_LIMIT} THEN offered
            ELSE CAST(floor((offered - 1)
                 / CAST(ceil(offered / {_RATE_LIMIT}.0) AS INT)) AS INT) + 1
       END) AS dropped,
       0 AS queued
FROM gen ORDER BY trigger
"""

#: the admission recurrence replayed exactly: available = backlog + new,
#: admitted = min(available, budget), queue the rest; extra drain
#: triggers (offered = 0) run until the queue is empty.
CONGESTION_PUSHBACK_ORACLE = f"""
WITH RECURSIVE {_GEN_CTE},
sim AS (
  SELECT 0 AS trigger,
         (SELECT offered FROM gen WHERE t = 0) AS offered,
         {_RATE_LIMIT} AS requested,
         least((SELECT offered FROM gen WHERE t = 0),
               {_RATE_LIMIT}) AS admitted,
         0 AS dropped,
         (SELECT offered FROM gen WHERE t = 0)
           - least((SELECT offered FROM gen WHERE t = 0),
                   {_RATE_LIMIT}) AS queued
  UNION ALL
  SELECT s.trigger + 1,
         coalesce((SELECT g.offered FROM gen g
                   WHERE g.t = s.trigger + 1), 0),
         {_RATE_LIMIT},
         least(s.queued + coalesce((SELECT g.offered FROM gen g
                                    WHERE g.t = s.trigger + 1), 0),
               {_RATE_LIMIT}),
         0,
         s.queued + coalesce((SELECT g.offered FROM gen g
                              WHERE g.t = s.trigger + 1), 0)
           - least(s.queued + coalesce((SELECT g.offered FROM gen g
                                        WHERE g.t = s.trigger + 1), 0),
                   {_RATE_LIMIT})
  FROM sim s
  WHERE s.queued + coalesce((SELECT g.offered FROM gen g
                             WHERE g.t = s.trigger + 1), 0) > 0
)
SELECT trigger, offered, requested, admitted, dropped, queued
FROM sim ORDER BY trigger
"""

CONGESTION_QUERIES = {
    "congestion_drop_accounting": congestion_drop_accounting,
    "congestion_sampling_accounting": congestion_sampling_accounting,
    "congestion_pushback_accounting": congestion_pushback_accounting,
}

CONGESTION_ORACLES = {
    "congestion_drop_accounting": CONGESTION_DROP_ORACLE,
    "congestion_sampling_accounting": CONGESTION_SAMPLING_ORACLE,
    "congestion_pushback_accounting": CONGESTION_PUSHBACK_ORACLE,
}
