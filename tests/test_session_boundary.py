"""Pin Spark's session_window boundary convention (ADVICE r4).

The gap-islands oracles across the repo (advanced.sessionize,
prep.bounce_rate / session_depth_dist / session_cooccurrence_lift,
streaming sessionize) split a session only when the inter-event gap is
STRICTLY greater than the gap duration.  This test proves that is the
native operator's semantics: an event landing exactly ``gap`` after its
predecessor is merged into the same session, while one microsecond more
starts a new one.  If a Spark upgrade ever flips this to a half-open
interval, this test fails before any oracle silently diverges.
"""
import datetime as dt

from pyspark.sql import functions as F


def test_session_window_merges_exact_gap(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: second event exactly 30 min later -> ONE session
        (1, base),
        (1, base + dt.timedelta(minutes=30)),
        # user 2: second event 30 min + 1 ms later -> TWO sessions
        (2, base),
        (2, base + dt.timedelta(minutes=30, microseconds=1000)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    counts = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy("user_id")
        .collect()
    )
    assert [(r.user_id, r.n_sessions) for r in counts] == [(1, 1), (2, 2)]


def test_gap_islands_oracle_matches_boundary(spark):
    """The `> gap` islands predicate reproduces the same split."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base),
        (1, base + dt.timedelta(minutes=30)),
        (2, base),
        (2, base + dt.timedelta(minutes=30, microseconds=1000)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    df.createOrReplaceTempView("boundary_events")
    islands = spark.sql(
        """
        WITH ordered AS (
          SELECT user_id, ts,
                 CASE WHEN unix_millis(ts) - lag(unix_millis(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts)
                      > 30 * 60 * 1000
                      OR lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM boundary_events)
        SELECT user_id, sum(new_session) AS n_sessions
        FROM ordered GROUP BY user_id ORDER BY user_id
        """
    ).collect()
    assert [(r.user_id, r.n_sessions) for r in islands] == [(1, 1), (2, 2)]
