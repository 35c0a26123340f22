"""Measure the day-keyed funnel escape hatch's crossover point.

The (user, day)-keyed funnel twin costs ~3x on pristine input (it
multiplies state-group count by the active-day count, and
``applyInPandasWithState`` pays a per-group pandas overhead) but splits
a hot key's serial scan across days — so WHEN should a deployment
switch? This tool pins the answer with data instead of a hunch
(VERDICT r11 item 3).

Method: hold the cold population constant (COLD_USERS users with
COLD_EVENTS_PER_USER events each — so the day-keyed variant's
state-group overhead is identical across tiers) and raise the hot
user's event count H through a ladder. Both variants run warm,
back-to-back, on each tier; the crossover is the smallest H where the
day-keyed wall beats the user-keyed wall. Below it the per-group
overhead dominates and user keying wins; above it the hot key's
serial per-trigger scan (a Python fold, measured here at a few million
events/second) dominates and day keying wins.

The synthetic table matches the testdata events schema (event_id, ts,
user_id, event_type, value) with timestamps uniform over SPAN_DAYS and
the view/click/purchase stage mix the funnel scans for.

Usage: python tools/funnel_crossover.py [out.json] [max_hot_millions]
       [funnel|sessionize]

The optional third argument measures the SESSIONIZE variant pair on the
same ladder instead: unlike the funnel (Python fold vs Python fold),
the user-keyed sessionize baseline is the native JVM ``session_window``
operator, so its serial per-key scan is an order of magnitude faster
than the day-keyed twin's Python fold — the crossover sits much higher
(or out of local reach), which is exactly why it must be measured, not
assumed equal to the funnel's.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from pyspark.sql import functions as F  # noqa: E402

from spark_streaming_testbed_spark.session import get_session  # noqa: E402
from spark_streaming_testbed_spark.streaming.stateful import (  # noqa: E402
    streaming_funnel,
    streaming_funnel_daykeyed,
)

SPAN_DAYS = 30
COLD_USERS = 5_000
COLD_EVENTS_PER_USER = 30
COLD_ROWS = COLD_USERS * COLD_EVENTS_PER_USER
TYPES = ["view", "click", "view", "purchase", "view", "click", "error",
         "signup"]


def build_tier(spark, out_dir: str, hot_events: int) -> int:
    """Write ``{out_dir}/events.parquet``: a constant COLD_ROWS block
    (COLD_USERS users) plus ``hot_events`` rows owned by user 0, all
    timestamps uniform over SPAN_DAYS (hot and cold interleaved), stage
    types cycling so the greedy funnel scan always has matches."""
    total = COLD_ROWS + hot_events
    span_us = SPAN_DAYS * 86_400_000_000
    step_us = max(1, span_us // total)
    # rows are laid out round-robin: a row is hot when its index lands
    # in the first hot_events slots of a shuffled-by-modulus assignment
    # — simplest exact split: id < hot_events → hot, but spread in time
    # by striding ids across the span rather than blocking them
    df = (
        spark.range(total)
        .select(
            F.col("id").alias("event_id"),
            # stride: position in time = (id * LARGE_PRIME) % total, so
            # hot and cold rows interleave across the whole span
            F.timestamp_micros(
                F.lit(1735689600000000)  # 2025-01-01 UTC
                + (F.col("id") * F.lit(1_000_003) % F.lit(total))
                * F.lit(step_us)
            ).alias("ts"),
            F.when(F.col("id") < hot_events, F.lit(0))
            .otherwise(F.col("id") % COLD_USERS + 1)
            .alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in TYPES]),
                (F.col("id") % len(TYPES) + 1).cast("int"),
            ).alias("event_type"),
            (F.col("id") % 1000 / 10.0).alias("value"),
        )
    )
    df.write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))
    return total


def variant_pair(op: str):
    if op == "sessionize":
        from spark_streaming_testbed_spark.streaming.stateful import (
            streaming_sessionize,
            streaming_sessionize_daykeyed,
        )

        return streaming_sessionize, streaming_sessionize_daykeyed
    return streaming_funnel, streaming_funnel_daykeyed


def measure(spark, sf_dir: str, op: str) -> dict:
    walls: dict = {}
    results = {}
    user_fn, day_fn = variant_pair(op)
    for label, fn in (
        ("user_keyed", user_fn),
        ("day_keyed", day_fn),
    ):
        t0 = time.time()
        rows = fn(spark, sf_dir).collect()
        walls[label] = round(time.time() - t0, 3)
        results[label] = sorted(tuple(r) for r in rows)
    walls["results_equal"] = results["user_keyed"] == results["day_keyed"]
    return walls


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    max_hot = int(float(sys.argv[2]) * 1e6) if len(sys.argv) > 2 else 8_000_000
    op = sys.argv[3] if len(sys.argv) > 3 else "funnel"

    spark = get_session("funnel-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    ladder = [h for h in (
        50_000, 500_000, 2_000_000, 4_000_000, 8_000_000
    ) if h <= max_hot]
    tiers = {}
    with tempfile.TemporaryDirectory(prefix="funnel_xover_") as tmp:
        # warmup: compile both variants' plans once, unmeasured
        warm = os.path.join(tmp, "warm")
        build_tier(spark, warm, 10_000)
        for fn in variant_pair(op):
            fn(spark, warm).collect()

        for h in ladder:
            d = os.path.join(tmp, f"hot_{h}")
            total = build_tier(spark, d, h)
            res = measure(spark, d, op)
            res["total_rows"] = total
            res["hot_share"] = round(h / total, 3)
            tiers[h] = res
            print(
                f"hot={h:>9} ({res['hot_share']:.0%} of {total}): "
                f"user-keyed {res['user_keyed']}s, day-keyed "
                f"{res['day_keyed']}s, equal={res['results_equal']}",
                flush=True,
            )

    crossover = next(
        (h for h in ladder if tiers[h]["day_keyed"] < tiers[h]["user_keyed"]),
        None,
    )
    result = {
        "op": op,
        "cold_users": COLD_USERS,
        "cold_events_per_user": COLD_EVENTS_PER_USER,
        "span_days": SPAN_DAYS,
        "ladder_hot_events": ladder,
        "tiers": {str(h): tiers[h] for h in ladder},
        "crossover_hot_events": crossover,
        "all_equal": all(tiers[h]["results_equal"] for h in ladder),
    }
    print(json.dumps(result, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {out_path}")
    return 0 if result["all_equal"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
