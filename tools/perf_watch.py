"""Clean-machine re-measure of bench scenarios and batch queries flagged
as possible regressions (VERDICT r5 item 3 / VERDICT r4 item 2
methodology): one untimed warm run, then n>=4 timed runs per suspect
with no concurrent Spark jobs, reporting medians alongside the raw runs
and the prior rounds' bench values so the reader can separate
contention noise from a real regression.

Usage: python tools/perf_watch.py PERF_WATCH_rNN.json [query ...]
(extra args = batch headline queries to re-time at $SPARK_GRAFT_SF_DIR
in addition to the live scenario suite)
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main(out_path: str, batch_queries: list[str]) -> None:
    import bench
    import __spark_entry__ as entry
    from spark_streaming_testbed_spark.session import get_session

    spark = get_session("perf_watch")
    spark.sparkContext.setLogLevel("ERROR")

    n_rows = bench.SCENARIO1_RATE * bench.SCENARIO1_SECONDS
    bench.scenario1_rows_per_sec(spark)  # warm: UDF workers + plans

    s1_runs = []
    p50_runs, pmax_runs = [], []
    rec_runs, on_max_runs, off_max_runs = [], [], []
    for _ in range(4):
        s1_runs.append(round(n_rows / bench.scenario1_rows_per_sec(spark)[0], 3))
        lat, _lat_detail = bench.scenario2_trigger_latency(spark)
        # lat can be empty when neither run produced a non-empty trigger
        # (ADVICE r6): record only what was measured, never KeyError
        if "scenario2_trigger_p50" in lat:
            p50_runs.append(lat["scenario2_trigger_p50"])
        if "scenario2_trigger_max" in lat:
            pmax_runs.append(lat["scenario2_trigger_max"])
        pid, pid_detail = bench.scenario2_pid_recovery(spark)
        if "scenario2_pid_recovery_sec" in pid:
            rec_runs.append(pid["scenario2_pid_recovery_sec"])
        if "scenario2_pid_on_max_trigger" in pid:
            on_max_runs.append(pid["scenario2_pid_on_max_trigger"])
        # the uncontrolled overload baseline — the arm bench flagged in
        # round 8 (its worst trigger is inherently run-to-run volatile)
        if "scenario2_pid_off_max_trigger" in pid:
            off_max_runs.append(pid["scenario2_pid_off_max_trigger"])

    # batch-query suspects (VERDICT r6 item 1): warm once, then n=4
    # timed end-to-end runs each (plan + execute + noop materialize) at
    # the bench SF, exactly how bench.py times the headline
    batch_runs: dict[str, list[float]] = {}
    queries = entry.queries()
    for name in batch_queries:
        fn = queries[name]
        bench.materialize(fn(spark, bench.SF_DIR))  # warm
        runs = []
        for _ in range(4):
            t0 = time.perf_counter()
            bench.materialize(fn(spark, bench.SF_DIR))
            runs.append(round(time.perf_counter() - t0, 3))
        batch_runs[name] = runs

    def load_round(r: int) -> dict:
        with open(os.path.join(REPO, f"BENCH_r{r:02d}.json")) as fh:
            d = json.load(fh)
        return (d.get("parsed") or d).get("queries", {})

    # compare against the two most recent recorded rounds (ADVICE r8:
    # regex the round number — slicing [:2] silently truncated a
    # three-digit round — and fail clearly with fewer than two files)
    import glob as _glob
    import re as _re
    recorded = sorted(
        int(m.group(1))
        for f in _glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := _re.search(r"_r(\d+)\.json$", f)))
    if len(recorded) < 2:
        raise SystemExit(
            f"perf_watch needs >= 2 recorded BENCH_r*.json rounds to "
            f"compare, found {len(recorded)}: {recorded}")
    ra, rb = recorded[-2], recorded[-1]
    prev_a, prev_b = load_round(ra), load_round(rb)

    def block(name: str, runs: list[float]) -> dict:
        return {
            "median_s": round(statistics.median(runs), 3) if runs else None,
            "runs": runs,
            f"r{ra}_bench": prev_a.get(name),
            f"r{rb}_bench": prev_b.get(name),
        }

    out = {
        "note": (
            "VERDICT r6 item 1: clean-machine warm re-measure of the "
            "bench suspects (n=4 after a warm run, no concurrent Spark "
            "jobs, local[32]). Each scenario2_pid_* sample is itself a "
            "median-of-3 per run, matching bench.py; batch queries are "
            "end-to-end noop materializations at the bench SF."
        ),
        "scenario1_ingest": block("scenario1_ingest", s1_runs),
        "scenario2_trigger_p50": block("scenario2_trigger_p50", p50_runs),
        "scenario2_trigger_max": block("scenario2_trigger_max", pmax_runs),
        "scenario2_pid_recovery_sec": block(
            "scenario2_pid_recovery_sec", rec_runs),
        "scenario2_pid_on_max_trigger": block(
            "scenario2_pid_on_max_trigger", on_max_runs),
        "scenario2_pid_off_max_trigger": block(
            "scenario2_pid_off_max_trigger", off_max_runs),
    }
    for name, runs in batch_runs.items():
        out[name] = block(name, runs)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(REPO, "PERF_WATCH_tmp.json"),
         sys.argv[2:])
