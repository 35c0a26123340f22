"""Clean-machine re-measure of bench scenarios flagged as possible
regressions (VERDICT r5 item 3 / VERDICT r4 item 2 methodology): one
untimed warm run, then n>=4 timed runs per suspect with no concurrent
Spark jobs, reporting medians alongside the raw runs and the prior
rounds' bench values so the reader can separate contention noise from a
real regression.

Usage: python tools/perf_watch.py PERF_WATCH_rNN.json
"""
from __future__ import annotations

import json
import os
import statistics
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main(out_path: str) -> None:
    import bench
    from spark_streaming_testbed_spark.session import get_session

    spark = get_session("perf_watch")
    spark.sparkContext.setLogLevel("ERROR")

    n_rows = bench.SCENARIO1_RATE * bench.SCENARIO1_SECONDS
    bench.scenario1_rows_per_sec(spark)  # warm: UDF workers + plans

    s1_runs = []
    p50_runs, pmax_runs = [], []
    rec_runs, on_max_runs = [], []
    for _ in range(4):
        s1_runs.append(round(n_rows / bench.scenario1_rows_per_sec(spark)[0], 3))
        lat, _lat_detail = bench.scenario2_trigger_latency(spark)
        p50_runs.append(lat["scenario2_trigger_p50"])
        pmax_runs.append(lat["scenario2_trigger_max"])
        pid, pid_detail = bench.scenario2_pid_recovery(spark)
        if "scenario2_pid_recovery_sec" in pid:
            rec_runs.append(pid["scenario2_pid_recovery_sec"])
        if "scenario2_pid_on_max_trigger" in pid:
            on_max_runs.append(pid["scenario2_pid_on_max_trigger"])

    def load_round(r: int) -> dict:
        with open(os.path.join(REPO, f"BENCH_r{r:02d}.json")) as fh:
            d = json.load(fh)
        return (d.get("parsed") or d).get("queries", {})

    r4, r5 = load_round(4), load_round(5)

    def block(name: str, runs: list[float]) -> dict:
        return {
            "median_s": round(statistics.median(runs), 3) if runs else None,
            "runs": runs,
            "r4_bench": r4.get(name),
            "r5_bench": r5.get(name),
        }

    out = {
        "note": (
            "VERDICT r5 item 3: clean-machine warm re-measure of the four "
            "r4->r5 scenario regressions (n=4 after a warm run, no "
            "concurrent Spark jobs, local[32]). Each scenario2_pid_* "
            "median is itself a best-of-2 per run, matching bench.py."
        ),
        "scenario1_ingest": block("scenario1_ingest", s1_runs),
        "scenario2_trigger_p50": block("scenario2_trigger_p50", p50_runs),
        "scenario2_trigger_max": block("scenario2_trigger_max", pmax_runs),
        "scenario2_pid_recovery_sec": block(
            "scenario2_pid_recovery_sec", rec_runs),
        "scenario2_pid_on_max_trigger": block(
            "scenario2_pid_on_max_trigger", on_max_runs),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(REPO, "PERF_WATCH_tmp.json"))
