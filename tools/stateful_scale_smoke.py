"""sf1 distinct-corpus scale tier for the STATEFUL streaming family
(VERDICT r6 item 5).

The graph/dedup families have distinct-corpus scale evidence
(tools/sf1_smoke.py, tools/graph_scale_smoke.py); this closes the gap
for the state-backed streaming operators (applyInPandasWithState ops,
the complete-mode leaderboard, session_window, sliding windows — r8
added the list/map/window-population state shapes per VERDICT r7
item 5) by replaying a genuinely-distinct events corpus at 10x the
sf0.1 volume AND 10x the distinct users, and measuring what actually
matters for state-backed operators at 100 TB: STATE SIZE (bytes per
key x number of keys, read from the state store's own progress
metrics), not just wall time. streaming_upsert is measured wall-only:
its running table lives in ping-pong parquet snapshots (foreachBatch
MERGE), not the state store.

Per-op guards:
- bytes/key at 10x data <= 2x the sf0.1 bytes/key (per-key state is
  bounded by construction — ewma: 3 scalars/user, funnel: 2 longs/user,
  kmv: K hashes/event-type, MG heavy hitters: k counters/bucket — and
  the state store metrics must agree);
- keyed-by-user ops grow keys ~10x (new users create new state rows),
  keyed-by-constant ops (kmv: 5 types, MG: fixed buckets) hold keys
  FLAT — total state independent of corpus size;
- wall growth <= ~linear (ratio <= 12 at 10x rows, slack for the
  fixed per-trigger overhead of the local file-stream replay).

Usage: python tools/stateful_scale_smoke.py [n_docs] [n_events] [n_users]
Prints one JSON object; merge into SCALE_SMOKE_r{N}.json as the
"sf1_stateful" section. Synthetic data goes to a temp dir and is
deleted afterwards — /root/testdata stays untouched.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

from sf1_smoke import generate, generate_events  # noqa: E402

SF01 = "/root/testdata/sf0.1"


class StateMetricsListener:
    """Collects each completed trigger's stateOperators block (rows in
    state + state-store memory) — the engine's own accounting, not a
    re-derivation."""

    def __new__(cls):
        from pyspark.sql.streaming import StreamingQueryListener

        class _L(StreamingQueryListener):
            def __init__(self) -> None:
                self.snapshots: list[dict] = []

            def onQueryStarted(self, event) -> None:  # noqa: N802
                pass

            def onQueryProgress(self, event) -> None:  # noqa: N802
                doc = json.loads(event.progress.json)
                for op in doc.get("stateOperators") or []:
                    # runId + timestamp let the reader attribute each
                    # snapshot to the right query: listener delivery is
                    # async, so a straggler event from the PREVIOUS
                    # (larger-state) query can land after clear() and
                    # pollute a max-by-rows pick (ADVICE r7)
                    self.snapshots.append({
                        "run_id": doc.get("runId"),
                        "ts": doc.get("timestamp"),
                        "rows": op.get("numRowsTotal"),
                        "mem": op.get("memoryUsedBytes"),
                    })

            def onQueryIdle(self, event) -> None:  # noqa: N802
                pass

            def onQueryTerminated(self, event) -> None:  # noqa: N802
                pass

        return _L()


def final_state(listener) -> dict:
    """Peak-state snapshot of the MOST RECENT query run (listener
    delivery is async, so the caller sleeps briefly before reading,
    and snapshots are filtered to the run with the latest progress
    timestamp so a straggler from the previous query can't be picked
    — ADVICE r7)."""
    time.sleep(2.0)
    if not listener.snapshots:
        return {"rows": None, "mem": None}
    latest = max(listener.snapshots, key=lambda s: s["ts"] or "")
    mine = [s for s in listener.snapshots if s["run_id"] == latest["run_id"]]
    # NoTimeout ops: the final trigger holds every key ever seen;
    # evicting ops (watermarked windows/sessions): the peak trigger
    # is the number the 100 TB capacity plan needs
    return max(mine, key=lambda s: (s["rows"] or 0))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_users = int(sys.argv[3]) if len(sys.argv) > 3 else 15_000

    from spark_streaming_testbed_spark.session import get_session
    from spark_streaming_testbed_spark.streaming.stateful import (
        streaming_ewma,
        streaming_funnel,
        streaming_heavy_hitters,
        streaming_kmv_distinct,
        streaming_latest_state,
        streaming_sessionize,
        streaming_sliding_stats,
        streaming_topk_users,
    )

    spark = get_session("stateful-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    #: (op, state-key population scales with users?) — the r8 additions
    #: (VERDICT r7 item 5) are the ops whose per-key state is a list,
    #: map, or window population, where an unbounded buffer would hide:
    #: latest_state keeps a per-user map of event types, sessionize and
    #: sliding_stats keep watermark-evicted window state (their "keys"
    #: are PEAK in-state sessions/windows), topk_users keeps
    #: complete-mode per-user counters.
    OPS = [
        ("streaming_ewma", streaming_ewma, True),
        ("streaming_funnel", streaming_funnel, True),
        ("streaming_kmv_distinct", streaming_kmv_distinct, False),
        ("streaming_heavy_hitters", streaming_heavy_hitters, False),
        ("streaming_latest_state", streaming_latest_state, True),
        ("streaming_topk_users", streaming_topk_users, True),
        ("streaming_sessionize", streaming_sessionize, True),
        # sliding windows key on (window, event_type): the event-time
        # span and hop width are fixed, so in-state windows per trigger
        # are span-bound, independent of row volume
        ("streaming_sliding_stats", streaming_sliding_stats, False),
    ]

    listener = StateMetricsListener()
    spark.streams.addListener(listener)
    result: dict = {}
    try:
        with tempfile.TemporaryDirectory(prefix="sf1_stateful_") as tmp:
            result["generated"] = generate(tmp, n_docs, n_docs // 10 or 1)
            result["generated"].update(generate_events(tmp, n_events, n_users))

            for name, fn, user_keyed in OPS:
                fn(spark, SF01).count()  # warm: plans + python workers
                listener.snapshots.clear()
                t0 = time.perf_counter()
                base_rows = fn(spark, SF01).count()
                base_s = time.perf_counter() - t0
                base_state = final_state(listener)

                listener.snapshots.clear()
                t0 = time.perf_counter()
                big_rows = fn(spark, tmp).count()
                big_s = time.perf_counter() - t0
                big_state = final_state(listener)

                def per_key(s: dict) -> float | None:
                    if s["rows"] and s["mem"]:
                        return round(s["mem"] / s["rows"], 1)
                    return None

                bpk_base, bpk_big = per_key(base_state), per_key(big_state)
                wall_ratio = round(big_s / max(base_s, 1e-9), 2)
                key_ratio = (
                    round(big_state["rows"] / base_state["rows"], 2)
                    if base_state["rows"] and big_state["rows"] else None)
                bpk_ratio = (
                    round(bpk_big / bpk_base, 2)
                    if bpk_base and bpk_big else None)
                checks = {
                    "bytes_per_key_ratio<=2": bool(
                        bpk_ratio is not None and bpk_ratio <= 2),
                    "wall_ratio<=12": bool(wall_ratio <= 12),
                    ("keys~10x" if user_keyed else "keys_flat"): bool(
                        key_ratio is not None
                        and (5 <= key_ratio <= 15 if user_keyed
                             else key_ratio <= 1.5)),
                }
                result[name] = {
                    "sf01_s": round(base_s, 2), "sf1_s": round(big_s, 2),
                    "wall_ratio": wall_ratio,
                    "sf01_rows": base_rows, "sf1_rows": big_rows,
                    "sf01_state_keys": base_state["rows"],
                    "sf1_state_keys": big_state["rows"],
                    "sf01_state_bytes": base_state["mem"],
                    "sf1_state_bytes": big_state["mem"],
                    "sf01_bytes_per_key": bpk_base,
                    "sf1_bytes_per_key": bpk_big,
                    "bytes_per_key_ratio": bpk_ratio,
                    "state_key_ratio": key_ratio,
                    "checks": checks,
                    "pass": all(checks.values()),
                }
                print(name, result[name], flush=True)

            # streaming_upsert keeps its running table in alternating
            # parquet snapshots via foreachBatch (no state store), so
            # only the wall guard applies; the orders feed comes from
            # the fixed sf0.1 table either way, so this is a replay-
            # machinery stability check, not a 10x-state claim
            from spark_streaming_testbed_spark.streaming.stateful import (
                streaming_upsert,
            )

            streaming_upsert(spark, SF01).count()  # warm
            t0 = time.perf_counter()
            up_rows = streaming_upsert(spark, SF01).count()
            up_s = time.perf_counter() - t0
            result["streaming_upsert"] = {
                "sf01_s": round(up_s, 2), "sf01_rows": up_rows,
                "state_store": "none (foreachBatch parquet merge)",
                "checks": {"runs_clean": bool(up_rows > 0)},
                "pass": bool(up_rows > 0),
            }
            print("streaming_upsert", result["streaming_upsert"],
                  flush=True)
    finally:
        spark.streams.removeListener(listener)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
