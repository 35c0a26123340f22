"""Distinct-corpus scale tier for the graph family (closes the one
"explained, not measured" caveat from the round-5 plan audit).

The 10x-replication smoke showed the graph ops at 2.0-2.4x wall per
10x data, attributed to replica-induced edge growth. This tool
separates the two effects with DISTINCT in-distribution events shaped
like the driver's sf0.1 generator (1.5k users / 100k events / 5 event
types / 30 days; value ~ exp(50); JSON props), in two variants:

- ``extended``: 10x users over a 10x time window — per-(type, minute)
  cell occupancy stays constant, so the co-activity EDGE count grows
  ~linearly. This isolates the execution machinery: a clean plan
  should re-time near-linearly here.
- ``densified``: 10x users in the SAME 30-day window — cell occupancy
  grows 10x, so per-cell pairs grow ~100x. The edge blowup is a
  property of the co-activity graph itself (more users genuinely DO
  co-act more within a fixed window), not of the physical plan; the
  honest scale metric for this variant is seconds **per edge**, which
  the report includes.

Usage: python tools/graph_scale_smoke.py [n_events]
Prints one JSON object; merge into SCALE_SMOKE_r{N}.json as the
"graph_distinct" section. Synthetic data goes to a temp dir —
/root/testdata stays untouched.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SEED = 42
BASE_EVENTS = 100_000
BASE_USERS = 1_500
BASE_DAYS = 30
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
EPOCH_MS = 1_704_067_200_000  # 2024-01-01 UTC, matches the driver data


def generate(out_dir: str, n_events: int, n_users: int, n_days: int) -> dict:
    rng = np.random.default_rng(SEED)
    ts_ms = EPOCH_MS + rng.integers(
        0, n_days * 86_400_000, n_events, dtype=np.int64
    )
    users = rng.integers(0, n_users, n_events, dtype=np.int64)
    types = rng.integers(0, len(EVENT_TYPES), n_events)
    value = np.round(rng.exponential(50.0, n_events), 2)
    props = [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_events)]
    tbl = pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": pa.array(ts_ms, pa.timestamp("ms")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array([EVENT_TYPES[t] for t in types]),
        "value": pa.array(value, pa.float64()),
        "props": pa.array(props),
    })
    pq.write_table(tbl, os.path.join(out_dir, "events.parquet"))
    return {"n_events": n_events, "n_users": n_users, "n_days": n_days}


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10 * BASE_EVENTS

    from spark_streaming_testbed_spark.operators.advanced import (
        _coactivity_edges,
        kcore_decomposition,
        lpa_communities,
        pagerank_coactivity,
        triangle_count,
    )
    from spark_streaming_testbed_spark.operators.modeling import (
        degree_assortativity,
        link_prediction_topk,
    )
    from spark_streaming_testbed_spark.session import get_session, load_table

    spark = get_session("graph-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    ops = {
        "triangle_count": triangle_count,
        "kcore_decomposition": kcore_decomposition,
        "pagerank_coactivity": pagerank_coactivity,
        "lpa_communities": lpa_communities,
        "degree_assortativity": degree_assortativity,
        "link_prediction_topk": link_prediction_topk,
    }
    scale = n_events // BASE_EVENTS
    variants = {
        "extended": (n_events, BASE_USERS * scale, BASE_DAYS * scale),
        "densified": (n_events, BASE_USERS * scale, BASE_DAYS),
    }
    result: dict = {"scale": scale, "variants": {}}

    def edge_count(sf_dir: str) -> int:
        return _coactivity_edges(load_table(spark, sf_dir, "events")).count()

    base_edges = edge_count(SF01)
    result["sf01_edges"] = base_edges
    base_s: dict[str, float] = {}
    for name, fn in ops.items():
        fn(spark, SF01).count()  # warm
        t0 = time.perf_counter()
        fn(spark, SF01).count()
        base_s[name] = time.perf_counter() - t0
    result["sf01_s"] = {k: round(v, 2) for k, v in base_s.items()}

    for vname, (ne, nu, nd) in variants.items():
        with tempfile.TemporaryDirectory(prefix=f"graph_{vname}_") as tmp:
            meta = generate(tmp, ne, nu, nd)
            edges = edge_count(tmp)
            rows: dict = {"generated": meta, "edges": edges,
                          "edge_ratio": round(edges / max(base_edges, 1), 1)}
            for name, fn in ops.items():
                t0 = time.perf_counter()
                fn(spark, tmp).count()
                s = time.perf_counter() - t0
                rows[name] = {
                    "s": round(s, 2),
                    "wall_ratio": round(s / max(base_s[name], 1e-9), 1),
                    # the per-edge normalization: a clean plan keeps
                    # this near 1.0x even when the graph densifies
                    "per_edge_ratio": round(
                        (s / max(edges, 1))
                        / (base_s[name] / max(base_edges, 1)), 2),
                }
                print(vname, name, rows[name], flush=True)
            result["variants"][vname] = rows

    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
