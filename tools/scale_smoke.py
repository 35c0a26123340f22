"""Scale-holding smoke: run flagship operators on a 10x-replicated copy
of the sf0.1 tables and report wall-clock vs the sf0.1 numbers. Every
fact AND dimension table except region/nation is replicated with shifted
keys (FK pairs shifted in lockstep), so group/join cardinalities grow
with the data (the adversarial case for shuffles), not just row counts.

Usage: python tools/scale_smoke.py [replication] [sf_dir]
Writes one JSON line; keep it for the round notes. This is evidence the
plans HOLD as data grows — the per-op ratio should track the data ratio
(linear ops) or better (bounded-output aggregates), never blow past it.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_testbed_spark.session import get_session, load_table

#: flagship per family: shuffle-heavy, window, inverted-index, stateful,
#: iterative-graph, similarity, streaming replay (VERDICT r4 item 8)
SMOKE_OPS = [
    "batch_stats",
    "tpch_q1",
    "cumulative_counts",
    "target_encoding",
    "k_anonymity_audit",
    "percentile_rank_features",
    "gap_fill_locf",
    "cusum_drift",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "ngram_novelty",
    "feature_hashing",
    "token_stats",
    "dedup_clusters",
    "cosine_topk",
    "streaming_profile_stats",
    "triangle_count",
    "lpa_communities",
]

#: ops whose WORK grows superlinearly under verbatim replication by
#: construction — every replica of a document is a true near-duplicate
#: of its siblings, so the dup-PAIR set grows ~quadratically in the
#: replication factor (C(10,2)+10 = 55x per original dup pair at 10x).
#: For these, judge wall-ratio against the pair growth, not the data
#: ratio: for ngram_jaccard_pairs the pair set IS the output
#: (rows_ratio shows it); for dedup_clusters it is the edge input to
#: the CC iteration while the output stays one row per doc.
SUPERLINEAR_OUTPUT_OPS = {
    "ngram_jaccard_pairs": (
        "output IS the dup-pair set, which grows ~quadratically by "
        "construction (verbatim replicas are true near-dups)"
    ),
    "dedup_clusters": (
        "edge INPUT to the CC iteration grows ~quadratically by "
        "construction (verbatim replicas are true near-dups); output "
        "stays one row per doc"
    ),
}

#: per-table id columns to shift per replica so keys grow with the data.
#: FK pairs shift in lockstep (o_orderkey/l_orderkey, o_custkey/c_custkey,
#: l_partkey/p_partkey, l_suppkey/s_suppkey) so joins stay referentially
#: intact while EVERY join/group key's cardinality grows with the data —
#: per-part and per-supplier groups included (ADVICE r4: previously
#: part/supplier were copied once, so part-keyed group counts stayed
#: flat and only rows-per-group grew).
REKEY = {
    "events": {"event_id": 10_000_000, "user_id": 10_000},
    "documents": {"doc_id": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 100_000,
    },
    "customer": {"c_custkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "embeddings": {"vec_id": 1_000_000},
}


def replicate(spark, sf_dir: str, out_dir: str, times: int) -> None:
    # region/nation are genuine fixed dimensions (25/5 rows at any SF in
    # TPC-H); everything else replicates with shifted keys
    for name in ["region", "nation"]:
        load_table(spark, sf_dir, name).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    for name, shifts in REKEY.items():
        base = load_table(spark, sf_dir, name)
        parts = []
        for i in range(times):
            df = base
            for col, step in shifts.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * step))
            # shift timestamps per replica so time-keyed groups also grow
            if name == "events":
                df = df.withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {31 * i} DAYS")
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )


def main() -> None:
    times = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    import __spark_entry__ as entry

    spark = get_session("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    result = {"replication": times, "base": sf_dir, "ops": {}}
    with tempfile.TemporaryDirectory(prefix="scale_smoke_") as tmp:
        replicate(spark, sf_dir, tmp, times)
        for name in SMOKE_OPS:
            fn = queries[name]
            fn(spark, sf_dir).count()  # warm base
            t0 = time.perf_counter()
            base_rows = fn(spark, sf_dir).count()
            base_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            big_rows = fn(spark, tmp).count()
            big_s = time.perf_counter() - t0
            entry_row = {
                "base_s": round(base_s, 2),
                "big_s": round(big_s, 2),
                "ratio": round(big_s / max(base_s, 1e-9), 1),
                "base_rows": base_rows,
                "big_rows": big_rows,
                "rows_ratio": round(big_rows / max(base_rows, 1), 1),
            }
            if name in SUPERLINEAR_OUTPUT_OPS:
                entry_row["note"] = SUPERLINEAR_OUTPUT_OPS[name]
            result["ops"][name] = entry_row
            print(name, entry_row, flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
