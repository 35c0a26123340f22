"""Regenerate PLANS.md: formatted physical plans for headline queries.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

from spark_streaming_testbed_spark.operators import relational as R  # noqa: E402
from spark_streaming_testbed_spark.operators.dedup import (  # noqa: E402
    duplicate_spans,
    ngram_jaccard_pairs,
)
from spark_streaming_testbed_spark.operators.similarity import (  # noqa: E402
    ann_ivf_topk,
    cosine_topk,
    knn_graph,
    project_embeddings,
    semantic_dup_pairs,
)
from spark_streaming_testbed_spark.sources.warehouse import (  # noqa: E402
    bucketed_join_stats,
)
from spark_streaming_testbed_spark.operators.advanced import (  # noqa: E402
    event_funnel,
)
from spark_streaming_testbed_spark.operators.multimodal import (  # noqa: E402
    multimodal_pixel_stats,
)
from spark_streaming_testbed_spark.operators.text import (  # noqa: E402
    entropy_signals,
    lang_id_ngram,
    winnow_fingerprints,
)
from spark_streaming_testbed_spark.operators import prep as P  # noqa: E402
from spark_streaming_testbed_spark.operators import modeling as M  # noqa: E402
from spark_streaming_testbed_spark.session import get_session  # noqa: E402

TARGETS = [
    ("zipf_token_slope", M.zipf_token_slope,
     "token agg + TakeOrderedAndProject top-K; no global rank window"),
    ("survival_km_curve", M.survival_km_curve,
     "windows only over the tiny reduced gap table; integer fold"),
    ("degree_assortativity", M.degree_assortativity,
     "degree table broadcast twice; single reduce over edges"),
    ("batch_stats (A1 flagship)", R.batch_stats,
     "partial+final HashAggregate on (window, key); vectorized parquet scan"),
    ("tpch_q1", R.tpch_q1,
     "date filter pushed to scan; 7-column pruned read; 8 aggs fused in one pass"),
    ("star_join", R.star_join,
     "customer+nation broadcast; single shuffle on the fact join key"),
    ("semi_anti_join", R.semi_anti_join,
     "LeftSemi/LeftAnti — no wide row materialization"),
    ("cosine_topk", cosine_topk,
     "query side broadcast; corpus streamed once; no CartesianProduct"),
    ("ngram_jaccard_pairs", ngram_jaccard_pairs,
     "inverted-index equi-join on xxhash64 keys; no global cross join"),
    ("tpch_q2", R.tpch_q2,
     "correlated MIN as a window over p_partkey — one pass over the "
     "candidate set; all dimensions broadcast"),
    ("tpch_q11", R.tpch_q11,
     "4-column pruned lineitem scan; supplier/nation dims broadcast; one "
     "hash-partition shuffle per-part; scalar total via broadcast + "
     "runtime exchange reuse"),
    ("winnow_fingerprints", winnow_fingerprints,
     "one doc_id exchange fans out the md5-per-gram explode AND serves "
     "the sliding-min window and the distinct (no added shuffle)"),
    ("lang_id_ngram", lang_id_ngram,
     "row-local instr() membership sums in a single codegen scan stage — "
     "no explode, no aggregation shuffle"),
    ("project_embeddings", project_embeddings,
     "JL random projection as a row-local codegen map over literal "
     "planes — zero compute shuffles, no UDF"),
    ("entropy_signals", entropy_signals,
     "zero-shuffle quality signals: array-fold token entropy + 26 fused "
     "regexp_count letter bins, one codegen scan stage"),
    ("event_funnel", event_funnel,
     "min-ts chaining: per-stage conditional aggs joined co-partitioned "
     "on user_id; no per-user event lists, right side shrinks per stage"),
    ("duplicate_spans", duplicate_spans,
     "row-local window hashing (sequence/slice codegen, no UDF); one hash "
     "agg finds cross-doc windows; linear join back on the 60-bit hash — "
     "k rows per hot window, never k^2"),
    ("tpch_q21", R.tpch_q21,
     "EXISTS/NOT-EXISTS pair re-planned as one per-order aggregate "
     "(distinct vs distinct-late suppliers) — one shuffle, no correlated joins"),
    ("cumulative_counts", R.cumulative_counts,
     "two-phase cumsum: windows keyed (event_type, day) for |keys|·|days| "
     "parallelism; tiny prefix-offset table broadcast back; decimal "
     "accumulation so re-association is exact"),
    ("ann_ivf_topk", ann_ivf_topk,
     "IVF list assignment is row-local codegen against centroid literals "
     "(no UDF, no broadcast variable); probes broadcast; corpus scanned "
     "once and scored only within probed lists"),
    ("semantic_dup_pairs", semantic_dup_pairs,
     "SemDeDup: the O(n²) cosine confined to within-cluster blocks via "
     "the deterministic quantizer's codegen list assignment; one "
     "list_id-keyed shuffle, no cartesian product"),
    ("skew_salted_join", R.skew_salted_join,
     "fact side salted deterministically, dim side exploded ×16 — hot "
     "keys spread over 16 reducers; join keys (user_id, salt)"),
    ("bucketed_join_stats", bucketed_join_stats,
     "both sides bucketed+sorted on the join key: zero-exchange "
     "SortMergeJoin — the shuffle paid once at write time"),
    ("target_encoding", P.target_encoding,
     "leave-one-out encoding as a bounded type-stats broadcast back "
     "onto the facts — zero fact-side shuffle"),
    ("cusum_drift", P.cusum_drift,
     "the sequential CUSUM recursion runs in applyInPandas over the "
     "per-type DAILY series (facts reduced by HashAggregate first, "
     "baseline broadcast) — Python touches |types|x|days| rows only"),
    ("gap_fill_locf", P.gap_fill_locf,
     "grid = broadcast cross join of two tiny distinct aggregates; "
     "LOCF is ONE window pass partitioned by type"),
    ("ngram_novelty", P.ngram_novelty,
     "inverted-index shape: gram -> min(doc_id) aggregate joined back "
     "on the gram key — no pairwise doc comparisons"),
    ("embedding_threshold_sweep", P.embedding_threshold_sweep,
     "pairs materialize once at the loosest threshold within IVF "
     "clusters; each tighter threshold is an explode+re-aggregate"),
    ("knn_graph", knn_graph,
     "bucketed corpus SELF-join on the hyperplane signature (equi-join, "
     "no broadcast of either side); candidates are n_tables*n^2/2^planes "
     "— the plane count is the log2(n) scale knob, extra tables hold "
     "recall (defaults pinned to the static oracle)"),
    ("multimodal_pixel_stats", multimodal_pixel_stats,
     "columnar scan -> encode mapInPandas -> decode/reduce mapInPandas "
     "-> sort: payload bytes never cross a shuffle, only fixed-width "
     "integer stats reach the exchange"),
]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    fresh: dict[str, list[str]] = {}
    for name, fn, why in TARGETS:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, sf).explain("formatted")
        head = buf.getvalue().split("\n\n")[0]
        fresh[name] = [f"## {name}", "", f"*Why this shape:* {why}", "",
                       "```", head.strip(), "```", ""]
    # PRESERVE sections appended by later rounds (PLANS.md carries more
    # trees than TARGETS — see the round-4 skyline/funnel additions):
    # refresh in place the sections TARGETS covers, keep everything
    # else verbatim, and append TARGETS entries missing from the file.
    with open("/root/repo/PLANS.md") as f:
        existing = f.read()
    blocks = existing.split("\n## ")
    out = [blocks[0].rstrip(), ""]
    seen = set()
    for block in blocks[1:]:
        name = block.split("\n", 1)[0].strip()
        if name in fresh:
            out += fresh[name]
            seen.add(name)
        else:
            out += [f"## {block.rstrip()}", ""]
    for name, _, _ in TARGETS:
        if name not in seen:
            out += fresh[name]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md regenerated ({len(fresh)} refreshed, "
          f"{len(blocks) - 1 - len(seen)} preserved)")


if __name__ == "__main__":
    main()
