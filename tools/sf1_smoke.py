"""sf1 scale tier for the LSH / ANN stack (VERDICT r5 item 5).

The 10x-replication smoke (tools/scale_smoke.py) proves plan shape, but
every replica is a verbatim near-dup of its siblings, so band-collision
behavior and the hot-shingle max-df cap get an artificially easy
distribution. This tool generates DISTINCT synthetic documents and
embeddings at 10x the sf0.1 volume, shaped like the driver's generator
(same 31-word vocabulary, empirical token-length / language mix, 20
sources, plus injected near-dup variants at a controlled rate so a
non-trivial ground-truth pair set exists), then re-times the LSH stack
and re-measures the recall contracts from tests/test_llm_ops.py:

- lsh_near_dup_pairs ⊆ ngram_jaccard_pairs and recall >= 0.8
- ann_ivf_topk recall vs cosine_topk (random vectors: modest bar 0.2)

Usage: python tools/sf1_smoke.py [n_docs] [n_vecs]
Prints one JSON object; merge into SCALE_SMOKE_r{N}.json as the "sf1"
section. Synthetic data goes to a temp dir and is deleted afterwards —
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
NEAR_DUP_RATE = 0.015  # share of docs that are perturbed copies
EXACT_DUP_RATE = 0.002  # share of docs that are verbatim copies


def _profile_base() -> tuple[list[str], np.ndarray, list[str], np.ndarray]:
    """Empirical vocab, token-length distribution, and language mix of
    the driver-generated sf0.1 documents — keeps the scaled corpus
    in-distribution instead of inventing a new one."""
    import duckdb

    con = duckdb.connect()
    vocab = [
        w for (w,) in con.execute(
            "SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
            f"FROM '{SF01}/documents.parquet' ORDER BY 1"
        ).fetchall()
    ]
    lens = np.array([
        n for (n,) in con.execute(
            "SELECT len(string_split(text, ' ')) "
            f"FROM '{SF01}/documents.parquet'"
        ).fetchall()
    ])
    lang_rows = con.execute(
        "SELECT lang, count(*) FROM "
        f"'{SF01}/documents.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    langs = [r[0] for r in lang_rows]
    lang_p = np.array([r[1] for r in lang_rows], dtype=float)
    lang_p /= lang_p.sum()
    return vocab, lens, langs, lang_p


def generate(out_dir: str, n_docs: int, n_vecs: int) -> dict:
    rng = np.random.default_rng(SEED)
    vocab, lens, langs, lang_p = _profile_base()
    vocab_arr = np.array(vocab)

    doc_lens = rng.choice(lens, size=n_docs)
    texts: list[str] = []
    n_near = 0
    n_exact = 0
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < EXACT_DUP_RATE:
            texts.append(texts[int(rng.integers(0, i))])
            n_exact += 1
        elif i > 10 and r < EXACT_DUP_RATE + NEAR_DUP_RATE:
            src = texts[int(rng.integers(0, i))].split(" ")
            # 1-3 token substitutions: kills up to 4 shingles each, so
            # Jaccard lands mostly above the 0.4 threshold but spreads
            # across it — candidates near the boundary exercise the
            # verify step, not just the bucketing
            for _ in range(int(rng.integers(1, 4))):
                src[int(rng.integers(0, len(src)))] = str(
                    vocab_arr[int(rng.integers(0, len(vocab_arr)))])
            texts.append(" ".join(src))
            n_near += 1
        else:
            toks = vocab_arr[rng.integers(0, len(vocab_arr), int(doc_lens[i]))]
            texts.append(" ".join(toks))
    lang_col = rng.choice(langs, size=n_docs, p=lang_p)
    src_col = [f"src{int(i)}" for i in rng.integers(0, 20, n_docs)]
    docs = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([str(x) for x in lang_col]),
        "source": pa.array(src_col),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))

    # driver embeddings are iid normal(0, 0.125) 64-d (norm ~= 1),
    # labels uniform 0-9 and independent of geometry
    V = rng.normal(0.0, 0.125, size=(n_vecs, 64)).astype(np.float32)
    emb = pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.array(list(V), pa.list_(pa.float32())),
        "label": pa.array(
            rng.integers(0, 10, n_vecs).astype(np.int32), pa.int32()),
    })
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))
    return {
        "n_docs": n_docs, "n_vecs": n_vecs,
        "injected_near_dup_docs": n_near, "injected_exact_dup_docs": n_exact,
    }


def generate_clustered_embeddings(
    out_dir: str, n_vecs: int, n_clusters: int = 50
) -> dict:
    """Mixture-of-Gaussians corpus — the REALISTIC embedding shape
    (real encoders cluster by topic/language/style), as opposed to the
    driver's iid-normal corpus, which is the adversarial structure-free
    case where ANY index's recall is information-theoretically tied to
    the probed fraction. On this corpus a FIXED small nprobe must hold
    recall while probing a vanishing fraction — the sub-linear claim
    the IVF scale knob exists for."""
    rng = np.random.default_rng(SEED + 2)
    centers = rng.normal(0.0, 0.125, size=(n_clusters, 64))
    assign = rng.integers(0, n_clusters, n_vecs)
    V = (centers[assign]
         + rng.normal(0.0, 0.03, size=(n_vecs, 64))).astype(np.float32)
    emb = pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.array(list(V), pa.list_(pa.float32())),
        "label": pa.array(
            (assign % 10).astype(np.int32), pa.int32()),
    })
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))
    return {"n_vecs": n_vecs, "n_clusters": n_clusters}


def generate_events(out_dir: str, n_events: int, n_users: int) -> dict:
    """Distinct-corpus events table, in-distribution with the driver's
    sf0.1 generator (measured: 100k rows, 1500 users, 5 uniform event
    types, ts uniform over 2024-01, value ~ Exp(mean 50) rounded 2dp,
    props = {"k": small int}) — the input the stateful streaming family
    replays. 10x rows AND 10x distinct users, so per-user state growth
    is driven by genuinely new keys, not replayed ones."""
    rng = np.random.default_rng(SEED + 1)
    types = np.array(["click", "error", "purchase", "signup", "view"])
    base_us = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = base_us + rng.integers(0, span_us, n_events)
    events = pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
        "event_type": pa.array(
            [str(t) for t in types[rng.integers(0, 5, n_events)]]),
        "value": pa.array(
            np.round(rng.exponential(50.0, n_events), 2), pa.float64()),
        "props": pa.array(
            [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_events)]),
    })
    pq.write_table(events, os.path.join(out_dir, "events.parquet"))
    return {"n_events": n_events, "n_users": n_users}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    from spark_streaming_testbed_spark.operators.dedup import (
        dedup_clusters,
        duplicate_spans,
        lsh_near_dup_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        simhash,
    )
    from spark_streaming_testbed_spark.operators.prep import (
        embedding_threshold_sweep,
    )
    from spark_streaming_testbed_spark.operators.similarity import (
        ann_ivf_topk,
        cosine_topk,
        hard_negatives,
        knn_label_agreement,
        semantic_dup_pairs,
    )
    from spark_streaming_testbed_spark.session import get_session

    spark = get_session("sf1-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    ops = {
        "ngram_jaccard_pairs": ngram_jaccard_pairs,
        "lsh_near_dup_pairs": lsh_near_dup_pairs,
        "minhash_signatures": minhash_signatures,
        "simhash": simhash,
        "dedup_clusters": dedup_clusters,
        "duplicate_spans": duplicate_spans,
        "knn_label_agreement": knn_label_agreement,
        "cosine_topk": cosine_topk,
        "ann_ivf_topk": ann_ivf_topk,
        # the other Arrow-cosine / IVF-quantizer consumers (post-Arrow
        # rows — VERDICT r7 item 3; the auto n_lists knob confines
        # their within-cluster pair blow-up to sqrt(n)/4-sized lists)
        "semantic_dup_pairs": semantic_dup_pairs,
        "hard_negatives": hard_negatives,
        "embedding_threshold_sweep": embedding_threshold_sweep,
    }
    # ops whose first call per directory pays the one-time IVF
    # fit/calibration cache fill (VERDICT r8 item 3 of "What's wrong":
    # the r8 artifact reported the cache-MISS wall in the ops row and
    # the cache-HIT wall in the recall section without saying which was
    # which) — for these, both walls are measured and labeled, and the
    # ratio uses the steady-state (cache-hot) wall, matching the warm
    # sf0.1 baseline.
    fit_cached_ops = {
        "ann_ivf_topk", "semantic_dup_pairs", "hard_negatives",
        "embedding_threshold_sweep",
    }
    with tempfile.TemporaryDirectory(prefix="sf1_smoke_") as tmp:
        result: dict = {"generated": generate(tmp, n_docs, n_vecs)}
        timings: dict = {}
        for name, fn in ops.items():
            fn(spark, SF01).count()  # warm
            t0 = time.perf_counter()
            base_rows = fn(spark, SF01).count()
            base_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            big_rows = fn(spark, tmp).count()
            big_s = time.perf_counter() - t0
            row = {
                "sf01_s": round(base_s, 2), "sf1_s": round(big_s, 2),
                "ratio": round(big_s / max(base_s, 1e-9), 1),
                "sf01_rows": base_rows, "sf1_rows": big_rows,
            }
            if name in fit_cached_ops:
                # first sf1 call above filled the per-dir fit cache;
                # re-time for the operator's steady-state wall
                t0 = time.perf_counter()
                fn(spark, tmp).count()
                warm_s = time.perf_counter() - t0
                row.update({
                    "sf1_s_fit_cache_miss": row.pop("sf1_s"),
                    "sf1_s": round(warm_s, 2),
                    "ratio": round(warm_s / max(base_s, 1e-9), 1),
                    "cache_note": "sf1_s/ratio are steady-state "
                                  "(fit cache hot, like the warm sf0.1 "
                                  "baseline); _fit_cache_miss adds the "
                                  "one-time per-directory fit",
                })
            timings[name] = row
            print(name, timings[name], flush=True)
        result["ops"] = timings

        # Since VERDICT r6 item 3 the log2(n)-scaled LSH config IS the
        # default above GATE_MAX_VECS (auto: 13 planes + 2 tables at
        # 20k vectors — per-vector candidate budget pinned to the gate
        # config's own ~8). Guards:
        # - wall ratio <= 5 at 10x vectors, on BEST-OF-2 runs at both
        #   scales (single-run ratios mixed 2.2 s and 3.9 s baselines
        #   for identical code — too noisy to gate on);
        # - POOLED agreement delta vs the pinned config <= 50 bp.
        #   Labels are random, so per-label agreement ~ Binomial(n~1e4,
        #   0.1) has sigma ~ 30 bp PER CONFIG and the max-over-10-labels
        #   delta regularly lands 70-160 bp on identical-quality
        #   configs; the pooled rate (n ~ 1e5 edges) has sigma ~ 10 bp,
        #   so 50 bp is a real quality bar, not a noise lottery. The
        #   per-label max stays reported for visibility.
        def best_of_2(fn_dir):
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn_dir()
                runs.append(time.perf_counter() - t0)
            return min(runs)

        base_best = best_of_2(
            lambda: knn_label_agreement(spark, SF01).count())
        sf1_best = best_of_2(
            lambda: knn_label_agreement(spark, tmp).count())
        t0 = time.perf_counter()
        pinned_rows = knn_label_agreement(
            spark, tmp, n_planes=8, n_tables=1).collect()
        pinned_s = time.perf_counter() - t0
        scaled_rows = knn_label_agreement(spark, tmp).collect()
        pinned = {r.label: r.agreement_bp for r in pinned_rows}

        def pooled_bp(rows) -> float:
            return 10000.0 * sum(r.n_agree for r in rows) / max(
                sum(r.n_edges for r in rows), 1)

        pooled_delta = round(
            abs(pooled_bp(scaled_rows) - pooled_bp(pinned_rows)), 1)
        max_delta = max(
            (abs(r.agreement_bp - pinned.get(r.label, 0))
             for r in scaled_rows), default=None)
        knn_ratio = round(sf1_best / max(base_best, 1e-9), 2)
        result["knn_scaled_config"] = {
            "default_config_at_sf1": "auto: n_planes=13 (8192 buckets), "
                                     "n_tables=2 (_auto_lsh_config)",
            "sf01_s_best2": round(base_best, 2),
            "sf1_s_best2": round(sf1_best, 2),
            "wall_ratio_at_10x_vecs": knn_ratio,
            "sf1_s_pinned_8planes_1table": round(pinned_s, 2),
            "agreement_bp_pooled_delta_vs_pinned": pooled_delta,
            "agreement_bp_max_label_delta_vs_pinned": max_delta,
            "guard": "best-of-2 wall ratio <= 5 at 10x vectors AND "
                     "pooled agreement delta <= 50 bp",
            "pass": bool(knn_ratio <= 5 and pooled_delta <= 50),
            "note": (
                "expected candidate pairs: tables*n^2/2^planes — the "
                "plane count is the log2(n) scale knob; the pinned "
                "config stays the default at gate SFs where the static "
                "DuckDB oracle requires it"),
        }
        print("knn_scaled_config", result["knn_scaled_config"], flush=True)

        # recall contracts at sf1 (same guards as tests/test_llm_ops.py)
        exact = {(r.doc_a, r.doc_b)
                 for r in ngram_jaccard_pairs(spark, tmp).collect()}
        lsh = {(r.doc_a, r.doc_b)
               for r in lsh_near_dup_pairs(spark, tmp).collect()}
        result["lsh_recall"] = {
            "exact_pairs": len(exact),
            "lsh_pairs": len(lsh),
            "false_positives": len(lsh - exact),
            "recall": round(len(lsh & exact) / max(len(exact), 1), 4),
            "guard": "subset of exact AND recall >= 0.8",
            "pass": lsh <= exact and (
                not exact or len(lsh & exact) / len(exact) >= 0.8),
        }
        exact_nn = {(r.q_id, r.c_id)
                    for r in cosine_topk(spark, tmp).collect()}
        # the full IVF config is auto-scaled above GATE_MAX_VECS since
        # VERDICT r7 item 1 (n_lists = 4*sqrt(n), nprobe = lists/4,
        # fit = 32/list — Arrow assignment + scoring); the fixed-layout
        # run shows what the r7 default (8 lists, nprobe=4, the
        # constant half-corpus scan) would have scored at this scale
        from spark_streaming_testbed_spark.operators.similarity import (
            _auto_ivf_config,
            _corpus_vec_count,
            _ivf_calibrated_nprobe,
        )

        auto_cfg = _auto_ivf_config(_corpus_vec_count(tmp))
        calibrated = _ivf_calibrated_nprobe(
            spark, tmp, auto_cfg[0], auto_cfg[2])
        # fit + calibration caches are HOT here (filled by the ops row
        # above and the calibration call) — auto_s below is the
        # operator's STEADY-STATE wall, the one number to compare
        # round over round (VERDICT r8 item 4)
        t0 = time.perf_counter()
        ivf = {(r.q_id, r.c_id) for r in ann_ivf_topk(spark, tmp).collect()}
        auto_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        ivf_fixed = {
            (r.q_id, r.c_id)
            for r in ann_ivf_topk(
                spark, tmp, nprobe=4, n_lists=8, fit_sample=256
            ).collect()
        }
        fixed_s = time.perf_counter() - t0
        result["ivf_recall"] = {
            "auto_config_lists_worstcase_nprobe_fit": list(auto_cfg),
            "calibrated_default_nprobe": calibrated,
            "exact_pairs": len(exact_nn),
            "ivf_pairs": len(ivf),
            "recall": round(len(ivf & exact_nn) / max(len(exact_nn), 1), 4),
            "auto_s_steady_state_fit_cache_hot": round(auto_s, 2),
            "recall_fixed_8lists_nprobe4": round(
                len(ivf_fixed & exact_nn) / max(len(exact_nn), 1), 4),
            "fixed_8lists_s": round(fixed_s, 2),
            "guard": ">= 0.7 with the auto 4*sqrt(n)-list config; on "
                     "this structure-free corpus the calibrated nprobe "
                     "must land within 10% of the lists/4 worst-case "
                     "cap (the sample curve may hit the 0.9 target a "
                     "few probes early — same cost/recall behavior; "
                     "VERDICT r8 item 2); the pinned 8/2/256 stays the "
                     "oracle config at gate SFs",
            "pass": bool(
                len(ivf & exact_nn) / max(len(exact_nn), 1) >= 0.7
                and calibrated >= 0.9 * auto_cfg[1]),
        }
        print("ivf_recall", result["ivf_recall"], flush=True)

    # Sub-linearity on CLUSTERED data (the realistic embedding shape):
    # the iid corpus above is the worst case — recall there is tied to
    # the probed fraction no matter the index. Since VERDICT r8 item 2
    # the DEFAULT nprobe is recall-calibrated from the fit sample, so
    # the clustered corpus must land in the sub-linear regime with NO
    # caller knob at all: calibrated nprobe a small constant (probed
    # fraction ~2%), recall >= 0.85 vs exact. The explicit nprobe=8 arm
    # is kept as the round-8 point of comparison.
    with tempfile.TemporaryDirectory(prefix="sf1_clustered_") as tmpc:
        from spark_streaming_testbed_spark.operators.similarity import (
            _ivf_calibrated_nprobe as _calib,
        )

        gen_c = generate_clustered_embeddings(tmpc, n_vecs)
        exact_c = {(r.q_id, r.c_id)
                   for r in cosine_topk(spark, tmpc).collect()}
        cfg_c = _auto_ivf_config(_corpus_vec_count(tmpc))
        ann_ivf_topk(spark, tmpc, nprobe=8).count()  # warm + fit cache
        t0 = time.perf_counter()
        ivf8 = {(r.q_id, r.c_id)
                for r in ann_ivf_topk(spark, tmpc, nprobe=8).collect()}
        s8 = time.perf_counter() - t0
        calibrated_c = _calib(spark, tmpc, cfg_c[0], cfg_c[2])
        t0 = time.perf_counter()
        ivf_auto_c = {(r.q_id, r.c_id)
                      for r in ann_ivf_topk(spark, tmpc).collect()}
        s_auto = time.perf_counter() - t0
        rec8 = round(len(ivf8 & exact_c) / max(len(exact_c), 1), 4)
        rec_auto = len(ivf_auto_c & exact_c) / max(len(exact_c), 1)
        result["ivf_clustered"] = {
            "generated": gen_c,
            "n_lists": cfg_c[0],
            "calibrated_default_nprobe": calibrated_c,
            "probed_fraction_default": round(calibrated_c / cfg_c[0], 4),
            "recall_default": round(rec_auto, 4),
            "default_s_steady_state_fit_cache_hot": round(s_auto, 2),
            "recall_nprobe8": rec8,
            "nprobe8_s": round(s8, 2),
            "guard": "DEFAULT (calibrated) nprobe <= 8 of 4*sqrt(n) "
                     "lists (~2% probed) AND default recall >= 0.85 on "
                     "the 50-cluster corpus — sub-linear probing BY "
                     "DEFAULT where structure exists; the "
                     "structure-free corpus above is the worst case",
            "pass": bool(calibrated_c <= 8 and rec_auto >= 0.85),
        }
        print("ivf_clustered", result["ivf_clustered"], flush=True)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
