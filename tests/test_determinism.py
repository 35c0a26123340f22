"""Determinism audit: contract queries must return identical results on
repeated execution in one session (catches unstable dedup picks,
nondeterministic limits, uncached randomness)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

SAMPLE = [
    "dedup_first",        # row_number pick must be fully keyed
    "tpch_q3",            # limit with ordered ties
    "topk_per_group",
    "minhash_signatures",
    "ann_lsh_topk",       # seeded hyperplanes
    "lsh_near_dup_pairs",
    "profile_fixed_ramp",
    "multimodal_features",
    "ann_ivf_topk",        # deterministic Lloyd fit
    "semantic_dup_pairs",  # cluster-local pairs off the same fit
    "skew_salted_join",    # salt is hash-derived, not random
    "bucketed_join_stats", # bucketed table rewrite must be idempotent
    "knn_graph",           # LSH self-join off seeded plane literals
    "snm_candidate_pairs", # two-phase rank must be fully keyed
    "pmi_collocations",    # top-k cut on quantized lift
    "bm25_retrieval",      # top-k cut on quantized score
    "ts_similarity_pairs", # signature blocking + integer stats
    "triangle_count",      # checkpointed lineage must not drift
]


@pytest.mark.parametrize("name", SAMPLE)
def test_query_is_deterministic(spark, name):
    fn = entrymod.queries()[name]
    a = sorted(tuple(r) for r in fn(spark, SF_SMOKE).collect())
    b = sorted(tuple(r) for r in fn(spark, SF_SMOKE).collect())
    assert a == b
