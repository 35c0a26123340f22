"""Algorithm-level invariants for the sketch operators (sketches.py).

The registry-wide oracle parity test already proves end-to-end
equality with DuckDB; these tests pin the *guarantees* the two-phase
designs rely on: Misra-Gries never loses an above-threshold item, and
the Bloom filter never rejects a member.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from spark_streaming_testbed_spark.operators.sketches import (
    HH_K,
    _bloom_build,
    _bloom_probe,
    _mg_partition,
    heavy_hitters,
)
from spark_streaming_testbed_spark.operators.text import with_tokens
from spark_streaming_testbed_spark.session import load_table
from tests.conftest import SF_SMOKE


def _mg_summary(tokens: list[str], batch: int = 97) -> dict[str, int]:
    batches = (
        pd.DataFrame({"token": tokens[i : i + batch]})
        for i in range(0, len(tokens), batch)
    )
    out = next(_mg_partition(batches))
    return {
        t: int(e)
        for t, e in zip(out["token"], out["est"])
        if t is not None
    }


def test_mg_no_false_negatives_on_zipf_stream():
    # Zipf-ish adversarial stream: token i appears ~N/(i+1) times,
    # shuffled deterministically so heavy items interleave with tail
    rng = np.random.RandomState(7)
    tokens: list[str] = []
    for i in range(2000):
        tokens += [f"t{i}"] * max(1, 4000 // (i + 1))
    order = rng.permutation(len(tokens))
    tokens = [tokens[i] for i in order]
    n = len(tokens)
    exact = pd.Series(tokens).value_counts()
    summary = _mg_summary(tokens)
    # guarantee: every token with count > n / HH_K survives the summary
    for tok, cnt in exact.items():
        if cnt * HH_K > n:
            assert tok in summary, f"{tok} (count {cnt}) lost by MG"
    # and the summary stays within its counter budget (plus merge slack)
    assert len(summary) <= 2 * HH_K


def test_mg_partition_total_row_is_exact():
    tokens = ["a"] * 10 + ["b"] * 5 + ["c"]
    batches = iter([pd.DataFrame({"token": tokens})])
    out = next(_mg_partition(batches))
    total = out[out["token"].isna()]["est"]
    assert len(total) == 1 and int(total.iloc[0]) == 16


def test_bloom_has_no_false_negatives_and_few_false_positives():
    rng = np.random.RandomState(11)
    members = rng.randint(-(2**62), 2**62, size=5000, dtype=np.int64)
    others = rng.randint(-(2**62), 2**62, size=20000, dtype=np.int64)
    others = others[~np.isin(others, members)]
    bits, m = _bloom_build(members)
    assert _bloom_probe(bits, m, members).all(), "bloom false negative"
    fp = _bloom_probe(bits, m, others).mean()
    assert fp < 0.05, f"false-positive rate {fp:.3f} too high for 10 b/elem"


def test_heavy_hitters_matches_direct_exact(spark):
    got = {
        (r.token, r.cnt)
        for r in heavy_hitters(spark, SF_SMOKE).collect()
    }
    toks = with_tokens(load_table(spark, SF_SMOKE, "documents")).select(
        F.explode("tokens").alias("token")
    )
    n = toks.count()
    exact = {
        (r.token, r.cnt)
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * HH_K > n)
        .collect()
    }
    assert got == exact and len(got) > 0


def test_streaming_heavy_hitters_equals_batch(spark):
    """batch==stream: the stateful MG sketch + exact confirm must land
    on exactly the batch two-pass answer."""
    from spark_streaming_testbed_spark.streaming.stateful import (
        streaming_heavy_hitters,
    )

    got = {
        (r.token, r.cnt, r.n_total)
        for r in streaming_heavy_hitters(spark, SF_SMOKE).collect()
    }
    want = {
        (r.token, r.cnt, r.n_total)
        for r in heavy_hitters(spark, SF_SMOKE).collect()
    }
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# Property tests (hypothesis): the math the two-phase designs lean on
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=2000),
    st.integers(1, 500),
)
def test_mg_property_no_false_negatives(ids, batch):
    """For ANY stream and ANY batch split, every token above the N/k
    threshold survives the Misra-Gries summary."""
    tokens = [f"t{i}" for i in ids]
    n = len(tokens)
    summary = _mg_summary(tokens, batch=batch)
    exact = pd.Series(tokens).value_counts()
    for tok, cnt in exact.items():
        if cnt * HH_K > n:
            assert tok in summary


@settings(max_examples=20, deadline=None)
@given(st.sets(st.integers(-(2**62), 2**62), min_size=1, max_size=3000))
def test_bloom_property_members_always_hit(members):
    arr = np.array(sorted(members), dtype=np.int64)
    bits, m = _bloom_build(arr)
    assert _bloom_probe(bits, m, arr).all()


def _qgram_bag(s: str, q: int = 3):
    from collections import Counter

    return Counter(s[i : i + q] for i in range(len(s) - q + 1))


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_qgram_count_filter_bound_property(data):
    """Gravano et al. count filter: <= D edits on an L-char string can
    destroy at most q*D of the q-gram bag overlap — the soundness bound
    edit_distance_pairs' blocking relies on."""
    import random as _random

    L, Q, D = 80, 3, 8
    rng = _random.Random(data.draw(st.integers(0, 2**31)))
    alpha = "abcdefgh"
    s = "".join(rng.choice(alpha) for _ in range(L))
    t = list(s)
    n_edits = data.draw(st.integers(0, D))
    for _ in range(n_edits):
        op = rng.choice(("sub", "ins", "del"))
        if op == "sub" and t:
            t[rng.randrange(len(t))] = rng.choice(alpha)
        elif op == "ins":
            t.insert(rng.randrange(len(t) + 1), rng.choice(alpha))
        elif t:
            del t[rng.randrange(len(t))]
    t2 = ("".join(t))[:L].ljust(L, "x")  # refit to exactly L chars
    # refit adds bounded extra edits; recompute the true distance bound
    # via the actual bag overlap claim: overlap >= L - Q + 1 - Q * lev
    import numpy as _np

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    d = lev(s, t2)
    ba, bb = _qgram_bag(s), _qgram_bag(t2)
    shared = sum(min(c, bb.get(g, 0)) for g, c in ba.items())
    assert shared >= (L - Q + 1) - Q * d


# --- round-5: portable HLL / KMV / bloom-join prefilter -----------------


def test_hll_estimate_within_theory_bounds(spark):
    from spark_streaming_testbed_spark.operators.sketches import (
        HLL_M,
        hll_shingle_estimate,
    )

    rows = hll_shingle_estimate(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    for r in rows:
        # ~20 keys/register at smoke scale: raw regime, no empty cells
        assert r.zero_registers == 0
        assert r.hll_est > 0
        assert r.err_bp == abs(r.hll_est - r.n_exact) * 10000 // r.n_exact
        # 1.04/sqrt(m) relative stderr; allow 4 sigma
        assert r.err_bp <= int(4 * 1.04 / (HLL_M ** 0.5) * 10000)


def test_kmv_estimate_within_theory_bounds(spark):
    from spark_streaming_testbed_spark.operators.sketches import (
        KMV_K,
        kmv_shingle_estimate,
    )

    rows = kmv_shingle_estimate(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.n_exact >= KMV_K
        # ~1/sqrt(k-2) relative stderr; allow 4 sigma
        assert r.err_bp <= int(4 / ((KMV_K - 2) ** 0.5) * 10000)


def test_bloom_join_has_no_false_negatives(spark):
    from spark_streaming_testbed_spark.operators.sketches import (
        bloom_join_prefilter,
    )

    rows = bloom_join_prefilter(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # Bloom one-sided error: every member passes, so the pass set
        # is exactly the members plus the false positives
        assert r.true_match <= r.bloom_pass <= r.n_orders
        assert r.false_pos == r.bloom_pass - r.true_match
        # and the filter is actually filtering (not saturated)
        assert r.bloom_pass < r.n_orders
