"""Mergeable-summary sketch operators: Misra-Gries heavy hitters and a
Bloom-filter-prefiltered decontamination pass.

Both follow the two-phase "sketch then confirm exactly" shape that makes
approximate structures safe at 100 TB: phase 1 builds a small mergeable
summary per partition (bounded memory, no shuffle of raw data), phase 2
re-scans once to compute EXACT answers for the tiny candidate set the
sketch surfaced. Because Misra-Gries has no false negatives above the
frequency threshold and Bloom filters have no false negatives at all,
the final output is exactly the answer a full exact computation would
give — which is why both operators carry a plain-SQL DuckDB oracle.

References (public): Misra & Gries 1982 "Finding repeated elements";
Agarwal et al. 2012 "Mergeable summaries" (the summary-merge rule used
per batch); Bloom 1970; GPT-3 appendix C / PaLM app. for the 13-gram
decontamination convention.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from .text import MD5H_SQL_TEMPLATE, TOKENS_SQL, with_grams, with_tokens

#: heavy-hitter support threshold: report tokens with count > N / HH_K
HH_K = 200
#: per-partition Misra-Gries counter budget. Any token with global count
#: > N / MG_COUNTERS survives the merged summaries (error <= N/k); with
#: MG_COUNTERS == HH_K the candidate set provably contains every reported
#: heavy hitter, so phase 2's exact confirm makes the output exact.
MG_COUNTERS = HH_K

#: decontamination n-gram length (the published GPT-3/PaLM convention)
DECONTAM_N = 13
#: Bloom sizing: bits per element ~ 10 gives ~1% false positives — the
#: exact confirm join only pays for that 1%.
BLOOM_BITS_PER_ELEM = 10
BLOOM_NUM_HASHES = 7


# ---------------------------------------------------------------------------
# Heavy hitters: per-partition Misra-Gries summaries, exact confirm pass
# ---------------------------------------------------------------------------

def _mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Misra-Gries summary of one partition's ``token`` stream.

    Processes each Arrow batch vectorized (``value_counts`` then a dict
    merge) and trims with the mergeable-summaries rule: when the counter
    table exceeds k entries, subtract the (k+1)-th largest weight from
    every counter and drop the non-positive ones. Total undercount per
    partition is <= n_p / (k+1), so summed over partitions the global
    undercount is < N / k — no false negatives above the N/k threshold.

    Emits (token, est) rows plus one (NULL, n_p) row carrying the exact
    partition cardinality, so phase 2 gets N for free (no extra scan).
    """
    counters: dict[str, int] = {}
    n_p = 0
    for pdf in batches:
        vc = pdf["token"].value_counts()
        n_p += int(vc.sum())
        for tok, c in vc.items():
            counters[tok] = counters.get(tok, 0) + int(c)
        if len(counters) > MG_COUNTERS:
            cut = sorted(counters.values(), reverse=True)[MG_COUNTERS]
            counters = {t: c - cut for t, c in counters.items() if c > cut}
    yield pd.DataFrame(
        {
            "token": list(counters) + [None],
            "est": list(counters.values()) + [n_p],
        }
    )


def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-level heavy-hitter tokens (count > N / HH_K) found by
    the classic two-pass distributed Misra-Gries algorithm.

    Scale shape: pass 1 streams every partition once through a k-counter
    MG summary (bounded memory, mapInPandas, NO shuffle of tokens — the
    only shuffle is the tiny per-partition summaries, <= k+1 rows each).
    Pass 2 re-scans with a broadcast hash semi-join against the candidate
    set (a few hundred tokens) and aggregates exact counts. At 100 TB the
    raw token stream never shuffles; the exact groupBy only ever sees
    rows matching the ~k candidates. The oracle is the direct exact SQL —
    MG's no-false-negative guarantee makes the two answers identical.
    """
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    tokens = docs.select(F.explode("tokens").alias("token"))
    summaries = tokens.mapInPandas(
        _mg_partition, schema="token string, est long"
    )
    # one tiny aggregate: candidates + exact N in a single pass over the
    # (<= partitions * (k+1))-row summary frame
    summ = summaries.groupBy("token").agg(F.sum("est").alias("est"))
    total = summ.where(F.col("token").isNull()).select(
        F.col("est").alias("n_total")
    )
    candidates = summ.where(F.col("token").isNotNull()).select("token")
    return (
        tokens.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * HH_K > F.col("n_total"))
        .select("token", "cnt", "n_total")
        .orderBy(F.col("cnt").desc(), "token")
    )


HEAVY_HITTERS_ORACLE = f"""
WITH toks AS (
  SELECT unnest({TOKENS_SQL}) AS token FROM documents),
tot AS (SELECT count(*) AS n_total FROM toks)
SELECT token, count(*) AS cnt, n_total
FROM toks, tot
GROUP BY token, n_total
HAVING count(*) * {HH_K} > n_total
ORDER BY cnt DESC, token
"""


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination: 13-gram exact-match, sketch-pruned
# ---------------------------------------------------------------------------

def _grams13_sql() -> str:
    n = DECONTAM_N
    return (
        f"CASE WHEN len(tokens) >= {n} THEN "
        f"list_transform(range(1, len(tokens) - {n} + 2), "
        f"i -> array_to_string(tokens[i:i+{n - 1}], ' ')) "
        "ELSE [] END"
    )


def _bloom_build(hashes):
    """Pack int64 hashes into a (bits, m_bits) Bloom filter via double
    hashing (Kirsch & Mitzenmacher 2006: g_i = h1 + i*h2 mod m)."""
    import numpy as np

    m_bits = max(64, int(len(hashes)) * BLOOM_BITS_PER_ELEM)
    bits = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    h1 = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
    h2 = (h1 >> np.uint64(33)) | np.uint64(1)
    for i in range(BLOOM_NUM_HASHES):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        # unbuffered accumulate: plain bits[w] |= v drops all but one
        # update when two hash positions land in the same 64-bit word
        np.bitwise_or.at(
            bits,
            idx >> np.uint64(6),
            np.uint64(1) << (idx & np.uint64(63)),
        )
    return bits, m_bits


def _bloom_probe(bits, m_bits, hashes):
    """Vectorized membership mask for int64 hashes against a built filter."""
    import numpy as np

    hv = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
    g2 = (hv >> np.uint64(33)) | np.uint64(1)
    keep = np.ones(len(hv), dtype=bool)
    for i in range(BLOOM_NUM_HASHES):
        idx = (hv + np.uint64(i) * g2) % np.uint64(m_bits)
        word = bits[idx >> np.uint64(6)]
        keep &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
    return keep


def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """13-gram exact-match decontamination (the GPT-3/PaLM convention)
    with a broadcast Bloom-filter prefilter: training docs (doc_id >=
    20) that share any 13-gram with the benchmark proxy set (doc_id <
    20), with the exact distinct-13-gram hit count per doc.

    Scale shape: the benchmark 13-gram hashes are collected once (the
    benchmark side is small by construction — eval sets are MBs, not
    TBs), packed into a ~10-bits/elem Bloom bit array, and broadcast to
    every executor as plain bytes. The corpus side streams its exploded
    13-grams through a vectorized numpy membership test (mapInPandas) —
    ~99% of grams die executor-side WITHOUT shuffling, so the exact
    confirm join (broadcast, against the true hash set) only pays for
    Bloom's ~1% false positives plus the true hits. Bloom has no false
    negatives, so the confirmed output is exact and the plain-SQL oracle
    matches. At 100 TB this is the only decontamination shape that
    works: the corpus never shuffles, and per-executor state is a few MB
    of bits.
    """
    import numpy as np

    docs = with_grams(
        with_tokens(load_table(spark, sf_dir, "documents")),
        DECONTAM_N,
        "grams",
    )
    grams = docs.where(F.size("grams") > 0).select(
        "doc_id", F.explode("grams").alias("g")
    ).select("doc_id", F.xxhash64("g").alias("h"))

    bench_hashes = np.array(
        [
            r.h
            for r in grams.where(F.col("doc_id") < 20)
            .select("h")
            .distinct()
            .collect()
        ],
        dtype=np.int64,
    )
    bc = spark.sparkContext.broadcast(_bloom_build(bench_hashes))

    def _bloom_filter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        barr, m = bc.value
        for pdf in batches:
            keep = _bloom_probe(barr, m, pdf["h"].to_numpy(dtype=np.int64))
            if keep.any():
                yield pdf[keep]

    corpus = grams.where(F.col("doc_id") >= 20)
    maybe = corpus.mapInPandas(_bloom_filter, schema="doc_id long, h long")
    bench_exact = (
        grams.where(F.col("doc_id") < 20).select("h").distinct()
    )
    return (
        maybe.join(F.broadcast(bench_exact), "h")
        .groupBy("doc_id")
        .agg(F.countDistinct("h").alias("n_13gram_hits"))
        .select("doc_id", "n_13gram_hits")
        .orderBy("doc_id")
    )


BLOOM_DECONTAMINATE_ORACLE = f"""
WITH tok AS (SELECT doc_id, {TOKENS_SQL} AS tokens FROM documents),
g AS (SELECT doc_id, unnest({_grams13_sql()}) AS s FROM tok),
bench AS (SELECT DISTINCT s FROM g WHERE doc_id < 20)
SELECT doc_id, count(DISTINCT s) AS n_13gram_hits
FROM g JOIN bench USING (s)
WHERE doc_id >= 20
GROUP BY doc_id ORDER BY doc_id
"""


SKETCH_QUERIES = {
    "heavy_hitters": heavy_hitters,
    "bloom_decontaminate": bloom_decontaminate,
}

SKETCH_ORACLES = {
    "heavy_hitters": HEAVY_HITTERS_ORACLE,
    "bloom_decontaminate": BLOOM_DECONTAMINATE_ORACLE,
}


# ---------------------------------------------------------------------------
# Count-min sketch: frequency estimates with a provable overcount
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_REPORT_K = 10


def cms_frequency_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over event user
    ids: d=4 rows of w=256 counters, each row keyed by an independent
    md5-derived hash; a key's estimate is the MIN over its d counters —
    never an undercount. Reports estimate vs truth for the top-10 users,
    the sketch-accuracy evidence for fixed-memory frequency counting at
    stream scale.

    Scale shape: the sketch build is ONE aggregate over (row, bucket) —
    4 x 256 cells regardless of cardinality (broadcastable); truth for
    the bounded report set is one user-keyed aggregate + top-k cut.
    Determinism: the hash family is the portable md5 template, identical
    in both engines."""
    from pyspark.sql.window import Window as W

    from ..session import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id")

    def bucket(j: int, dialect: str) -> str:
        if dialect == "spark":
            h = (
                "cast(conv(substring(md5(concat(cast(user_id as string), "
                f"'|{j}')), 1, 15), 16, 10) as bigint)"
            )
        else:
            h = MD5H_SQL_TEMPLATE.format(
                expr=f"user_id::VARCHAR || '|{j}'"
            )
        return f"({h}) % {CMS_WIDTH}"

    cells = ev.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("row"),
                    F.expr(bucket(j, "spark")).alias("bucket"),
                )
                for j in range(CMS_DEPTH)
            ])
        ).alias("c")
    ).select("c.row", "c.bucket")
    sketch = cells.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    truth = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), F.col("user_id").asc())
        .limit(CMS_REPORT_K)
    )
    probes = truth.select(
        "user_id", "true_cnt",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("row"),
                    F.expr(bucket(j, "spark")).alias("bucket"),
                )
                for j in range(CMS_DEPTH)
            ])
        ).alias("c"),
    ).select("user_id", "true_cnt", "c.row", "c.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
        .select(
            "user_id", "true_cnt", "est_cnt",
            (F.col("est_cnt") - F.col("true_cnt")).alias("overcount"),
        )
        .orderBy(F.col("true_cnt").desc(), F.col("user_id").asc())
    )


def _cms_oracle() -> str:
    def bucket(j: int) -> str:
        h = MD5H_SQL_TEMPLATE.format(expr=f"user_id::VARCHAR || '|{j}'")
        return f"({h}) % {CMS_WIDTH}"

    cell_selects = "\n  UNION ALL ".join(
        f"SELECT {j} AS row, {bucket(j)} AS bucket FROM events"
        for j in range(CMS_DEPTH)
    )
    probe_selects = "\n  UNION ALL ".join(
        f"SELECT user_id, true_cnt, {j} AS row, {bucket(j)} AS bucket "
        "FROM truth"
        for j in range(CMS_DEPTH)
    )
    return f"""
WITH cells AS (
  {cell_selects}),
sketch AS (
  SELECT row, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2),
truth AS (
  SELECT user_id, count(*) AS true_cnt FROM events GROUP BY user_id
  ORDER BY true_cnt DESC, user_id LIMIT {CMS_REPORT_K}),
probes AS (
  {probe_selects})
SELECT p.user_id,
       CAST(p.true_cnt AS BIGINT) AS true_cnt,
       CAST(min(s.cnt) AS BIGINT) AS est_cnt,
       CAST(min(s.cnt) AS BIGINT) - CAST(p.true_cnt AS BIGINT)
         AS overcount
FROM probes p JOIN sketch s USING (row, bucket)
GROUP BY p.user_id, p.true_cnt
ORDER BY true_cnt DESC, user_id
"""


CMS_FREQUENCY_ESTIMATES_ORACLE = _cms_oracle()

SKETCH_QUERIES["cms_frequency_estimates"] = cms_frequency_estimates
SKETCH_ORACLES["cms_frequency_estimates"] = CMS_FREQUENCY_ESTIMATES_ORACLE
