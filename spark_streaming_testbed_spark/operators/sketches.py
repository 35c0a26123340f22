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

def _grams_sql(n: int) -> str:
    """DuckDB word-n-gram expression over a ``tokens`` list column,
    matching ``with_grams`` (space-joined, duplicates kept)."""
    return (
        f"CASE WHEN len(tokens) >= {n} THEN "
        f"list_transform(range(1, len(tokens) - {n} + 2), "
        f"i -> array_to_string(tokens[i:i+{n - 1}], ' ')) "
        "ELSE [] END"
    )


def _grams13_sql() -> str:
    return _grams_sql(DECONTAM_N)


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


# ---------------------------------------------------------------------------
# Portable HyperLogLog: distinct-shingle estimates with an exact oracle twin
# ---------------------------------------------------------------------------

#: HLL precision: p=6 -> m=64 registers. At ~1.2k distinct shingles per
#: source that is ~20 keys/register — squarely in the raw-estimator
#: regime (P(empty register) ~ e^-20), so no linear-counting branch is
#: needed and the raw formula is reported as-is with the empty-register
#: count alongside for honesty.
HLL_P = 6
HLL_M = 1 << HLL_P
#: alpha_64 = 0.7213 / (1 + 1.079/m) (Flajolet et al. 2007, fig. 3),
#: embedded as an integer ppm literal so both engines compute with the
#: IDENTICAL constant and never evaluate the formula themselves.
HLL_ALPHA_PPM = round(0.7213 / (1 + 1.079 / HLL_M) * 1_000_000)
#: alpha * m^2 in ppm — ~2.9e9, exactly representable in a double.
_HLL_ALPHA_M2 = HLL_ALPHA_PPM * HLL_M * HLL_M
#: shingle width shared by the HLL and KMV estimators
SKETCH_SHINGLE_N = 5
#: the 60-bit md5 hash splits into p index bits (mod) and 60-p suffix
#: bits; rho of an all-zero suffix is (60-p)+1.
_HLL_RHO_MAX = 60 - HLL_P + 1

_SPARK_MD5H = "cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def hll_shingle_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch HyperLogLog (Flajolet-Fuso-Gandouet-Meunier 2007)
    estimate of distinct 5-gram shingles per document source, reported
    against the exact distinct count.

    Unlike ``approx_distinct_users``/``hll_user_overlap`` (Spark's
    native Datasketches HLL, estimate bounded by a tolerance flag), this
    one is built from portable SQL primitives — md5 hash, bin() bit
    length, shifts — so the DuckDB oracle recomputes the IDENTICAL
    sketch and the estimate itself hash-matches. The raw-estimator
    arithmetic stays deterministic across engines: the only float ops
    are one multiply by an exact power of two, one multiply, and one
    divide — all IEEE-754 correctly rounded, no transcendentals (alpha
    is an integer ppm literal; 2^R comes from an integer shift).

    Scale shape: register build is ONE map-side-combinable aggregate to
    (source x 64) cells — the classical mergeable sketch, constant
    memory per source regardless of corpus size; at 100 TB only the
    64-row-per-source register tables shuffle, never the shingles. The
    exact count rides along for the accuracy report (at production
    scale you would drop it — it is the expensive side)."""
    from pyspark.sql.window import Window as W

    docs = with_grams(
        with_tokens(load_table(spark, sf_dir, "documents")),
        SKETCH_SHINGLE_N,
        "grams",
    )
    grams = (
        docs.where(F.size("grams") > 0)
        .select("source", F.explode("grams").alias("g"))
        .select(
            "source", F.expr(_SPARK_MD5H.format(expr="g")).alias("h")
        )
    )
    obs = (
        grams.select(
            "source",
            (F.col("h") % HLL_M).cast("int").alias("j"),
            F.expr(f"h div {HLL_M}").alias("w"),
        )
        .select(
            "source",
            "j",
            F.expr(
                f"cast(case when w = 0 then {_HLL_RHO_MAX} "
                f"else {_HLL_RHO_MAX} - length(bin(w)) end as int)"
            ).alias("rho"),
        )
        .groupBy("source", "j")
        .agg(F.max("rho").alias("m_obs"))
    )
    # full register spine so empty registers contribute 2^0 exactly as
    # the published estimator requires
    spine = grams.select("source").distinct().crossJoin(
        spark.range(HLL_M).select(F.col("id").cast("int").alias("j"))
    )
    regs = (
        spine.join(obs, ["source", "j"], "left")
        .select("source", F.coalesce("m_obs", F.lit(0)).alias("m"))
        .withColumn("r", F.max("m").over(W.partitionBy("source")))
    )
    per_src = regs.groupBy("source").agg(
        F.max("m").alias("r_max"),
        # sum of 2^(R - M_j): integer-exact (<= 64 * 2^55 < 2^62)
        F.sum(F.expr("shiftleft(1L, r - m)")).alias("s"),
        F.sum(F.expr("case when m = 0 then 1 else 0 end")).alias(
            "zero_registers"
        ),
    )
    exact = grams.groupBy("source").agg(
        F.countDistinct("h").alias("n_exact")
    )
    return (
        per_src.join(exact, "source")
        .select(
            "source",
            "n_exact",
            F.expr(
                f"cast(floor(({_HLL_ALPHA_M2} * "
                "cast(shiftleft(1L, r_max) as double)) "
                "/ (1000000.0 * s)) as bigint)"
            ).alias("hll_est"),
            "zero_registers",
        )
        .withColumn(
            "err_bp", F.expr("abs(hll_est - n_exact) * 10000 div n_exact")
        )
        .select("source", "n_exact", "hll_est", "err_bp", "zero_registers")
        .orderBy("source")
    )


def _hll_oracle() -> str:
    md5h = MD5H_SQL_TEMPLATE.format(expr="g")
    return f"""
WITH tok AS (SELECT source, {TOKENS_SQL} AS tokens FROM documents),
g AS (SELECT source, unnest({_grams_sql(SKETCH_SHINGLE_N)}) AS g FROM tok),
h AS (SELECT source, {md5h} AS h FROM g),
obs AS (
  SELECT source, h % {HLL_M} AS j,
         max(CASE WHEN h // {HLL_M} = 0 THEN {_HLL_RHO_MAX}
             ELSE {_HLL_RHO_MAX} - length(bin(h // {HLL_M})) END) AS m_obs
  FROM h GROUP BY 1, 2),
spine AS (
  SELECT s.source, r.j
  FROM (SELECT DISTINCT source FROM h) s
  CROSS JOIN (SELECT unnest(range(0, {HLL_M})) AS j) r),
regs AS (
  SELECT spine.source, coalesce(obs.m_obs, 0) AS m
  FROM spine LEFT JOIN obs
    ON spine.source = obs.source AND spine.j = obs.j),
win AS (
  SELECT source, m, max(m) OVER (PARTITION BY source) AS r FROM regs),
per AS (
  SELECT source, max(m) AS r_max,
         CAST(sum(1::BIGINT << (r - m)) AS BIGINT) AS s,
         CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS zero_registers
  FROM win GROUP BY source),
exact AS (
  SELECT source, count(DISTINCT h) AS n_exact FROM h GROUP BY source),
est AS (
  SELECT p.source, e.n_exact,
         CAST(floor(({_HLL_ALPHA_M2} * ((1::BIGINT << p.r_max)::DOUBLE))
              / (1000000.0 * p.s)) AS BIGINT) AS hll_est,
         p.zero_registers
  FROM per p JOIN exact e ON p.source = e.source)
SELECT source, n_exact, hll_est,
       abs(hll_est - n_exact) * 10000 // n_exact AS err_bp,
       zero_registers
FROM est ORDER BY source
"""


HLL_SHINGLE_ESTIMATE_ORACLE = _hll_oracle()


# ---------------------------------------------------------------------------
# KMV (bottom-k) distinct estimator: the order-statistics twin of HLL
# ---------------------------------------------------------------------------

#: bottom-k size; every source carries >= 1k distinct shingles so the
#: k-th order statistic always exists
KMV_K = 128
#: (k-1) * 2^60 as the nearest double, embedded as the SAME literal in
#: both engines — one IEEE divide by the k-th hash gives the estimate.
_KMV_NUM = repr(float((KMV_K - 1) * (1 << 60)))


def kmv_shingle_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct estimator (Bar-Yossef et al. 2002;
    Beyer et al. 2007 unbiased form (k-1)/t_k) for 5-gram shingles per
    source, against the exact distinct count.

    The k smallest hashes of a set are a mergeable summary (union =
    merge + re-truncate), which is what makes bottom-k sketches work
    across 1000 executors: each partition keeps its k smallest, the
    merge touches k rows per partition. Here the k-th order statistic
    comes from a per-source window rank over DISTINCT hashes — the
    sort is per-source over ~1k rows, and the estimate is ONE IEEE
    divide of identical literals, so the DuckDB twin hash-matches."""
    from pyspark.sql.window import Window as W

    docs = with_grams(
        with_tokens(load_table(spark, sf_dir, "documents")),
        SKETCH_SHINGLE_N,
        "grams",
    )
    dist = (
        docs.where(F.size("grams") > 0)
        .select("source", F.explode("grams").alias("g"))
        .select(
            "source", F.expr(_SPARK_MD5H.format(expr="g")).alias("h")
        )
        .distinct()
    )
    kth = (
        dist.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("source").orderBy("h")),
        )
        .where(F.col("rn") == KMV_K)
        .select("source", F.col("h").alias("h_k"))
    )
    exact = dist.groupBy("source").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        exact.join(kth, "source")
        .select(
            "source",
            "n_exact",
            F.expr(
                f"cast(floor({_KMV_NUM} / cast(h_k as double)) as bigint)"
            ).alias("kmv_est"),
        )
        .withColumn(
            "err_bp", F.expr("abs(kmv_est - n_exact) * 10000 div n_exact")
        )
        .orderBy("source")
    )


def _kmv_oracle() -> str:
    md5h = MD5H_SQL_TEMPLATE.format(expr="g")
    return f"""
WITH tok AS (SELECT source, {TOKENS_SQL} AS tokens FROM documents),
g AS (SELECT source, unnest({_grams_sql(SKETCH_SHINGLE_N)}) AS g FROM tok),
dist AS (SELECT DISTINCT source, {md5h} AS h FROM g),
kth AS (
  SELECT source, h AS h_k FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM dist) WHERE rn = {KMV_K}),
exact AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_exact
  FROM dist GROUP BY source),
est AS (
  SELECT e.source, e.n_exact,
         CAST(floor({_KMV_NUM} / h_k::DOUBLE) AS BIGINT) AS kmv_est
  FROM exact e JOIN kth k ON e.source = k.source)
SELECT source, n_exact, kmv_est,
       abs(kmv_est - n_exact) * 10000 // n_exact AS err_bp
FROM est ORDER BY source
"""


KMV_SHINGLE_ESTIMATE_ORACLE = _kmv_oracle()


# ---------------------------------------------------------------------------
# Bloom-prefiltered join: runtime-filter audit with exact FP accounting
# ---------------------------------------------------------------------------

BLOOM_JOIN_BITS = 4096
BLOOM_JOIN_HASHES = 6
BLOOM_JOIN_SEGMENT = "BUILDING"


def _bjoin_pos(key_expr: str, j: int, dialect: str) -> str:
    if dialect == "spark":
        h = _SPARK_MD5H.format(
            expr=f"concat(cast({key_expr} as string), '|{j}')"
        )
    else:
        h = MD5H_SQL_TEMPLATE.format(expr=f"{key_expr}::VARCHAR || '|{j}'")
    return f"({h}) % {BLOOM_JOIN_BITS}"


def bloom_join_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter audit: a Bloom filter built from the filtered
    dimension side (customers in the BUILDING segment) pre-filters the
    fact side (orders) before the real join — the semi-join-reduction
    pattern Spark's own runtime row-group filters and Bloom-join
    optimizations implement. Reports, per order priority: probe rows,
    Bloom passes, true matches, and false positives — the exact cost of
    the sketch's one-sided error.

    The bit array is kept as a DISTINCT-positions relation (built with
    the portable md5 double-hash family) rather than opaque packed
    bytes, so the DuckDB oracle reconstructs the identical filter and
    the pass/FP accounting hash-matches. Scale shape: positions and the
    per-custkey verdicts are broadcast (bounded by the filtered dim and
    the distinct-key count); the fact table never shuffles — exactly
    why runtime filters matter at 100 TB: ~99% of probe rows die before
    the shuffle join would have paid for them."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    build = cust.where(
        F.col("c_mktsegment") == BLOOM_JOIN_SEGMENT
    ).select(F.col("c_custkey").alias("k"))
    build_pos = build.select(
        F.explode(
            F.array(
                *[
                    F.expr(_bjoin_pos("k", j, "spark"))
                    for j in range(BLOOM_JOIN_HASHES)
                ]
            )
        ).alias("pos")
    ).distinct()
    probe = orders.select(F.col("o_custkey").alias("k")).distinct()
    probe_pos = probe.select(
        "k",
        F.explode(
            F.array(
                *[
                    F.expr(_bjoin_pos("k", j, "spark"))
                    for j in range(BLOOM_JOIN_HASHES)
                ]
            )
        ).alias("pos"),
    )
    flags = (
        probe_pos.join(
            F.broadcast(build_pos.withColumn("hit", F.lit(1))),
            "pos",
            "left",
        )
        .groupBy("k")
        .agg(F.min(F.coalesce("hit", F.lit(0))).alias("pass_all"))
    )
    keyed = (
        flags.join(
            F.broadcast(build.withColumn("is_member", F.lit(1))),
            "k",
            "left",
        )
        .select(
            "k", "pass_all", F.coalesce("is_member", F.lit(0)).alias("mem")
        )
    )
    return (
        orders.join(
            F.broadcast(keyed), orders.o_custkey == keyed.k
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("pass_all").alias("bloom_pass"),
            F.sum("mem").alias("true_match"),
            F.sum(
                F.expr(
                    "case when pass_all = 1 and mem = 0 then 1 else 0 end"
                )
            ).alias("false_pos"),
        )
        .orderBy("o_orderpriority")
    )


def _bloom_join_oracle() -> str:
    build_selects = "\n  UNION ALL ".join(
        f"SELECT {_bjoin_pos('k', j, 'duckdb')} AS pos FROM build"
        for j in range(BLOOM_JOIN_HASHES)
    )
    probe_selects = "\n  UNION ALL ".join(
        f"SELECT k, {_bjoin_pos('k', j, 'duckdb')} AS pos FROM probe"
        for j in range(BLOOM_JOIN_HASHES)
    )
    return f"""
WITH build AS (
  SELECT c_custkey AS k FROM customer
  WHERE c_mktsegment = '{BLOOM_JOIN_SEGMENT}'),
build_pos AS (
  SELECT DISTINCT pos FROM ({build_selects})),
probe AS (SELECT DISTINCT o_custkey AS k FROM orders),
probe_pos AS (
  {probe_selects}),
flags AS (
  SELECT pp.k,
         min(CASE WHEN bp.pos IS NOT NULL THEN 1 ELSE 0 END) AS pass_all
  FROM probe_pos pp LEFT JOIN build_pos bp ON pp.pos = bp.pos
  GROUP BY pp.k),
keyed AS (
  SELECT f.k, f.pass_all,
         CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END AS mem
  FROM flags f LEFT JOIN build b ON f.k = b.k)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(pass_all) AS BIGINT) AS bloom_pass,
       CAST(sum(mem) AS BIGINT) AS true_match,
       CAST(sum(CASE WHEN pass_all = 1 AND mem = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS false_pos
FROM orders o JOIN keyed ON o.o_custkey = keyed.k
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


BLOOM_JOIN_PREFILTER_ORACLE = _bloom_join_oracle()


SKETCH_QUERIES["hll_shingle_estimate"] = hll_shingle_estimate
SKETCH_ORACLES["hll_shingle_estimate"] = HLL_SHINGLE_ESTIMATE_ORACLE
SKETCH_QUERIES["kmv_shingle_estimate"] = kmv_shingle_estimate
SKETCH_ORACLES["kmv_shingle_estimate"] = KMV_SHINGLE_ESTIMATE_ORACLE
SKETCH_QUERIES["bloom_join_prefilter"] = bloom_join_prefilter
SKETCH_ORACLES["bloom_join_prefilter"] = BLOOM_JOIN_PREFILTER_ORACLE
