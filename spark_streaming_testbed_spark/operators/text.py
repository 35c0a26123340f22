"""Text-analysis operators for LLM-data pipelines (SURVEY.md §7 M7).

Language-ID, quality scoring, token statistics, and document
fingerprinting over the ``documents`` table. Everything stays JVM-side
(built-in higher-order array functions — no Python UDFs in the hot path),
so the plans survive whole-stage codegen at 100 TB.

Hash portability: 60-bit integer hashes are derived from the first 15 hex
chars of md5, which both Spark (``conv(substr(md5(x),1,15),16,10)``) and
DuckDB (``('0x'||substr(md5(x),1,15))::BIGINT``) compute identically —
that makes minhash/simhash oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import fan_out, load_table

ROUND = 6

#: deterministic marker words per language (synthetic corpus vocabulary);
#: the heuristic is a stopword-family vote — n-gram-frequency LID reduced
#: to its deterministic core so the DuckDB oracle can mirror it.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "de": ("data", "row", "table"),
    "es": ("scan", "filter", "sort"),
    "fr": ("join", "merge", "group"),
    "zh": ("fast", "slow", "value"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in")


def md5h(expr: str) -> Column:
    """Portable 60-bit hash of a SQL expression: first 15 hex md5 chars."""
    return F.expr(f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)")


MD5H_SQL_TEMPLATE = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def with_tokens(df: DataFrame, fan: bool = False) -> DataFrame:
    """Whitespace tokenization of ``text`` (single-space corpus).

    With ``fan=True``, applies
    :func:`~spark_streaming_testbed_spark.session.fan_out` first
    (keyed on ``doc_id`` when present) so a downstream per-row hot
    loop runs at cluster parallelism instead of scan parallelism (one
    task on the single-row-group testdata files; no-op on streaming
    frames and on scans that are already parallel, i.e. at cluster
    scale).

    The default is ``fan=False``: an r12 A/B sweep of all 34 consumers
    (fan vs no-fan interleaved, min of 3, sf0.1) showed the fan-out
    exchange — which carries the full text payload — LOSES for ~25 of
    them (worst: heavy_hitters +1.1 s, source_report +0.6 s,
    unigram_logprob +0.6 s) because their per-row work is a cheap
    split/explode feeding an immediate aggregate, and the blanket
    default from earlier in the round was paying a text shuffle for no
    compute win. Only consumers whose per-token loop is genuinely
    CPU-heavy opt in (entropy_signals' lambda folds -1.4 s, the
    span-window family in dedup.py -0.6..-1.4 s)."""
    if fan and not df.isStreaming and "doc_id" in df.columns:
        df = fan_out(df, "doc_id")
    return df.withColumn("tokens", F.split(F.trim(F.col("text")), " "))


TOKENS_SQL = "string_split(trim(text), ' ')"


# ---------------------------------------------------------------------------
# Token statistics
# ---------------------------------------------------------------------------

def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counts: total, distinct, mean token length."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(
            "doc_id",
            F.size("tokens").alias("n_tokens"),
            F.size(F.array_distinct("tokens")).alias("n_distinct"),
            F.round(
                F.aggregate(
                    "tokens", F.lit(0).cast("double"),
                    lambda acc, t: acc + F.length(t),
                ) / F.size("tokens"),
                ROUND,
            ).alias("mean_token_len"),
        )
        .orderBy("doc_id")
    )


TOKEN_STATS_ORACLE = f"""
WITH tok AS (SELECT doc_id, {TOKENS_SQL} AS tokens FROM documents)
SELECT doc_id,
       len(tokens) AS n_tokens,
       len(list_distinct(tokens)) AS n_distinct,
       round(list_sum(list_transform(tokens, t -> length(t))) * 1.0
             / len(tokens), {ROUND}) AS mean_token_len
FROM tok ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

def _round6_scaled(col) -> F.Column:
    """Halfway-stable 6 dp round for COMPUTED ratios: ``round(x * 1e6)
    / 1e6`` instead of ``round(x, 6)``. At a decimal-halfway value that
    is not binary-representable (e.g. quality = 0.5046875 exactly, hit
    by the sf0.1 corpus), Spark HALF_UPs the shortest decimal repr
    ("…5" → up) while DuckDB rounds the raw binary double (just below
    the halfway → down) — a one-ulp-at-6dp cross-engine split. After
    scaling, BOTH engines round the SAME double at integer precision,
    where the shortest repr can no longer cross the .5 boundary (it
    reads "x.5" only when the double IS the dyadic x.5, which both
    engines round up). The oracle mirrors the scaled form verbatim.
    Matches round(x, 6) everywhere except the halfway edge."""
    return F.round(col * F.lit(1000000.0)) / F.lit(1000000.0)


_ROUND6_SQL = "round(({expr}) * 1000000.0) / 1000000.0"


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length saturation + stopword ratio +
    alpha-character ratio, combined into one [0,1] score."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    n_tokens = F.size("tokens")
    n_stop = F.size(F.expr(
        "filter(tokens, t -> array_contains("
        + "array(" + ",".join(f"'{s}'" for s in STOPWORDS) + "), t))"
    ))
    alpha_len = F.length(F.regexp_replace("text", "[^a-z]", ""))
    stop_ratio = n_stop / n_tokens
    len_sat = F.least(F.lit(1.0), n_tokens / F.lit(100.0))
    alpha_ratio = alpha_len / F.length("text")
    return (
        docs.select(
            "doc_id",
            _round6_scaled(stop_ratio).alias("stopword_ratio"),
            _round6_scaled(alpha_ratio).alias("alpha_ratio"),
            _round6_scaled(
                0.4 * len_sat + 0.3 * stop_ratio + 0.3 * alpha_ratio
            ).alias("quality"),
        )
        .orderBy("doc_id")
    )


_STOP_LIST_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

QUALITY_SCORE_ORACLE = f"""
WITH tok AS (SELECT doc_id, text, {TOKENS_SQL} AS tokens FROM documents),
feats AS (
  SELECT doc_id,
         len(list_filter(tokens, t -> list_contains({_STOP_LIST_SQL}, t))) * 1.0
           / len(tokens) AS stop_ratio,
         length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0
           / length(text) AS alpha_ratio,
         least(1.0, len(tokens) / 100.0) AS len_sat
  FROM tok)
SELECT doc_id,
       {_ROUND6_SQL.format(expr="stop_ratio")} AS stopword_ratio,
       {_ROUND6_SQL.format(expr="alpha_ratio")} AS alpha_ratio,
       {_ROUND6_SQL.format(
           expr="0.4 * len_sat + 0.3 * stop_ratio + 0.3 * alpha_ratio")}
         AS quality
FROM feats ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Language identification (deterministic marker vote)
# ---------------------------------------------------------------------------

def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predict language by counting per-language marker tokens; ties break
    in fixed language order. Deterministic so the oracle can mirror it."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        arr = ",".join(f"'{m}'" for m in markers)
        score_cols.append(
            F.size(F.expr(
                f"filter(tokens, t -> array_contains(array({arr}), t))"
            )).alias(f"s_{lang}")
        )
    scored = docs.select("doc_id", "lang", *score_cols)
    langs = list(LANG_MARKERS)
    expr = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}") if langs.index(other) > langs.index(lang) \
                else F.col(f"s_{lang}") > F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return (
        scored.select(
            "doc_id",
            F.coalesce(expr, F.lit(langs[-1])).alias("lang_pred"),
            (F.coalesce(expr, F.lit(langs[-1])) == F.col("lang")).alias("matches_label"),
        )
        .orderBy("doc_id")
    )


def _lang_id_oracle() -> str:
    langs = list(LANG_MARKERS)
    score_sql = ",\n         ".join(
        "len(list_filter(tokens, t -> list_contains(["
        + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        + f"], t))) AS s_{lang}"
        for lang in langs
    )
    cases = []
    for lang in langs:
        conds = []
        for other in langs:
            if other == lang:
                continue
            op = ">=" if langs.index(other) > langs.index(lang) else ">"
            conds.append(f"s_{lang} {op} s_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    return f"""
WITH tok AS (SELECT doc_id, lang, {TOKENS_SQL} AS tokens FROM documents),
scored AS (
  SELECT doc_id, lang,
         {score_sql}
  FROM tok)
SELECT doc_id, {case_sql} AS lang_pred,
       ({case_sql}) = lang AS matches_label
FROM scored ORDER BY doc_id
"""


LANG_ID_ORACLE = _lang_id_oracle()


# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------

def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized text plus a
    portable 60-bit integer variant (for bucketing / shard routing)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"
    return (
        docs.select(
            "doc_id",
            F.expr(f"md5({norm})").alias("fp"),
            F.expr(
                f"cast(conv(substring(md5({norm}), 1, 15), 16, 10) as bigint)"
            ).alias("fp64"),
        )
        .orderBy("doc_id")
    )


DOC_FINGERPRINT_ORACLE = r"""
WITH n AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents)
SELECT doc_id, md5(norm) AS fp,
       CAST(('0x' || substr(md5(norm), 1, 15)) AS BIGINT) AS fp64
FROM n ORDER BY doc_id
"""

#: characteristic char-trigram profiles per language (synthetic-corpus
#: adapted): the n-gram-frequency LID heuristic with a deterministic
#: profile so the oracle mirrors it exactly.
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": ("the", "he ", "ow ", "a f"),
    "de": ("dat", "row", "tab", "ue "),
    "es": ("sca", "fil", "sor", "n f"),
    "fr": ("joi", "mer", "gro", "in "),
    "zh": ("fas", "slo", "val", "st "),
}


def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram language ID: slide a 3-char window over the text,
    score each language by how many of its profile trigrams occur,
    argmax with fixed tie-break order. All JVM-side: the trigram set is
    built once per row with higher-order array functions."""
    docs = load_table(spark, sf_dir, "documents")
    # The score is "how many of the language's profile trigrams occur
    # anywhere in the text" (set intersection size), so it reduces to a
    # row-local sum of substring-containment flags — no explode, no
    # distinct shuffle, no aggregation. 20 instr() probes per row, all
    # inside one whole-stage-codegen scan; the only shuffle left is the
    # output sort. (Earlier shapes — per-char transform lambdas, then
    # explode+distinct+groupBy — did O(len) work per row plus two
    # shuffles for the same answer.)
    langs = list(LANG_TRIGRAMS)
    # a NULL-text row scores NULL per language (instr's NULL would
    # otherwise fold to 0 and the tie-break would "identify" the first
    # language): NULL scores fail every argmax condition, so prediction
    # falls through to the same last-language fallback the oracle's
    # CASE hits when its NULL trigram list nulls every score (r9 sweep)
    scored = docs.select(
        "doc_id",
        *[
            F.when(
                F.col("text").isNotNull(),
                sum(
                    F.when(F.instr(F.col("text"), g) > 0, 1).otherwise(0)
                    for g in LANG_TRIGRAMS[lang]
                ),
            ).cast("int").alias(f"s_{lang}")
            for lang in langs
        ],
    )
    expr = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            op_ge = langs.index(other) > langs.index(lang)
            c = (
                F.col(f"s_{lang}") >= F.col(f"s_{other}")
                if op_ge
                else F.col(f"s_{lang}") > F.col(f"s_{other}")
            )
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return (
        scored.select(
            "doc_id",
            F.coalesce(expr, F.lit(langs[-1])).alias("lang_pred"),
            *[F.col(f"s_{lang}").alias(f"s_{lang}") for lang in langs],
        )
        .orderBy("doc_id")
    )


def _lang_id_ngram_oracle() -> str:
    langs = list(LANG_TRIGRAMS)
    tri = (
        "list_distinct(list_transform(range(1, length(text) - 1), "
        "i -> substring(text, CAST(i AS INT), 3)))"
    )
    scores = ",\n         ".join(
        "len(list_intersect(tris, ["
        + ", ".join(f"'{g}'" for g in LANG_TRIGRAMS[lang])
        + f"])) AS s_{lang}"
        for lang in langs
    )
    cases = []
    for lang in langs:
        conds = []
        for other in langs:
            if other == lang:
                continue
            op = ">=" if langs.index(other) > langs.index(lang) else ">"
            conds.append(f"s_{lang} {op} s_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    cols = ", ".join(f"s_{lang}" for lang in langs)
    return f"""
WITH t AS (SELECT doc_id, lang, {tri} AS tris FROM documents),
scored AS (
  SELECT doc_id, lang,
         {scores}
  FROM t)
SELECT doc_id, {case_sql} AS lang_pred, {cols}
FROM scored ORDER BY doc_id
"""


LANG_ID_NGRAM_ORACLE = _lang_id_ngram_oracle()

#: GPT-2-style pre-tokenizer, reduced to the portable core: word runs,
#: digit runs, or single punctuation — the "BPE-ish regex".
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]"


def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex (word runs /
    digit runs / punctuation singles) next to the whitespace count."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.expr(f"size(regexp_extract_all(text, '{BPE_RE}', 0))")
            .alias("bpe_tokens"),
            F.size(F.split(F.trim(F.col("text")), " ")).alias("ws_tokens"),
        )
        .orderBy("doc_id")
    )


BPE_TOKEN_STATS_ORACLE = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS bpe_tokens,
       len(string_split(trim(text), ' ')) AS ws_tokens
FROM documents ORDER BY doc_id
"""


WINNOW_K = 8   # char k-gram size
WINNOW_W = 4   # winnowing window (fingerprint density guarantee)


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the rolling-hash scheme of
    Schleimer/Wilkerson/Aiken's MOSS): hash every char k-gram of the
    normalized text, slide a window of w hashes, keep each window's
    minimum, dedup. Guarantees a match of length ≥ w+k-1 shares a
    fingerprint. All JVM-side (sequence/substring/higher-order mins);
    hashes are the portable md5-derived 60-bit family so DuckDB mirrors
    the selection exactly. Output: one row per (doc, fingerprint)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    k, w = WINNOW_K, WINNOW_W
    # Shape note: the array-lambda formulation (`transform(sequence(...),
    # i -> md5(substring(norm, i, k)))`) runs INTERPRETED per element —
    # higher-order lambdas sit outside whole-stage codegen, and project
    # collapse re-inlines the regex normalization into the lambda (one
    # regex run per character). Exploding positions keeps every
    # per-gram expression inside codegen: explode + substring + md5
    # happen in one pipelined stage (the duplicated `norm` string never
    # materializes past the operator), then one partition-local-ish
    # window by doc computes the sliding minima.
    # Fan out BEFORE the explode: the documents scan is one split per
    # parquet file, so without this the md5-per-gram stage (the hot loop)
    # runs at file parallelism. Repartitioning on doc_id spreads the hash
    # work across the cluster AND satisfies the window's
    # partitionBy(doc_id) — and, because hash(doc_id) clusters every
    # (doc_id, fp) group too, the later distinct — so the exchange is
    # reused, not added (one shuffle total before the output sort).
    # ``fan_out`` (r12): the bare ``repartition("doc_id")`` this used
    # was AQE-coalesced back to ONE partition (few-MB shuffle), so the
    # hot loop still ran single-core; the helper pins an explicit
    # partition count and no-ops once the scan itself is parallel.
    normed = fan_out(
        docs.select(
            "doc_id",
            F.expr("regexp_replace(lower(trim(text)), '\\\\s+', ' ')").alias("norm"),
        ),
        "doc_id",
    )
    grams = normed.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(1, greatest(length(norm) - {k} + 1, 0))")
        ).alias("g"),
        "norm",
    ).select(
        "doc_id", "g",
        md5h(f"substring(norm, g, {k})").alias("h"),
    )
    win = W.partitionBy("doc_id").orderBy("g").rowsBetween(-(w - 1), 0)
    return (
        grams.withColumn("fp", F.min("h").over(win))
        .where(F.col("g") >= w)  # only full w-windows (needs ≥ w grams)
        .select("doc_id", "fp")
        .distinct()
        .orderBy("doc_id", "fp")
    )


def _winnow_oracle() -> str:
    k, w = WINNOW_K, WINNOW_W
    h = MD5H_SQL_TEMPLATE.format(expr=f"substring(norm, CAST(i AS INT), {k})")
    return f"""
WITH n AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
  FROM documents),
g AS (
  SELECT doc_id,
         list_transform(range(1, length(norm) - {k} + 2), i -> {h}) AS hs
  FROM n),
m AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(hs) - {w} + 2),
                       i -> list_min(hs[i:i+{w}-1]))) AS fps
  FROM g WHERE len(hs) >= {w})
SELECT doc_id, unnest(fps) AS fp
FROM m ORDER BY doc_id, fp
"""


# ---------------------------------------------------------------------------
# Document chunking (pre-training window split)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 32
CHUNK_STRIDE = 24


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks per document (size 32, stride 24) —
    the standard pre-training split. Row-local: sequence of chunk starts +
    slice + explode, all codegen'd array functions, zero shuffle before
    the final sort. Each chunk carries a portable 60-bit content hash so
    downstream exact-dedup can run at chunk granularity."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    n = F.size("tokens")
    starts = F.sequence(F.lit(0), n - 1, F.lit(CHUNK_STRIDE))
    chunked = (
        docs.where(n > 0)
        .select("doc_id", "tokens", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
            F.slice("tokens", F.col("start") + 1, CHUNK_SIZE).alias("ctoks"),
        )
    )
    return (
        chunked.select(
            "doc_id", "chunk_id",
            F.size("ctoks").cast("bigint").alias("n_tokens"),
            md5h("array_join(ctoks, ' ')").alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_id")
    )


_CHUNK_HASH_SQL = MD5H_SQL_TEMPLATE.format(
    expr="array_to_string(list_slice(tokens, j * {stride} + 1, "
         "j * {stride} + {size}), ' ')"
).format(stride=CHUNK_STRIDE, size=CHUNK_SIZE)

# DuckDB can't unnest(range(col)) laterally — cross join a constant index
# domain and filter j*stride < len(tokens) instead (same trick as the
# winnowing oracle).
DOC_CHUNKS_ORACLE = f"""
WITH tok AS (SELECT doc_id, {TOKENS_SQL} AS tokens FROM documents),
idx AS (SELECT unnest(range(4096)) AS j)
SELECT doc_id, j AS chunk_id,
       len(list_slice(tokens, j * {CHUNK_STRIDE} + 1,
                      j * {CHUNK_STRIDE} + {CHUNK_SIZE})) AS n_tokens,
       {_CHUNK_HASH_SQL} AS chunk_hash
FROM tok CROSS JOIN idx
WHERE len(tokens) > 0 AND j * {CHUNK_STRIDE} < len(tokens)
ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# PII redaction (scrub before training)
# ---------------------------------------------------------------------------

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
_NUM_RE = "[0-9]{3,}"


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: email → <EMAIL>, phone → <PHONE>, long digit runs →
    <NUM>, applied in that order (emails/phones contain digits). The
    synthetic corpus has no PII, so a deterministic contact line derived
    from doc_id is appended first — the redaction mechanics (regex family,
    ordering, full-string replacement) are what the oracle checks. Pure
    ``regexp_replace`` chain: codegen'd, no UDF, embarrassingly parallel."""
    docs = load_table(spark, sf_dir, "documents")
    contact = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad(F.col("doc_id").cast("string"), 4, "0"),
        F.lit(" ref "), (F.col("doc_id") * 7919).cast("string"),
    )
    red = F.regexp_replace(contact, _EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, _PHONE_RE, "<PHONE>")
    red = F.regexp_replace(red, _NUM_RE, "<NUM>")
    return (
        docs.select(
            "doc_id",
            red.alias("redacted"),
            F.length(red).cast("bigint").alias("red_len"),
        )
        .orderBy("doc_id")
    )


# DuckDB regexp_replace needs the 'g' flag (default replaces first match
# only, unlike Spark which replaces all).
PII_REDACT_ORACLE = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-'
              || lpad(CAST(doc_id AS VARCHAR), 4, '0')
              || ' ref ' || CAST(doc_id * 7919 AS VARCHAR) AS contact
  FROM documents
), red AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(contact,
             '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PHONE_RE}', '<PHONE>', 'g'),
             '{_NUM_RE}', '<NUM>', 'g') AS redacted
  FROM aug
)
SELECT doc_id, redacted, length(redacted) AS red_len
FROM red ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Deterministic hash-based dataset split (reproducible sampling at scale)
# ---------------------------------------------------------------------------

def hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment from a content-independent
    60-bit hash of the document id — deterministic, order-independent,
    and stable under re-partitioning or incremental reloads (the property
    ``df.sample`` lacks). Pure projection: no shuffle, no RNG state."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = md5h("cast(doc_id as string)") % 100
    return (
        docs.select(
            "doc_id",
            bucket.alias("bucket"),
            F.when(bucket < 80, "train")
            .when(bucket < 90, "val")
            .otherwise("test").alias("split"),
        )
        .orderBy("doc_id")
    )


_BUCKET_SQL = MD5H_SQL_TEMPLATE.format(expr="CAST(doc_id AS VARCHAR)") + " % 100"

HASH_SPLIT_ORACLE = f"""
SELECT doc_id, {_BUCKET_SQL} AS bucket,
       CASE WHEN {_BUCKET_SQL} < 80 THEN 'train'
            WHEN {_BUCKET_SQL} < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Corpus-statistics ops: TF-IDF, unigram LM scoring, domain mixing
# ---------------------------------------------------------------------------

TFIDF_TOP_K = 3


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k TF-IDF terms per document. Two aggregations (term frequency
    per doc, document frequency per term) meet in an equi-join keyed on
    token — the vocabulary side is orders of magnitude smaller than the
    corpus, so AQE broadcasts it at any realistic scale. idf uses the
    smoothed ln((N+1)/(df+1)) form; N is a 1-row broadcast anchor, never
    a driver-side collect."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode("tokens").alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)),
        )
    )
    from pyspark.sql import Window as W
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TFIDF_TOP_K)
        .select("doc_id", "rk", "token", F.round("score", 6).alias("score"))
        .orderBy("doc_id", "rk")
    )


TFIDF_TOP_TERMS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS token FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2
), df AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         tf.tf * ln((n.n_docs + 1) * 1.0 / (df.df + 1)) AS score
  FROM tf JOIN df USING (token) CROSS JOIN n
), ranked AS (
  SELECT doc_id, token, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, token) AS rk
  FROM scored
)
SELECT doc_id, rk, token, round(score, 6) AS score
FROM ranked WHERE rk <= {TFIDF_TOP_K}
ORDER BY doc_id, rk
"""


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram-LM quality score per document: mean ln p(token)
    under the corpus's own unigram distribution — the cheap LM-based
    filter that drops gibberish before expensive model scoring. The
    unigram table is a small aggregate joined back on token (broadcast
    at scale); totals are 1-row broadcast anchors."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode("tokens").alias("token"))
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = uni.agg(F.sum("cnt").alias("total"))
    return (
        toks.join(uni, "token")
        .crossJoin(F.broadcast(total))
        .withColumn("logp", F.log(F.col("cnt") / F.col("total")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("logp"), 6).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


UNIGRAM_LOGPROB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS token FROM documents
), uni AS (
  SELECT token, count(*) AS cnt FROM toks GROUP BY 1
), tot AS (SELECT sum(cnt) AS total FROM uni)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(ln(cnt * 1.0 / total)), 6) AS avg_logp
FROM toks JOIN uni USING (token) CROSS JOIN tot
GROUP BY doc_id ORDER BY doc_id
"""


#: per-language target sampling rates for the training mix
MIX_RATES: dict[str, float] = {
    "en": 0.9, "de": 0.5, "es": 0.5, "fr": 0.25, "zh": 0.25,
}


def mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain mixing: keep each document with a per-language
    target rate, decided by a content-independent hash bucket of doc_id —
    reproducible under re-partitioning and incremental reloads, unlike
    ``df.sample``/``sampleBy``. Pure projection + filter, no shuffle, no
    RNG state; at 100 TB this is a pushed-down predicate."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = md5h("cast(doc_id as string)") % 1000
    rate = None
    for lang, r in MIX_RATES.items():
        expr = F.when(F.col("lang") == lang, F.lit(int(r * 1000)))
        rate = expr if rate is None else rate.when(
            F.col("lang") == lang, F.lit(int(r * 1000)))
    rate = rate.otherwise(F.lit(0))
    return (
        docs.select("doc_id", "lang", bucket.alias("bucket"),
                    rate.alias("rate_mill"))
        .where(F.col("bucket") < F.col("rate_mill"))
        .orderBy("doc_id")
    )


_MIX_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN {int(r * 1000)}" for lang, r in MIX_RATES.items()
)

MIX_SAMPLE_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         {MD5H_SQL_TEMPLATE.format(expr="CAST(doc_id AS VARCHAR)")} % 1000
           AS bucket,
         CASE {_MIX_CASE} ELSE 0 END AS rate_mill
  FROM documents
)
SELECT doc_id, lang, bucket, rate_mill
FROM scored WHERE bucket < rate_mill
ORDER BY doc_id
"""


WINNOW_FINGERPRINTS_ORACLE = _winnow_oracle()


# ---------------------------------------------------------------------------
# Repetition quality signals (Gopher-style n-gram filters)
# ---------------------------------------------------------------------------

def with_grams(df: DataFrame, n: int, out: str) -> DataFrame:
    """All word n-grams per document, duplicates kept (row-local).

    ``pyspark.ml.feature.NGram`` (JVM sliding iterator) instead of an
    array lambda: projection collapse inlines the token split into the
    lambda body and the interpreted `slice(tokens, i, n)` re-splits the
    document per position — O(len²) per doc (measured 11× at sf0.1).
    Requires a ``tokens`` column (``with_tokens``).

    NULL-safe at the transformer boundary: ``NGram`` NPEs on a NULL
    token array (a NULL ``text`` row in a malformed feed — r9 nulls
    sweep), so the input rides a coalesced temp column and ``tokens``
    itself is left untouched. A NULL document yields ``[]`` grams,
    which every downstream explode treats exactly like the oracles'
    ``unnest(NULL)`` — zero gram rows."""
    from pyspark.ml.feature import NGram

    guarded = df.withColumn(
        "_ng_in", F.coalesce(F.col("tokens"), F.array())
    )
    return (
        NGram(n=n, inputCol="_ng_in", outputCol=out)
        .transform(guarded)
        .drop("_ng_in")
    )


def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, table A1): the
    mass of the single most frequent word bigram and the fraction of
    trigram occurrences that are repeats — high values mark boilerplate
    and degenerate generations worth dropping before training.

    Shape: explode n-grams → count per (doc, gram) → per-doc aggregate.
    Both shuffles are keyed on doc_id(+gram), so cardinality is bounded
    by corpus token count — no cross-doc state, linear at 100 TB. The
    bigram and trigram aggregates land on the same doc_id partitioning,
    so the final join is co-partitioned (no extra exchange under AQE)."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    base = with_grams(with_grams(docs, 2, "bigrams"), 3, "trigrams").select(
        "doc_id", "bigrams", "trigrams"
    )
    bi = (
        base.select("doc_id", F.explode("bigrams").alias("g"))
        .groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bi"))
    )
    tri = (
        base.select("doc_id", F.explode("trigrams").alias("g"))
        .groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dist"), F.sum("c").alias("n_tri"))
    )
    return (
        bi.join(tri, "doc_id")
        .select(
            "doc_id",
            F.round(F.col("top_c") / F.col("n_bi"), ROUND)
            .alias("top_bigram_frac"),
            F.round(1 - F.col("n_dist") / F.col("n_tri"), ROUND)
            .alias("dup_trigram_frac"),
        )
        .withColumn(
            "repetitive",
            ((F.col("top_bigram_frac") > 0.2)
             | (F.col("dup_trigram_frac") > 0.18)).cast("int"),
        )
        .orderBy("doc_id")
    )


REPETITION_SIGNALS_ORACLE = f"""
WITH tok AS (SELECT doc_id, {TOKENS_SQL} AS tokens FROM documents),
grams AS (
  SELECT doc_id,
    CASE WHEN len(tokens) >= 2 THEN
      list_transform(range(1, len(tokens)),
                     i -> array_to_string(tokens[i:i+1], ' '))
    ELSE [] END AS bigrams,
    CASE WHEN len(tokens) >= 3 THEN
      list_transform(range(1, len(tokens) - 1),
                     i -> array_to_string(tokens[i:i+2], ' '))
    ELSE [] END AS trigrams
  FROM tok),
bic AS (SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest(bigrams) AS g FROM grams) GROUP BY 1, 2),
bia AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_bi FROM bic GROUP BY 1),
tric AS (SELECT doc_id, g, count(*) AS c
         FROM (SELECT doc_id, unnest(trigrams) AS g FROM grams) GROUP BY 1, 2),
tria AS (SELECT doc_id, count(*) AS n_dist, sum(c) AS n_tri
         FROM tric GROUP BY 1),
fracs AS (
  SELECT bia.doc_id,
         round(top_c * 1.0 / n_bi, {ROUND}) AS top_bigram_frac,
         round(1 - n_dist * 1.0 / n_tri, {ROUND}) AS dup_trigram_frac
  FROM bia JOIN tria ON bia.doc_id = tria.doc_id)
SELECT doc_id, top_bigram_frac, dup_trigram_frac,
       CAST(top_bigram_frac > 0.2 OR dup_trigram_frac > 0.18 AS INT)
         AS repetitive
FROM fracs ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Stratified exact sampling
# ---------------------------------------------------------------------------

STRATIFIED_FRAC = 0.2


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sample: per language, keep exactly
    ``ceil(frac · n_lang)`` documents, chosen by hash order — the
    companion to :func:`mix_sample` when the contract is a guaranteed
    per-stratum count (eval-set construction, per-language caps) rather
    than an expected rate. Unlike ``df.sampleBy`` the result is
    deterministic across partitionings and engines.

    Shape: one window rank per stratum (a single shuffle keyed on the
    stratum — the scalable exact-sample shape; the hash orders rows, so
    no RNG state) plus a broadcast of the tiny per-stratum quota table."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    h = md5h("cast(doc_id as string)")
    ranked = docs.select(
        "doc_id", "lang", h.alias("h")
    ).withColumn(
        "rn", F.row_number().over(W.partitionBy("lang").orderBy("h", "doc_id"))
    )
    quota = docs.groupBy("lang").agg(
        F.ceil(F.count(F.lit(1)) * STRATIFIED_FRAC).alias("quota")
    )
    return (
        ranked.join(F.broadcast(quota), "lang")
        .where(F.col("rn") <= F.col("quota"))
        .select("doc_id", "lang", "rn")
        .orderBy("doc_id")
    )


STRATIFIED_SAMPLE_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {MD5H_SQL_TEMPLATE.format(expr="CAST(doc_id AS VARCHAR)")},
                    doc_id) AS rn
  FROM documents),
quota AS (
  SELECT lang, CAST(ceil(count(*) * {STRATIFIED_FRAC}) AS BIGINT) AS quota
  FROM documents GROUP BY 1)
SELECT doc_id, ranked.lang, rn
FROM ranked JOIN quota ON ranked.lang = quota.lang
WHERE rn <= quota
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Per-source corpus report card
# ---------------------------------------------------------------------------

def source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus governance report per ``source``: volume (docs, tokens),
    language spread (distinct count + dominant language), and
    within-source exact-duplicate volume — the health dashboard a
    curation pipeline runs before admitting a source into the mix.

    Every aggregate and join is keyed on ``source`` (bounded
    cardinality), so the whole report is one scan plus source-keyed
    hash aggregations — co-partitioned joins, no wide shuffle. The
    dominant language uses row_number with an alphabetical tie-break so
    the result is deterministic across engines."""
    from pyspark.sql import Window as W

    docs = with_tokens(load_table(spark, sf_dir, "documents")).withColumn(
        "n_tokens", F.size("tokens")
    )
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), ROUND).alias("avg_tokens"),
        F.countDistinct("lang").alias("n_langs"),
    )
    top_lang = (
        docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("source").orderBy(F.col("c").desc(), "lang")
            ),
        )
        .where(F.col("rk") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    dups = (
        docs.groupBy("source", "text").agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .groupBy("source").agg(F.sum("c").alias("n_dup"))
    )
    return (
        base.join(top_lang, "source")
        .join(dups, "source", "left")
        .select(
            "source", "n_docs", "total_tokens", "avg_tokens", "n_langs",
            "top_lang",
            F.coalesce("n_dup", F.lit(0)).alias("n_dup_docs"),
        )
        .orderBy("source")
    )


SOURCE_REPORT_ORACLE = f"""
WITH tok AS (
  SELECT source, lang, text,
         len({TOKENS_SQL}) AS n_tokens
  FROM documents),
base AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         round(avg(n_tokens), {ROUND}) AS avg_tokens,
         count(DISTINCT lang) AS n_langs
  FROM tok GROUP BY 1),
pl AS (SELECT source, lang, count(*) AS c FROM tok GROUP BY 1, 2),
top AS (
  SELECT source, lang AS top_lang
  FROM (SELECT source, lang,
               row_number() OVER (PARTITION BY source
                                  ORDER BY c DESC, lang) AS rk
        FROM pl)
  WHERE rk = 1),
d AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_dup
  FROM (SELECT source, text, count(*) AS c FROM tok GROUP BY 1, 2)
  WHERE c > 1 GROUP BY 1)
SELECT base.source, n_docs, total_tokens, avg_tokens, n_langs, top_lang,
       coalesce(n_dup, 0) AS n_dup_docs
FROM base JOIN top ON base.source = top.source
LEFT JOIN d ON base.source = d.source
ORDER BY base.source
"""



# ---------------------------------------------------------------------------
# Training-sequence packing + corpus n-gram report
# ---------------------------------------------------------------------------

PACK_BUDGET = 256   # tokens per training sequence
PACK_BUCKETS = 8    # independent packing streams


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed-token-budget training sequences — the
    step that turns a cleaned corpus into LM pretraining rows.

    Scale shape: a single global cumulative sum would serialize onto one
    partition, so docs are first bucketed by a content-independent
    60-bit id hash into ``PACK_BUCKETS`` independent packing streams
    (at cluster scale, thousands); the running token total is a window
    cumsum *partitioned by bucket*, and a doc lands in sequence
    ``floor(cum_before / budget)`` of its bucket. Deterministic,
    shuffle = one window per bucket, no driver state."""
    from pyspark.sql import Window as W

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    bucket = (md5h("cast(doc_id as string)") % PACK_BUCKETS).alias("bucket")
    base = docs.select(
        "doc_id", F.size("tokens").alias("n_tokens"), bucket
    )
    w = (
        W.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        base.select(
            "doc_id", "n_tokens", "bucket",
            (
                F.col("bucket") * F.lit(1_000_000)
                + F.floor(cum_before / F.lit(PACK_BUDGET))
            ).alias("seq_id"),
            (cum_before % PACK_BUDGET).alias("offset_in_seq"),
        )
        .orderBy("doc_id")
    )


_PACK_BUCKET_SQL = (
    MD5H_SQL_TEMPLATE.format(expr="CAST(doc_id AS VARCHAR)")
    + f" % {PACK_BUCKETS}"
)

PACK_SEQUENCES_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len({TOKENS_SQL}) AS BIGINT) AS n_tokens,
         {_PACK_BUCKET_SQL} AS bucket
  FROM documents),
cum AS (
  SELECT doc_id, n_tokens, bucket,
         CAST(coalesce(SUM(n_tokens) OVER (
             PARTITION BY bucket ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_before
  FROM base)
SELECT doc_id, n_tokens, bucket,
       bucket * 1000000 + cum_before // {PACK_BUDGET} AS seq_id,
       cum_before % {PACK_BUDGET} AS offset_in_seq
FROM cum ORDER BY doc_id
"""


TOP_NGRAMS_K = 20


def top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-k word n-grams (n = 1..3) by occurrence count —
    the vocabulary/boilerplate report used to pick stop-shingles and
    spot template contamination. One explode + one hash aggregation per
    n (Catalyst unions them); ties broken lexicographically so the
    ranking is deterministic."""
    from pyspark.sql import Window as W

    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    per_n = [
        with_grams(docs, n, "grams").select(
            F.lit(n).alias("n"),
            F.explode("grams").alias("gram"),
        )
        for n in (1, 2, 3)
    ]
    grams = per_n[0].unionByName(per_n[1]).unionByName(per_n[2])
    counts = grams.groupBy("n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.partitionBy("n").orderBy(F.col("cnt").desc(), F.col("gram"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_NGRAMS_K)
        .select("n", "rk", "gram", "cnt")
        .orderBy("n", "rk")
    )


def _grams_sql(n: int) -> str:
    return (
        f"CASE WHEN len(tokens) >= {n} THEN "
        f"list_transform(range(1, len(tokens) - {n} + 2), "
        f"i -> array_to_string(tokens[i:i+{n}-1], ' ')) "
        "ELSE [] END"
    )


TOP_NGRAMS_ORACLE = f"""
WITH tok AS (SELECT doc_id, {TOKENS_SQL} AS tokens FROM documents),
grams AS (
  SELECT 1 AS n, unnest({_grams_sql(1)}) AS gram FROM tok
  UNION ALL
  SELECT 2 AS n, unnest({_grams_sql(2)}) AS gram FROM tok
  UNION ALL
  SELECT 3 AS n, unnest({_grams_sql(3)}) AS gram FROM tok),
counts AS (
  SELECT n, gram, count(*) AS cnt FROM grams GROUP BY n, gram),
ranked AS (
  SELECT n, gram, cnt,
         CAST(row_number() OVER (
             PARTITION BY n ORDER BY cnt DESC, gram) AS INT) AS rk
  FROM counts)
SELECT n, rk, gram, cnt
FROM ranked WHERE rk <= {TOP_NGRAMS_K}
ORDER BY n, rk
"""


# ---------------------------------------------------------------------------
# Quality-filter funnel (C4/Gopher-style cascade with drop accounting)
# ---------------------------------------------------------------------------

#: (stage_name, duckdb condition) — cumulative: stage k applies to the
#: survivors of stage k-1. Thresholds chosen against the synthetic corpus
#: distributions so every stage has real selectivity at sf>=0.01.
FUNNEL_MIN_WORDS = 24
FUNNEL_MAX_WORDS = 88
FUNNEL_MIN_STOP = 0.02
FUNNEL_MIN_ALPHA = 0.815


def filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style quality-filter cascade with per-stage drop
    accounting: non-empty → word-count floor → word-count ceiling →
    stopword-ratio floor → alpha-ratio floor, each applied to the
    survivors of the previous stage, reported as one row per stage
    (docs_in / survivors / dropped).

    The whole funnel is ONE codegen scan: each stage is a cumulative
    boolean conjunction, the six counts are fused conditional sums in a
    single global HashAggregate, and the long-form report is a stack()
    over that one aggregated row. No per-stage passes, no shuffle of doc
    rows — the accounting a 100 TB curation run wants at zero extra
    cost."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    n_tok = F.size("tokens")
    stop_ratio = F.size(F.expr(
        "filter(tokens, t -> array_contains("
        + "array(" + ",".join(f"'{s}'" for s in STOPWORDS) + "), t))"
    )) / n_tok
    alpha_ratio = (
        F.length(F.regexp_replace("text", "[^a-z]", "")) / F.length("text")
    )
    c1 = F.length(F.trim(F.col("text"))) > 0
    c2 = c1 & (n_tok >= FUNNEL_MIN_WORDS)
    c3 = c2 & (n_tok <= FUNNEL_MAX_WORDS)
    c4 = c3 & (stop_ratio >= FUNNEL_MIN_STOP)
    c5 = c4 & (alpha_ratio >= FUNNEL_MIN_ALPHA)
    agg = docs.agg(
        F.count(F.lit(1)).alias("s0"),
        *[
            F.sum(F.when(c, 1).otherwise(0)).alias(f"s{i}")
            for i, c in enumerate((c1, c2, c3, c4, c5), start=1)
        ],
    )
    names = ["nonempty", "min_words", "max_words", "stopword_ratio",
             "alpha_ratio"]
    stack_args = ", ".join(
        f"{i + 1}, '{name}', s{i}, s{i + 1}"
        for i, name in enumerate(names)
    )
    return (
        agg.select(F.expr(
            f"stack({len(names)}, {stack_args}) AS "
            "(stage, stage_name, docs_in, survivors)"
        ))
        .select(
            F.col("stage").cast("int").alias("stage"),
            "stage_name", "docs_in", "survivors",
            (F.col("docs_in") - F.col("survivors")).alias("dropped"),
        )
        .orderBy("stage")
    )


def _filter_funnel_oracle() -> str:
    stop_list = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    conds = [
        "length(trim(text)) > 0",
        f"len(tokens) >= {FUNNEL_MIN_WORDS}",
        f"len(tokens) <= {FUNNEL_MAX_WORDS}",
        "len(list_filter(tokens, t -> list_contains("
        f"{stop_list}, t))) * 1.0 / len(tokens) >= {FUNNEL_MIN_STOP}",
        "length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 "
        f"/ length(text) >= {FUNNEL_MIN_ALPHA}",
    ]
    cum, sums = [], []
    for i, c in enumerate(conds, start=1):
        cum.append(c if i == 1 else f"({cum[-1]}) AND ({c})")
        sums.append(
            f"CAST(sum(CASE WHEN {cum[-1]} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS s{i}"
        )
    names = ["nonempty", "min_words", "max_words", "stopword_ratio",
             "alpha_ratio"]
    rows = "\n  UNION ALL ".join(
        f"SELECT CAST({i + 1} AS INT) AS stage, '{name}' AS stage_name, "
        f"s{i} AS docs_in, s{i + 1} AS survivors, "
        f"s{i} - s{i + 1} AS dropped FROM agg"
        for i, name in enumerate(names)
    )
    return f"""
WITH tok AS (SELECT doc_id, text, {TOKENS_SQL} AS tokens FROM documents),
agg AS (
  SELECT count(*) AS s0,
         {", ".join(sums)}
  FROM tok)
{rows}
ORDER BY stage
"""


FILTER_FUNNEL_ORACLE = _filter_funnel_oracle()


TOKEN_BUDGET = 1_000_000  # global training-token budget for the mix plan
MAX_EPOCHS = 4.0          # cap on per-source repeat factor


def epoch_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLaMA-style epoch mixing plan: per-source token totals -> sampling
    weights -> repeat factors (epochs) against a global token budget, with
    the repeat factor capped at ``MAX_EPOCHS``.

    Shape: one shuffle keyed on ``source`` (partial+final hash agg, so the
    map side pre-combines ~#sources rows per task), then the scalar weight
    total is crossed back via ``crossJoin(broadcast(...))`` — the anchor
    pattern from ``time_shift``. At 100 TB the rollup output is ~#sources
    rows, so everything after the first agg is driver-trivial.

    Weights are a deterministic function of the source name (portable
    md5-derived hash mod 4, plus one) so the plan is reproducible and the
    DuckDB oracle can mirror it without a side table."""
    # fan=False: the per-row work is one split + size feeding the
    # source-keyed aggregate — a fan-out exchange would move the text
    # payload for no compute win and widen ReadSchema with doc_id
    # (pinned by test_epoch_mix_plan_single_fact_shuffle_and_broadcast)
    docs = with_tokens(load_table(spark, sf_dir, "documents"), fan=False)
    per_src = (
        docs.select("source", F.size("tokens").alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_tokens").alias("src_tokens"),
        )
        # weights are small integer-valued doubles (1..4), so the scalar
        # sum below is fp-exact under any partition order
        .withColumn("weight", (F.lit(1) + md5h("source") % 4).cast("double"))
    )
    total = per_src.agg(F.sum("weight").alias("w_total"))
    planned = per_src.crossJoin(F.broadcast(total)).withColumn(
        "target_tokens",
        F.floor(F.col("weight") / F.col("w_total") * TOKEN_BUDGET).cast("bigint"),
    )
    return (
        planned.select(
            "source", "docs", "src_tokens", "weight", "target_tokens",
            F.round(
                F.least(
                    F.lit(MAX_EPOCHS),
                    F.col("target_tokens") / F.col("src_tokens"),
                ),
                ROUND,
            ).alias("epochs"),
        )
        .withColumn(
            "sampled_tokens",
            F.floor(F.col("epochs") * F.col("src_tokens")).cast("bigint"),
        )
        .orderBy("source")
    )


EPOCH_MIX_PLAN_ORACLE = f"""
WITH tok AS (SELECT source, len({TOKENS_SQL}) AS n_tokens FROM documents),
per_src AS (
  SELECT source, count(*) AS docs,
         CAST(sum(n_tokens) AS BIGINT) AS src_tokens,
         CAST(1 + ({MD5H_SQL_TEMPLATE.format(expr='source')} % 4) AS DOUBLE)
           AS weight
  FROM tok GROUP BY source),
tot AS (SELECT CAST(sum(weight) AS DOUBLE) AS w_total FROM per_src),
planned AS (
  SELECT source, docs, src_tokens, weight,
         CAST(floor(weight / w_total * {TOKEN_BUDGET}) AS BIGINT)
           AS target_tokens
  FROM per_src CROSS JOIN tot),
eps AS (
  SELECT source, docs, src_tokens, weight, target_tokens,
         round(least(CAST({MAX_EPOCHS} AS DOUBLE),
                     target_tokens / src_tokens), {ROUND}) AS epochs
  FROM planned)
SELECT source, docs, src_tokens, weight, target_tokens, epochs,
       CAST(floor(epochs * src_tokens) AS BIGINT) AS sampled_tokens
FROM eps ORDER BY source
"""


TEXT_ORACLES = {
    "epoch_mix_plan": EPOCH_MIX_PLAN_ORACLE,
    "filter_funnel": FILTER_FUNNEL_ORACLE,
    "tfidf_top_terms": TFIDF_TOP_TERMS_ORACLE,
    "unigram_logprob": UNIGRAM_LOGPROB_ORACLE,
    "mix_sample": MIX_SAMPLE_ORACLE,
    "hash_split": HASH_SPLIT_ORACLE,
    "doc_chunks": DOC_CHUNKS_ORACLE,
    "pii_redact": PII_REDACT_ORACLE,
    "winnow_fingerprints": WINNOW_FINGERPRINTS_ORACLE,
    "lang_id_ngram": LANG_ID_NGRAM_ORACLE,
    "bpe_token_stats": BPE_TOKEN_STATS_ORACLE,
    "token_stats": TOKEN_STATS_ORACLE,
    "quality_score": QUALITY_SCORE_ORACLE,
    "lang_id": LANG_ID_ORACLE,
    "doc_fingerprint": DOC_FINGERPRINT_ORACLE,
    "repetition_signals": REPETITION_SIGNALS_ORACLE,
    "source_report": SOURCE_REPORT_ORACLE,
    "stratified_sample": STRATIFIED_SAMPLE_ORACLE,
    "pack_sequences": PACK_SEQUENCES_ORACLE,
    "top_ngrams": TOP_NGRAMS_ORACLE,
}

TEXT_QUERIES = {
    "epoch_mix_plan": epoch_mix_plan,
    "filter_funnel": filter_funnel,
    "tfidf_top_terms": tfidf_top_terms,
    "unigram_logprob": unigram_logprob,
    "mix_sample": mix_sample,
    "hash_split": hash_split,
    "doc_chunks": doc_chunks,
    "pii_redact": pii_redact,
    "winnow_fingerprints": winnow_fingerprints,
    "lang_id_ngram": lang_id_ngram,
    "bpe_token_stats": bpe_token_stats,
    "token_stats": token_stats,
    "quality_score": quality_score,
    "lang_id": lang_id,
    "doc_fingerprint": doc_fingerprint,
    "repetition_signals": repetition_signals,
    "source_report": source_report,
    "stratified_sample": stratified_sample,
    "pack_sequences": pack_sequences,
    "top_ngrams": top_ngrams,
}


# ---------------------------------------------------------------------------
# Weighted sampling and vocabulary growth
# ---------------------------------------------------------------------------

SAMPLE_N = 100


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006, the A-ES one-pass scheme): each doc gets key
    ``ln(u)/w`` with weight w = ``n_chars`` and u a uniform (0,1] drawn
    from the portable 60-bit md5 hash of its id; the SAMPLE_N largest
    keys win. The standard way to length/quality-weight a training-mix
    draw reproducibly — rerunning selects the same docs, and the weights
    bias selection exactly proportionally.

    Scale shape: key computation is row-local; the top-N is
    ``orderBy(...).limit(n)``, which Spark plans as
    TakeOrderedAndProject — per-partition partial top-N then a single
    merge of n-row heaps, never a global sort. Deterministic u means the
    oracle replays the identical draw."""
    docs = load_table(spark, sf_dir, "documents")
    u = (md5h("cast(doc_id as string)") + F.lit(1)).cast("double") / F.lit(
        float(1 << 60)
    )
    key = F.log(u) / F.col("n_chars").cast("double")
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").alias("weight"),
            F.round(key, ROUND).alias("sample_key"),
            key.alias("_k"),
        )
        .orderBy(F.col("_k").desc(), "doc_id")
        .limit(SAMPLE_N)
        .select("doc_id", "weight", "sample_key")
        .orderBy("doc_id")
    )


_U_SQL = (
    "((" + MD5H_SQL_TEMPLATE.format(expr="cast(doc_id AS VARCHAR)")
    + " + 1) / 1152921504606846976.0)"
)

WEIGHTED_SAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, n_chars AS weight, ln({_U_SQL}) / n_chars AS k
  FROM documents),
top AS (
  SELECT doc_id, weight, round(k, {ROUND}) AS sample_key
  FROM keyed ORDER BY k DESC, doc_id LIMIT {SAMPLE_N})
SELECT doc_id, weight, sample_key FROM top ORDER BY doc_id
"""


def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve: per doc in id order, how
    many never-before-seen token types it introduces and the cumulative
    vocabulary size — the corpus-health view that shows when additional
    data stops contributing new types.

    Scale shape: the one real shuffle is the min-doc-per-token hash
    aggregate (vocabulary-sized, with map-side partial min); the prefix
    sum then runs over the per-doc spine, which is |docs| rows — tiny
    after aggregation. (At extreme spine sizes the single-partition
    cumulative window becomes chunked partial sums + broadcast offsets;
    at any realistic doc count the aggregated spine fits one task.)"""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    first = (
        docs.select("doc_id", F.explode(F.array_distinct("tokens")).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    new_per_doc = first.groupBy("first_doc").agg(
        F.count(F.lit(1)).alias("new_tokens")
    )
    from pyspark.sql import Window as W

    win = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    return (
        docs.select("doc_id")
        .join(new_per_doc, F.col("doc_id") == F.col("first_doc"), "left")
        .select(
            "doc_id",
            F.coalesce("new_tokens", F.lit(0)).alias("new_tokens"),
        )
        .withColumn("vocab_size", F.sum("new_tokens").over(win))
        .orderBy("doc_id")
    )


VOCAB_GROWTH_ORACLE = f"""
WITH tok AS (SELECT doc_id, {TOKENS_SQL} AS tokens FROM documents),
firsts AS (
  SELECT t, min(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest(list_distinct(tokens)) AS t FROM tok)
  GROUP BY t),
npd AS (SELECT first_doc, count(*) AS new_tokens FROM firsts
        GROUP BY first_doc)
SELECT d.doc_id,
       coalesce(n.new_tokens, 0) AS new_tokens,
       CAST(sum(coalesce(n.new_tokens, 0))
            OVER (ORDER BY d.doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS vocab_size
FROM documents d LEFT JOIN npd n ON d.doc_id = n.first_doc
ORDER BY doc_id
"""

TEXT_QUERIES["weighted_sample"] = weighted_sample
TEXT_ORACLES["weighted_sample"] = WEIGHTED_SAMPLE_ORACLE
TEXT_QUERIES["vocab_growth"] = vocab_growth
TEXT_ORACLES["vocab_growth"] = VOCAB_GROWTH_ORACLE


def entropy_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy quality signals, entirely row-local: token entropy
    (over the doc's own token distribution — low for boilerplate/repeated
    text, high for diverse prose) and letter entropy (over a-z counts —
    catches base64 blobs and keyboard mash). A standard cheap feature in
    quality-filter cascades, computed with zero shuffles: per-token
    counts come from higher-order array functions over the row's own
    tokens, letter counts from 26 fused regexp_count columns, all
    whole-stage codegen."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"), fan=True)
    n = F.size("tokens")
    tok_ent = F.expr(
        "aggregate(transform(array_distinct(tokens), "
        "t -> size(filter(tokens, x -> x = t))), cast(0.0 as double), "
        "(acc, c) -> acc - (c / cast(size(tokens) as double)) "
        "* ln(c / cast(size(tokens) as double)))"
    )
    letters = "abcdefghijklmnopqrstuvwxyz"
    # count via length-of-replace (plain byte scan, no regex engine),
    # and MATERIALIZE the counts array + total as real columns before
    # the entropy fold: a lambda that references the raw expressions
    # re-evaluates them per array element (the r3 audit measured the
    # inlined form at 676 text scans per row — 38 s at sf0.1; this
    # shape is 26 scans and runs in ~2 s)
    counts = F.array(*[
        F.expr(f"length(text) - length(replace(text, '{ch}', ''))")
        for ch in letters
    ])
    staged = docs.select(
        "doc_id",
        n.alias("n_tokens"),
        # coalesce: a NULL-text row folds to NULL while the oracle's
        # list_aggregate coalesce scores it 0.0 — the same "no tokens,
        # zero entropy" policy as the empty document (r9 nulls sweep)
        F.coalesce(F.round(tok_ent, ROUND), F.lit(0.0)).alias(
            "token_entropy"
        ),
        counts.alias("_lc"),
    ).withColumn(
        "_lt", F.aggregate(F.col("_lc"), F.lit(0), lambda a, c: a + c)
    )
    let_ent = F.aggregate(
        F.col("_lc"),
        F.lit(0.0).cast("double"),
        lambda acc, c: acc - F.when(
            c > 0,
            (c / F.col("_lt").cast("double"))
            * F.log(c / F.col("_lt").cast("double")),
        ).otherwise(F.lit(0.0)),
    )
    return (
        staged.select(
            "doc_id",
            "n_tokens",
            "token_entropy",
            F.round(let_ent, ROUND).alias("letter_entropy"),
        )
        .orderBy("doc_id")
    )


_LETTER_COUNTS_SQL = ", ".join(
    f"(length(text) - length(replace(text, '{ch}', '')))"
    for ch in "abcdefghijklmnopqrstuvwxyz"
)

ENTROPY_SIGNALS_ORACLE = f"""
WITH tok AS (SELECT doc_id, text, {TOKENS_SQL} AS tokens FROM documents),
base AS (
  SELECT doc_id,
         len(tokens) AS n_tokens,
         -- coalesce: list_aggregate('sum') is NULL on an empty list,
         -- while the Spark side's aggregate() returns its 0.0 seed — a
         -- zero-token document must score 0.0 in both engines
         coalesce(list_aggregate(
           list_transform(list_distinct(tokens),
             t -> -(len(list_filter(tokens, x -> x = t)) * 1.0 / len(tokens))
                  * ln(len(list_filter(tokens, x -> x = t)) * 1.0
                       / len(tokens))),
           'sum'), 0.0) AS tok_ent,
         [{_LETTER_COUNTS_SQL}] AS lc
  FROM tok),
lett AS (
  SELECT doc_id, n_tokens, tok_ent,
         coalesce(list_aggregate(list_transform(lc,
           c -> CASE WHEN c > 0 THEN
                  -(c * 1.0 / list_aggregate(lc, 'sum'))
                  * ln(c * 1.0 / list_aggregate(lc, 'sum'))
                ELSE 0.0 END), 'sum'), 0.0) AS let_ent
  FROM base)
SELECT doc_id, n_tokens,
       round(tok_ent, {ROUND}) AS token_entropy,
       round(let_ent, {ROUND}) AS letter_entropy
FROM lett ORDER BY doc_id
"""

TEXT_QUERIES["entropy_signals"] = entropy_signals
TEXT_ORACLES["entropy_signals"] = ENTROPY_SIGNALS_ORACLE


def quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-score calibration: each doc's raw quality score
    is mapped to its percent-rank WITHIN its source — the standard fix
    for cross-source score drift (a 0.6 from a clean feed and a 0.6 from
    a noisy feed mean different things; per-source ranks make a global
    keep-top-X% threshold fair across feeds).

    Scale shape: the raw scores are row-local (``quality_score``); the
    calibration is one window keyed on source — a single hash exchange
    partitioned by feed, each feed ranked independently in parallel.
    Rank ties (identical scores) get identical percentiles in both
    engines by percent_rank's definition."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    scored = quality_score(spark, sf_dir).select("doc_id", "quality")
    w = W.partitionBy("source").orderBy("quality", "doc_id")
    return (
        docs.join(scored, "doc_id")
        .withColumn(
            "calibrated", _round6_scaled(F.percent_rank().over(w))
        )
        .select("doc_id", "source", "quality", "calibrated")
        .orderBy("doc_id")
    )


QUALITY_CALIBRATION_ORACLE = f"""
WITH tok AS (SELECT doc_id, text, source, {TOKENS_SQL} AS tokens
             FROM documents),
feats AS (
  SELECT doc_id, source,
         len(list_filter(tokens, t -> list_contains({_STOP_LIST_SQL}, t))) * 1.0
           / len(tokens) AS stop_ratio,
         length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0
           / length(text) AS alpha_ratio,
         least(1.0, len(tokens) / 100.0) AS len_sat
  FROM tok),
scored AS (
  SELECT doc_id, source,
         {_ROUND6_SQL.format(
             expr="0.4 * len_sat + 0.3 * stop_ratio + 0.3 * alpha_ratio")}
           AS quality
  FROM feats)
SELECT doc_id, source, quality,
       {_ROUND6_SQL.format(
           expr="percent_rank() OVER (PARTITION BY source "
                "ORDER BY quality, doc_id)")}
         AS calibrated
FROM scored ORDER BY doc_id
"""

TEXT_QUERIES["quality_calibration"] = quality_calibration
TEXT_ORACLES["quality_calibration"] = QUALITY_CALIBRATION_ORACLE


def bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram-LM perplexity per document: mean −ln P(wᵢ|wᵢ₋₁)
    with MLE probabilities C(wᵢ₋₁wᵢ)/C(wᵢ₋₁) from the corpus's own
    counts (every doc bigram occurs in the corpus, so no smoothing is
    needed), plus exp of it as perplexity — the step up from
    ``unigram_logprob`` that catches token-salad where every word is
    common but no transition is.

    Scale shape: bigram and unigram count tables are corpus-level
    aggregates joined back on the gram/token key (vocabulary-sized,
    broadcast-able at scale); the per-doc rollup is one doc-keyed hash
    aggregate. All JVM built-ins."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    bg = (
        with_grams(docs, 2, "bigrams")
        .select("doc_id", F.explode("bigrams").alias("gram"))
    )
    bg_counts = bg.groupBy("gram").agg(F.count(F.lit(1)).alias("bg_cnt"))
    uni = (
        docs.select(F.explode("tokens").alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("uni_cnt"))
    )
    scored = (
        bg.join(bg_counts, "gram")
        .withColumn("prev", F.split("gram", " ")[0])
        .join(uni, F.col("prev") == F.col("token"))
        .withColumn("nll", -F.log(F.col("bg_cnt") / F.col("uni_cnt")))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
            F.round(F.exp(F.avg("nll")), 6).alias("perplexity"),
        )
        .orderBy("doc_id")
    )


BIGRAM_PERPLEXITY_ORACLE = f"""
WITH tok AS (SELECT doc_id, {TOKENS_SQL} AS tokens FROM documents),
bg AS (SELECT doc_id, unnest({_grams_sql(2)}) AS gram FROM tok),
bgc AS (SELECT gram, count(*) AS bg_cnt FROM bg GROUP BY gram),
uni AS (SELECT t AS token, count(*) AS uni_cnt
        FROM (SELECT unnest(tokens) AS t FROM tok) GROUP BY t),
scored AS (
  SELECT bg.doc_id,
         -ln(bgc.bg_cnt * 1.0 / uni.uni_cnt) AS nll
  FROM bg
  JOIN bgc ON bg.gram = bgc.gram
  JOIN uni ON string_split(bg.gram, ' ')[1] = uni.token)
SELECT doc_id, count(*) AS n_bigrams,
       round(avg(nll), 6) AS avg_nll,
       round(exp(avg(nll)), 6) AS perplexity
FROM scored GROUP BY doc_id ORDER BY doc_id
"""

TEXT_QUERIES["bigram_perplexity"] = bigram_perplexity
TEXT_ORACLES["bigram_perplexity"] = BIGRAM_PERPLEXITY_ORACLE


# ---------------------------------------------------------------------------
# PMI collocations (Church & Hanks 1990): association-ranked word pairs
# ---------------------------------------------------------------------------

#: minimum pair frequency — PMI is notoriously noisy on rare pairs
PMI_MIN_COUNT = 5
PMI_TOP_K = 100


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by pointwise mutual information: adjacent word
    pairs ranked by ln(p(x,y) / (p(x)p(y))) over the corpus (Church &
    Hanks 1990) with a min-count floor — the association-strength
    complement to ``top_ngrams`` (frequency) and ``tfidf_top_terms``
    (doc specificity): it surfaces pairs that co-occur far more than
    their token frequencies predict, however rare.

    Scale shape: pair and unigram count tables are corpus-level
    aggregates (vocabulary-sized, broadcast-able); the corpus totals are
    a one-row broadcast. The PMI expression is written with the SAME
    operation order in both engines, so the doubles are bitwise equal
    and the top-k cut is stable. Top-k via orderBy+limit plans as
    TakeOrderedAndProject — no global sort materializes.
    """
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    bg = with_grams(docs, 2, "bigrams").select(
        F.explode("bigrams").alias("gram")
    )
    pair_all = bg.groupBy("gram").agg(F.count(F.lit(1)).alias("n_pair"))
    m_row = pair_all.agg(F.sum("n_pair").alias("m_bigrams"))
    uni = (
        docs.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_tok"))
    )
    n_row = uni.agg(F.sum("n_tok").alias("n_tokens"))
    pairs = (
        pair_all.where(F.col("n_pair") >= PMI_MIN_COUNT)
        .withColumn("tok_a", F.split("gram", " ")[0])
        .withColumn("tok_b", F.split("gram", " ")[1])
        .join(
            uni.select(
                F.col("token").alias("tok_a"), F.col("n_tok").alias("n_a")
            ),
            "tok_a",
        )
        .join(
            uni.select(
                F.col("token").alias("tok_b"), F.col("n_tok").alias("n_b")
            ),
            "tok_b",
        )
        .crossJoin(F.broadcast(m_row))
        .crossJoin(F.broadcast(n_row))
        .withColumn(
            "lift",
            F.expr(
                "CAST(n_pair * n_tokens * n_tokens AS DOUBLE) / "
                "CAST(m_bigrams * n_a * n_b AS DOUBLE)"
            ),
        )
    )
    # the compared score is the LIFT p(x,y)/(p(x)p(y)) — PMI's
    # exponential, same ranking — because it stays bitwise identical
    # across engines: both products are exact BIGINTs (< 2^53, so the
    # double conversion is exact) and the single division is correctly
    # rounded IEEE; ln() differs by an ulp between libm and the JVM,
    # and round() half-ups different representations, so neither may
    # touch the compared value. floor(x*1e6)/1e6 quantizes
    # deterministically.
    return (
        pairs.select(
            "tok_a", "tok_b", "n_pair", "n_a", "n_b",
            (F.floor(F.col("lift") * 1e6) / 1e6).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "tok_a", "tok_b")
        .limit(PMI_TOP_K)
    )


PMI_COLLOCATIONS_ORACLE = f"""
WITH tok AS (SELECT doc_id, {TOKENS_SQL} AS tokens FROM documents),
bg AS (SELECT unnest({_grams_sql(2)}) AS gram FROM tok),
pair_all AS (SELECT gram, count(*) AS n_pair FROM bg GROUP BY gram),
m AS (SELECT CAST(sum(n_pair) AS BIGINT) AS m_bigrams FROM pair_all),
uni AS (SELECT t AS token, count(*) AS n_tok
        FROM (SELECT unnest(tokens) AS t FROM tok) GROUP BY t),
n AS (SELECT CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM uni),
pairs AS (
  SELECT string_split(gram, ' ')[1] AS tok_a,
         string_split(gram, ' ')[2] AS tok_b,
         n_pair
  FROM pair_all WHERE n_pair >= {PMI_MIN_COUNT})
SELECT p.tok_a, p.tok_b, p.n_pair,
       ua.n_tok AS n_a, ub.n_tok AS n_b,
       floor(CAST(p.n_pair * n.n_tokens * n.n_tokens AS DOUBLE) /
             CAST(m.m_bigrams * ua.n_tok * ub.n_tok AS DOUBLE) * 1e6)
         / 1e6 AS lift
FROM pairs p
JOIN uni ua ON p.tok_a = ua.token
JOIN uni ub ON p.tok_b = ub.token
CROSS JOIN m CROSS JOIN n
ORDER BY lift DESC, p.tok_a, p.tok_b
LIMIT {PMI_TOP_K}
"""

TEXT_QUERIES["pmi_collocations"] = pmi_collocations
TEXT_ORACLES["pmi_collocations"] = PMI_COLLOCATIONS_ORACLE


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (Robertson-Sparck Jones / Okapi)
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
#: fixed query vocabulary — scoring is per fixed term so the final score
#: is a FIXED-ORDER sum of three doubles, identical in both engines
BM25_QUERY_TERMS = ("spark", "query", "data")
BM25_TOP_K = 20


def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 document scoring for a fixed query — the classic
    retrieval ranking (and the lexical side of every RAG/hybrid-search
    pipeline): idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) summed
    over query terms.

    Scale shape: tf comes from one doc-keyed aggregate over the
    (corpus-sized but aggregated) token explode; df and avgdl are
    vocabulary-/one-row-sized broadcasts. Determinism: per-term scores
    pivot into FIXED columns so the final sum adds doubles in a fixed
    order; the compared score is floor-quantized because idf's ln()
    differs by an ulp between engines (same convention as
    ``pmi_collocations``). Top-k plans as TakeOrderedAndProject."""
    docs = with_tokens(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode("tokens").alias("token"),
        F.size("tokens").alias("dl"),
    )
    tf = (
        toks.where(F.col("token").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id", "token", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tab = (
        toks.where(F.col("token").isin(*BM25_QUERY_TERMS))
        .select("doc_id", "token").distinct()
        .groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    )
    corpus = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("tokens")).alias("total_dl"),
    )
    scored = (
        tf.join(F.broadcast(df_tab), "token")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "score",
            F.expr(
                f"ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)"
                f" * (tf * ({BM25_K1} + 1.0))"
                f" / (tf + {BM25_K1} * (1.0 - {BM25_B}"
                f" + {BM25_B} * dl / (CAST(total_dl AS DOUBLE) / n_docs)))"
            ),
        )
    )
    per_term = scored.groupBy("doc_id").agg(*[
        F.max(F.when(F.col("token") == t, F.col("score"))).alias(f"s{i}")
        for i, t in enumerate(BM25_QUERY_TERMS)
    ])
    total = (
        F.coalesce(F.col("s0"), F.lit(0.0))
        + F.coalesce(F.col("s1"), F.lit(0.0))
        + F.coalesce(F.col("s2"), F.lit(0.0))
    )
    return (
        per_term.select(
            "doc_id",
            (F.floor(total * 1e6) / 1e6).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOP_K)
    )


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    cols = []
    for i, t in enumerate(BM25_QUERY_TERMS):
        cols.append(
            f"max(CASE WHEN token = '{t}' THEN score END) AS s{i}"
        )
    return f"""
WITH tok AS (SELECT doc_id, {TOKENS_SQL} AS tokens FROM documents),
ex AS (
  SELECT doc_id, unnest(tokens) AS token, len(tokens) AS dl FROM tok),
tf AS (
  SELECT doc_id, token, dl, count(*) AS tf
  FROM ex WHERE token IN ({terms})
  GROUP BY doc_id, token, dl),
dft AS (
  SELECT token, count(DISTINCT doc_id) AS df
  FROM ex WHERE token IN ({terms}) GROUP BY token),
corpus AS (
  SELECT count(*) AS n_docs, CAST(sum(len(tokens)) AS BIGINT) AS total_dl
  FROM tok),
scored AS (
  SELECT tf.doc_id, tf.token,
         ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * ({BM25_K1} + 1.0))
           / (tf + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * dl / (CAST(total_dl AS DOUBLE) / n_docs)))
           AS score
  FROM tf JOIN dft USING (token) CROSS JOIN corpus),
per_term AS (
  SELECT doc_id, {', '.join(cols)}
  FROM scored GROUP BY doc_id)
SELECT doc_id,
       floor((coalesce(s0, 0.0) + coalesce(s1, 0.0) + coalesce(s2, 0.0))
             * 1e6) / 1e6 AS bm25
FROM per_term
ORDER BY bm25 DESC, doc_id
LIMIT {BM25_TOP_K}
"""


BM25_RETRIEVAL_ORACLE = _bm25_oracle()

TEXT_QUERIES["bm25_retrieval"] = bm25_retrieval
TEXT_ORACLES["bm25_retrieval"] = BM25_RETRIEVAL_ORACLE


# ---------------------------------------------------------------------------
# Evaluation harness: classifier confusion matrix as a query
# ---------------------------------------------------------------------------

def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-evaluation-as-a-query: the confusion matrix of ``lang_id``
    against the corpus's ground-truth ``lang`` label, plus per-true-
    language support and recall — the audit every classifier in a data
    pipeline needs, expressed relationally so it runs at corpus scale
    (a confusion matrix is just a two-key aggregate).

    Scale shape: reuses the row-local scorer, then one (true, pred)
    aggregate with a broadcast per-true support join."""
    preds = lang_id(spark, sf_dir).select("doc_id", "lang_pred")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    cells = (
        docs.join(preds, "doc_id")
        .groupBy(
            F.col("lang").alias("true_lang"),
            F.col("lang_pred").alias("pred_lang"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    support = cells.groupBy("true_lang").agg(
        F.sum("n").alias("support")
    )
    return (
        cells.join(F.broadcast(support), "true_lang")
        .select(
            "true_lang", "pred_lang", "n", "support",
            F.round(
                F.when(
                    F.col("true_lang") == F.col("pred_lang"),
                    F.col("n") / F.col("support").cast("double"),
                ).otherwise(
                    -(F.col("n") / F.col("support").cast("double"))
                ),
                6,
            ).alias("recall_signed"),
        )
        .orderBy("true_lang", "pred_lang")
    )


def _lang_id_confusion_oracle() -> str:
    lang_sql = LANG_ID_ORACLE
    return f"""
WITH preds AS (
  SELECT doc_id, lang_pred FROM ({lang_sql})),
cells AS (
  SELECT d.lang AS true_lang, p.lang_pred AS pred_lang, count(*) AS n
  FROM documents d JOIN preds p USING (doc_id)
  GROUP BY 1, 2),
support AS (
  SELECT true_lang, CAST(sum(n) AS BIGINT) AS support
  FROM cells GROUP BY true_lang)
SELECT c.true_lang, c.pred_lang, c.n, s.support,
       round(CASE WHEN c.true_lang = c.pred_lang
                  THEN c.n / CAST(s.support AS DOUBLE)
                  ELSE -(c.n / CAST(s.support AS DOUBLE)) END, 6)
         AS recall_signed
FROM cells c JOIN support s USING (true_lang)
ORDER BY true_lang, pred_lang
"""


LANG_ID_CONFUSION_ORACLE = _lang_id_confusion_oracle()

TEXT_QUERIES["lang_id_confusion"] = lang_id_confusion
TEXT_ORACLES["lang_id_confusion"] = LANG_ID_CONFUSION_ORACLE


# ---------------------------------------------------------------------------
# Vocabulary coverage curve: corpus coverage of frequency-ranked vocab
# ---------------------------------------------------------------------------

VOCAB_COVERAGE_RANKS = [1, 2, 4, 8, 16, 32, 64]


def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative corpus-token coverage of the frequency-ranked
    vocabulary at doubling rank checkpoints — the curve a tokenizer /
    vocab-truncation decision reads ("the top 4k entries cover 97% of
    tokens"). The complement of ``zipf_token_slope``'s fit: same ranked
    vocab, cumulative-mass view.

    Scale shape: ONE token-keyed map-combinable count aggregate, a
    rank+cumsum window over the vocab-bounded table, then a bounded
    cross join against the 7 checkpoint literals with a conditional
    re-aggregate. Deterministic ordering (count desc, token) and
    integer basis points."""
    from pyspark.sql.window import Window as W

    toks = with_tokens(load_table(spark, sf_dir, "documents")).select(
        F.explode("tokens").alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.orderBy(F.col("cnt").desc(), F.col("token"))
    ranked = vocab.select(
        "cnt",
        F.row_number().over(w).alias("rn"),
        F.sum("cnt").over(
            W.orderBy(F.col("cnt").desc(), F.col("token")).rowsBetween(
                W.unboundedPreceding, 0
            )
        ).alias("cum"),
        F.sum("cnt").over(
            W.orderBy(F.lit(1)).rangeBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("total"),
    )
    ks = spark.createDataFrame(
        [(k,) for k in VOCAB_COVERAGE_RANKS], "k_rank int"
    )
    return (
        ranked.crossJoin(F.broadcast(ks))
        .where(F.col("rn") <= F.col("k_rank"))
        .groupBy("k_rank")
        .agg(
            F.count(F.lit(1)).alias("vocab_used"),
            F.expr("sum(cnt) * 10000 div max(total)").alias("coverage_bp"),
        )
        .orderBy("k_rank")
    )


def _vocab_coverage_oracle() -> str:
    ks = ", ".join(f"({k})" for k in VOCAB_COVERAGE_RANKS)
    return f"""
WITH toks AS (
  SELECT unnest({TOKENS_SQL}) AS token FROM documents),
vocab AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
ranked AS (
  SELECT cnt,
         row_number() OVER (ORDER BY cnt DESC, token) AS rn,
         CAST(sum(cnt) OVER () AS BIGINT) AS total
  FROM vocab),
ks(k_rank) AS (VALUES {ks})
SELECT k_rank,
       CAST(count(*) AS BIGINT) AS vocab_used,
       CAST(sum(cnt) AS BIGINT) * 10000 // max(total) AS coverage_bp
FROM ranked CROSS JOIN ks
WHERE rn <= k_rank
GROUP BY k_rank ORDER BY k_rank
"""


VOCAB_COVERAGE_CURVE_ORACLE = _vocab_coverage_oracle()

TEXT_QUERIES["vocab_coverage_curve"] = vocab_coverage_curve
TEXT_ORACLES["vocab_coverage_curve"] = VOCAB_COVERAGE_CURVE_ORACLE
