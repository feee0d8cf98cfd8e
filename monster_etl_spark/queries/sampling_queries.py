"""Sampling + quantile-gating queries over the documents corpus.

Training-data curation staples: deterministic global and per-stratum
samples (reproducible across engines/cluster layouts — see
``operators/sampling.py`` for the scale plan) and a per-group quantile
filter (keep documents above their language's median quality), the shape
behind "top-X% by quality per language" corpus gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monster_etl_spark.operators import text as tx
from monster_etl_spark.operators.sampling import (
    reservoir_sample,
    sample_hash_sql,
    stratified_sample,
    stratified_sample_sql,
    weighted_sample,
    weighted_sample_sql,
)
from monster_etl_spark.queries import QuerySpec, load
from monster_etl_spark.queries.text_queries import QUALITY_SQL

RESERVOIR_N = 50
STRATUM_N = 10
QUANTILE = 0.5


def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global deterministic 50-document sample (lowest content hashes)."""
    d = load(spark, sf_dir, "documents")
    return reservoir_sample(d, RESERVOIR_N, "doc_id").select("doc_id", "lang", "source")


SAMPLE_RESERVOIR_SQL = f"""
SELECT doc_id, lang, source
FROM documents
ORDER BY {sample_hash_sql('doc_id')} ASC, doc_id ASC
LIMIT {RESERVOIR_N}
"""


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota per-language sample: 10 lowest-hash docs per lang."""
    d = load(spark, sf_dir, "documents")
    return stratified_sample(d, ["lang"], STRATUM_N, "doc_id").select(
        "doc_id", "lang", "sample_rank"
    )


SAMPLE_STRATIFIED_SQL = stratified_sample_sql(
    "documents", ["lang"], STRATUM_N, "doc_id", ["doc_id", "lang"]
)


def q_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile filter: keep documents whose quality score is >=
    their language's median. Exact interpolated percentile per group
    (map-side-combinable partial agg via Spark's percentile; one shuffle
    on lang), joined back as the gate — never a global sort. The quality
    score is rounded (6dp) upstream so the cross-engine median and the
    >= comparison bit-agree."""
    d = load(spark, sf_dir, "documents")
    scored = d.select("doc_id", "lang", tx.quality_score(F.col("text")).alias("quality"))
    med = scored.groupBy("lang").agg(
        F.expr(f"percentile(quality, {QUANTILE})").alias("q_med")
    )
    # 7dp, not 6: an even-count median is the AVG of two 6dp-rounded
    # qualities, i.e. a value ON the 5e-7 grid — round(·, 6) of it is a
    # literal half tie (round-10 tie sweep: lang 'fr' at sf0.1,
    # 0.7059505), where Spark (shortest-repr HALF_UP) and DuckDB
    # (binary-value) disagree. At 7dp every reachable median is grid-
    # exact, so no engine ever sees a tie.
    return (
        scored.join(med, on="lang")
        .filter(F.col("quality") >= F.col("q_med"))
        .select("doc_id", "lang", "quality", F.round("q_med", 7).alias("lang_median"))
    )


QUANTILE_GATE_SQL = f"""
WITH scored AS (
  SELECT s.doc_id, d.lang, s.quality
  FROM ({QUALITY_SQL}) s JOIN documents d USING (doc_id)
),
med AS (
  SELECT lang, percentile_cont({QUANTILE}) WITHIN GROUP (ORDER BY quality) AS q_med
  FROM scored GROUP BY lang
)
SELECT doc_id, lang, quality, round(q_med, 7) AS lang_median
FROM scored JOIN med USING (lang)
WHERE quality >= q_med
"""



WEIGHTED_N = 50


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic sample (Efraimidis-Spirakis race,
    operators/sampling.py::weighted_sample): longer documents are
    proportionally likelier to win — the "sample tokens, not documents"
    shape used when balancing a training mixture by token mass. Weight =
    BPE-ish token count (exact integer, bit-identical cross-engine);
    docs with zero tokens are excluded by the race contract (w > 0)."""
    d = load(spark, sf_dir, "documents")
    weighted = d.select(
        "doc_id", "lang", tx.bpe_token_count(F.col("text")).alias("w_tokens")
    )
    return weighted_sample(weighted, WEIGHTED_N, "doc_id", "w_tokens")


SAMPLE_WEIGHTED_SQL = weighted_sample_sql(
    f"""(SELECT doc_id, lang,
        len(regexp_extract_all(text, '{tx.BPE_TOKEN_RE}')) AS w_tokens
        FROM documents)""",
    WEIGHTED_N,
    "doc_id",
    "w_tokens",
    projection="doc_id, lang, w_tokens",
)



NORM_P_LO, NORM_P_HI = 0.05, 0.95


def q_quality_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language winsorized min-max normalization of the quality score:
    clip to the language's [p5, p95] band, scale to [0, 1]. The standard
    robust feature-scaling pass before mixing corpora whose score
    distributions differ. One exact-percentile aggregate per language
    (map-side combinable) joined back — same shape as the quantile gate,
    no global sort. Degenerate bands (p5 == p95) normalize to 0.5 on
    both engines."""
    d = load(spark, sf_dir, "documents")
    scored = d.select("doc_id", "lang", tx.quality_score(F.col("text")).alias("quality"))
    bands = scored.groupBy("lang").agg(
        F.expr(f"percentile(quality, {NORM_P_LO})").alias("p_lo"),
        F.expr(f"percentile(quality, {NORM_P_HI})").alias("p_hi"),
    )
    clipped = F.least(F.greatest(F.col("quality"), F.col("p_lo")), F.col("p_hi"))
    norm = F.when(F.col("p_hi") == F.col("p_lo"), F.lit(0.5)).otherwise(
        (clipped - F.col("p_lo")) / (F.col("p_hi") - F.col("p_lo"))
    )
    return scored.join(bands, "lang").select(
        "doc_id",
        "lang",
        "quality",
        F.round(norm, 6).alias("quality_norm"),
    )


QUALITY_NORMALIZE_SQL = f"""
WITH scored AS (
  SELECT s.doc_id, d.lang, s.quality
  FROM ({QUALITY_SQL}) s JOIN documents d USING (doc_id)
),
bands AS (
  SELECT lang,
         percentile_cont({NORM_P_LO}) WITHIN GROUP (ORDER BY quality) AS p_lo,
         percentile_cont({NORM_P_HI}) WITHIN GROUP (ORDER BY quality) AS p_hi
  FROM scored GROUP BY lang
)
SELECT doc_id, lang, quality,
       round(CASE WHEN p_hi = p_lo THEN 0.5
                  ELSE (least(greatest(quality, p_lo), p_hi) - p_lo) / (p_hi - p_lo)
             END, 6) AS quality_norm
FROM scored JOIN bands USING (lang)
"""


QUERIES = {
    "sample_reservoir": QuerySpec(
        sample_reservoir, SAMPLE_RESERVOIR_SQL, "deterministic global top-n-by-hash sample"
    ),
    "sample_stratified": QuerySpec(
        sample_stratified, SAMPLE_STRATIFIED_SQL, "exact-quota per-stratum sample"
    ),
    "sample_weighted": QuerySpec(
        sample_weighted, SAMPLE_WEIGHTED_SQL, "token-mass-weighted E-S race sample"
    ),
    "q_quantile_gate": QuerySpec(
        q_quantile_gate, QUANTILE_GATE_SQL, "per-language median quality gate"
    ),
    "q_quality_normalize": QuerySpec(
        q_quality_normalize, QUALITY_NORMALIZE_SQL, "winsorized per-language min-max scaling"
    ),
}


TEMP_TOTAL = 60
TEMP_TAU = 0.5


def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rescaled corpus resampling (tau = 0.5): per-language
    quotas proportional to count^tau (largest-remainder apportionment,
    integer-exact cross-engine), then each language's quota lowest-hash
    documents. The multilingual rebalancing pass (mBERT/XLM-R style) that
    upweights rare languages without replacement. Quota math runs on
    #langs rows; the corpus pass is the same prefilter + bounded window
    as ``sample_stratified`` — no stratum ever funnels through one task.
    """
    from monster_etl_spark.operators.sampling import quota_sample, temperature_quotas

    d = load(spark, sf_dir, "documents")
    q = temperature_quotas(d, ["lang"], TEMP_TOTAL, TEMP_TAU)
    return quota_sample(d, q, ["lang"], "doc_id").select(
        "doc_id", "lang", "stratum_rows", "quota", "sample_rank"
    )


def _sample_temperature_sql() -> str:
    from monster_etl_spark.operators.sampling import (
        DEFAULT_OVERSAMPLE,
        HASH_SPACE,
        sample_hash_sql,
        temperature_quotas_sql,
    )

    tq = temperature_quotas_sql("documents", ["lang"], TEMP_TOTAL, TEMP_TAU)
    h = sample_hash_sql("doc_id")
    return f"""
WITH quotas AS ({tq}),
hashed AS (SELECT doc_id, lang, {h} AS _h FROM documents),
pre AS (
  SELECT hashed.*, stratum_rows, quota
  FROM hashed JOIN quotas USING (lang)
  WHERE _h <= least(CAST({HASH_SPACE - 1} AS DOUBLE),
                    ceil({float(DEFAULT_OVERSAMPLE)} * quota / stratum_rows * {HASH_SPACE}))
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY _h ASC, doc_id ASC) AS sample_rank
  FROM pre
)
SELECT doc_id, lang, stratum_rows, quota, sample_rank
FROM ranked WHERE sample_rank <= quota
"""


SAMPLE_TEMPERATURE_SQL = _sample_temperature_sql()

QUERIES["sample_temperature"] = QuerySpec(
    sample_temperature,
    SAMPLE_TEMPERATURE_SQL,
    "temperature-rescaled (count^0.5) per-language resampling",
)


KFOLDS = 5


def q_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (the cross-validation / sharded-
    eval primitive): fold = content_hash(doc_id) mod k — uniform in
    expectation, reproducible across engines, reruns and partition
    layouts, and stable under corpus growth (a document's fold never
    depends on other rows — unlike round-robin or ntile splits, which
    reshuffle everything when one row is added). Narrow map, no
    shuffle; companion per-fold counts come from one map-side
    combinable aggregate."""
    from monster_etl_spark.operators.sampling import sample_hash

    d = load(spark, sf_dir, "documents")
    fold = (sample_hash(F.col("doc_id"), salt="kfold") % KFOLDS + 1).cast("long")
    return d.select("doc_id", "lang", fold.alias("fold"))


def _kfold_sql() -> str:
    from monster_etl_spark.operators.sampling import sample_hash_sql

    h = sample_hash_sql("doc_id", salt="kfold")
    return f"SELECT doc_id, lang, CAST({h} % {KFOLDS} + 1 AS BIGINT) AS fold FROM documents"


QUERIES["q_kfold_split"] = QuerySpec(
    q_kfold_split, _kfold_sql(), "deterministic hash-based k-fold assignment"
)
