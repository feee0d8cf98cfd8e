"""Corpus-curation queries — the end-to-end training-data shapes that
compose the engine's text/dedup/graph operators:

- ``q_train_val_split``: deterministic hash-based splitting (reproducible
  across engines and runs, unlike seeded sampling);
- ``q_token_packing``: greedy token-budget packing of documents into
  training chunks via a running-sum window;
- ``q_corpus_curation``: quality filter -> near-dup cluster survivor
  selection -> kept corpus with stats. The full pre-training data path in
  one declarative plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monster_etl_spark.operators import text as tx
from monster_etl_spark.queries import QuerySpec, load
from monster_etl_spark.queries.dedup_queries import (
    JACCARD_SQL,
    JACCARD_THRESHOLD,
    MAX_SHINGLE_FREQ,
    NGRAM_N,
)

VAL_PCT = 10  # percent of docs in the validation split
TOKEN_BUDGET = 512
QUALITY_MIN = 0.5
PACK_SHARDS = 8  # packing parallelism; at 100 TB set ~= cluster cores

# deterministic split hash: same construction as operators.dedup._hash64
_SPLIT_EXPR = "CAST(CAST(concat('0x', substr(md5(concat('split|', CAST(doc_id AS VARCHAR))), 1, 8)) AS UBIGINT) AS BIGINT)"
_SHARD_EXPR = "CAST(CAST(concat('0x', substr(md5(concat('shard|', CAST(doc_id AS VARCHAR))), 1, 8)) AS UBIGINT) AS BIGINT)"


def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val assignment: bucket = content-independent
    hash of the id, stable under reruns, engine-agnostic, and safely
    disjoint (a seeded Bernoulli sample is none of those across engines)."""
    d = load(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return d.select(
        "doc_id",
        F.when(h % 100 < VAL_PCT, F.lit("val")).otherwise(F.lit("train")).alias("split"),
    )


TRAIN_VAL_SQL = f"""
SELECT doc_id,
       CASE WHEN {_SPLIT_EXPR} % 100 < {VAL_PCT} THEN 'val' ELSE 'train' END AS split
FROM documents
"""


def q_token_packing(
    spark: SparkSession,
    sf_dir: str,
    pack_shards: int = PACK_SHARDS,
    token_budget: int = TOKEN_BUDGET,
) -> DataFrame:
    """Greedy sequence packing, sharded: each document lands in a
    deterministic shard (engine-agnostic md5 hash of the id), the
    running-sum window runs PER SHARD, and (shard, pack_id) is the pack
    key. No global sort — ``pack_shards`` independent window partitions,
    so the plan parallelizes at any scale. ``pack_shards`` and
    ``token_budget`` are per-call knobs (set shards ~ cluster cores at
    100 TB); the registry/oracle contract uses the module defaults."""
    d = load(spark, sf_dir, "documents")
    toks = tx.ws_token_count(F.col("text")).alias("n_tokens")
    shard = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("shard|"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % pack_shards
    ).alias("shard")
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    scored = d.select("doc_id", toks, shard)
    return scored.select(
        "doc_id",
        "n_tokens",
        "shard",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / token_budget).alias("pack_id"),
    )


TOKEN_PACKING_SQL = f"""
SELECT doc_id, n_tokens, shard,
       CAST(floor((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
             / {TOKEN_BUDGET}) AS BIGINT) AS pack_id
FROM (
  SELECT doc_id, {_SHARD_EXPR} % {PACK_SHARDS} AS shard,
         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens
  FROM documents
)
"""


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pass: quality-score filter, then drop every
    non-canonical member of each near-dup cluster (connected components of
    the Jaccard pair graph). Output: kept docs with quality + token count.
    """
    from monster_etl_spark.operators.dedup import ngram_jaccard_pairs
    from monster_etl_spark.operators.graph import connected_components

    from monster_etl_spark.operators.partitioning import spread

    d = load(spark, sf_dir, "documents")
    # spread BEFORE the regex-heavy quality/token projection: on a
    # single-split corpus it otherwise evaluates serially inside the
    # final (1-task) anti-join stage — measured 0.5 s at sf0.1
    # (round-11; no-op at scale)
    scored = spread(d).select(
        "doc_id",
        tx.quality_score(F.col("text")).alias("quality"),
        tx.ws_token_count(F.col("text")).alias("n_tokens"),
    ).filter(F.col("quality") >= QUALITY_MIN)

    pairs = ngram_jaccard_pairs(
        d,
        "doc_id",
        "text",
        n=NGRAM_N,
        threshold=JACCARD_THRESHOLD,
        max_shingle_freq=MAX_SHINGLE_FREQ,
    )
    comps = connected_components(pairs)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return scored.join(losers, "doc_id", "left_anti")


CURATION_SQL = f"""
WITH RECURSIVE jp AS ({JACCARD_SQL}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM jp
  UNION
  SELECT doc_b AS a, doc_a AS b FROM jp
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
losers AS (
  SELECT a AS doc_id FROM reach GROUP BY a HAVING least(a, MIN(b)) != a
),
toks AS (
  SELECT doc_id,
    round((
      least(len(regexp_split_to_array(lower(trim(text)), '\\s+')) / 64.0, 1.0)
      + least((len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                               x -> x IN ({", ".join(f"'{w}'" for w in tx.QUALITY_STOPWORDS)})))
               / nullif(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 0)) * 4, 1.0)
      + (1.0 - least(((length(text) - length(regexp_replace(text, '{tx.PUNCT_CLASS.replace("'", "''")}', '', 'g')))
                      / nullif(CAST(length(text) AS DOUBLE), 0)) * 4, 1.0))
    ) / 3, 6) AS quality,
    len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens
  FROM documents
)
SELECT doc_id, quality, n_tokens FROM toks
WHERE quality >= {QUALITY_MIN}
  AND doc_id NOT IN (SELECT doc_id FROM losers)
"""




def q_quality_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection: inside every near-dup cluster
    keep the HIGHEST-quality member (ties -> lowest id), not the lowest
    id — the curation-grade dedup rule (min-id keeps whichever copy
    happened to be crawled first; this keeps the cleanest copy). One row
    per multi-member cluster: (cluster, survivor_id, n_members,
    best_quality). The per-cluster window runs on CC output (rows =
    clustered docs only, a small fraction of the corpus), never on the
    full corpus."""
    from monster_etl_spark.operators.dedup import ngram_jaccard_pairs
    from monster_etl_spark.operators.graph import connected_components

    d = load(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        d, "doc_id", "text",
        n=NGRAM_N, threshold=JACCARD_THRESHOLD, max_shingle_freq=MAX_SHINGLE_FREQ,
    )
    from monster_etl_spark.operators.partitioning import spread

    comps = connected_components(pairs)
    # spread: same serial-quality-pass fix as q_corpus_curation
    scored = spread(d).select("doc_id", tx.quality_score(F.col("text")).alias("quality"))
    joined = comps.join(scored, comps.node == scored.doc_id).select(
        F.col("component").alias("cluster"), "node", "quality"
    )
    w = Window.partitionBy("cluster")
    ranked = joined.select(
        "cluster", "node", "quality",
        F.count(F.lit(1)).over(w).alias("n_members"),
        F.row_number()
        .over(w.orderBy(F.desc("quality"), F.asc("node")))
        .alias("rn"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "cluster",
        F.col("node").alias("survivor_id"),
        "n_members",
        F.col("quality").alias("best_quality"),
    )


def _quality_survivor_sql() -> str:
    from monster_etl_spark.queries.text_queries import QUALITY_SQL

    return f"""
WITH RECURSIVE jp AS ({JACCARD_SQL}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM jp
  UNION
  SELECT doc_b AS a, doc_a AS b FROM jp
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (SELECT a AS node, least(a, MIN(b)) AS component FROM reach GROUP BY a),
q AS ({QUALITY_SQL}),
ranked AS (
  SELECT c.component AS cluster, c.node, q.quality,
         count(*) OVER (PARTITION BY c.component) AS n_members,
         row_number() OVER (
           PARTITION BY c.component ORDER BY q.quality DESC, c.node ASC
         ) AS rn
  FROM comp c JOIN q ON q.doc_id = c.node
)
SELECT cluster, node AS survivor_id, n_members, quality AS best_quality
FROM ranked WHERE rn = 1
"""


QUERIES = {
    "q_train_val_split": QuerySpec(q_train_val_split, TRAIN_VAL_SQL, "deterministic train/val split"),
    "q_token_packing": QuerySpec(q_token_packing, TOKEN_PACKING_SQL, "token-budget sequence packing"),
    "q_corpus_curation": QuerySpec(q_corpus_curation, CURATION_SQL, "quality + dedup curation pass"),
    "q_quality_survivor": QuerySpec(
        q_quality_survivor, _quality_survivor_sql(),
        "quality-argmax survivor per near-dup cluster"
    ),
}
