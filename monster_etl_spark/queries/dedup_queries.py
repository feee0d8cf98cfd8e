"""Dedup queries over the documents table, each with a DuckDB oracle that
mirrors the exact hash/shingle/band construction (md5-derived hashes are
identical across engines, so even MinHash/SimHash are hash-checkable —
no rows-only escape hatch needed)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monster_etl_spark.operators import dedup as dd
from monster_etl_spark.queries import QuerySpec, load

JACCARD_THRESHOLD = 0.2
NGRAM_N = 3
# skew guard, engaged by default: shingles present in more docs than this
# carry no dedup signal and create join hot keys at scale (they'd each
# contribute O(freq^2) candidate pairs). At sf0.01 (500 docs) this only
# drops template-level shingles; at 100 TB it is what keeps the inverted
# index join linear.
MAX_SHINGLE_FREQ = 100

# SQL building blocks mirroring operators.dedup (shared constants)
_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"


def _shingles_raw_sql(n: int, source: str = "documents") -> str:
    """(doc, shingle) rows for word n-grams over ``source`` — the gram
    construction is derived from ``n`` so the oracle cannot drift from the
    Spark side's parameterized builder."""
    gram_terms = " || ' ' || ".join(f"{_TOKS}[i+{j}]" for j in range(n))
    return f"""
SELECT doc_id AS doc, unnest(list_distinct(
  list_transform(range(1, len({_TOKS}) - ({n} - 2)),
    i -> {gram_terms})
)) AS shingle
FROM {source}
WHERE len({_TOKS}) >= {n}
"""


_SHINGLES_RAW = _shingles_raw_sql(NGRAM_N)


def _sql_hash64(expr: str, hex_chars: int = 8) -> str:
    # mirror of operators.dedup._hash64
    return (
        f"CAST(CAST(concat('0x', substr(md5({expr}), 1, {hex_chars})) AS UBIGINT) AS BIGINT)"
    )


# (doc, h) hashed shingles with the doc-frequency skew guard applied on the
# HASH via an anti-join against the hot set — the exact mirror of
# operators.dedup._hashed_shingles (rows are distinct per doc, so COUNT(*)
# per hash == doc frequency)
_HASHED_SHINGLES = f"""
WITH sh_raw AS ({_SHINGLES_RAW}),
sh_h AS (SELECT doc, {_sql_hash64('shingle')} AS h FROM sh_raw),
hot AS (SELECT h FROM sh_h GROUP BY h HAVING COUNT(*) > {MAX_SHINGLE_FREQ})
SELECT doc, h FROM sh_h ANTI JOIN hot USING (h)
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.exact_dedup_groups(load(spark, sf_dir, "documents"), "doc_id", "text")


EXACT_SQL = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=NGRAM_N,
        threshold=JACCARD_THRESHOLD,
        max_shingle_freq=MAX_SHINGLE_FREQ,
    )


JACCARD_SQL = f"""
WITH sh AS (SELECT doc, h AS sh FROM ({_HASHED_SHINGLES})),
sizes AS (SELECT doc, COUNT(*) AS n_shingles FROM sh GROUP BY doc),
inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc < b.doc
  GROUP BY a.doc, b.doc
)
SELECT doc_a, doc_b,
       round(inter / (sa.n_shingles + sb.n_shingles - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc = doc_a
JOIN sizes sb ON sb.doc = doc_b
WHERE round(inter / (sa.n_shingles + sb.n_shingles - inter), 6) >= {JACCARD_THRESHOLD}
"""


def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.minhash_signatures(
        load(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=NGRAM_N,
        max_shingle_freq=MAX_SHINGLE_FREQ,
    )


def _minhash_sig_sql() -> str:
    mins = ",\n  ".join(
        f"MIN(({a} * h + {b}) % {dd.MINHASH_PRIME}) AS mh{i}"
        for i, (a, b) in enumerate(dd.MINHASH_AB[: dd.MINHASH_PERMS])
    )
    return (
        f"WITH hashed AS ({_HASHED_SHINGLES})\n"
        f"SELECT doc,\n  {mins}\nFROM hashed GROUP BY doc"
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.minhash_lsh_pairs(
        load(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=NGRAM_N,
        max_shingle_freq=MAX_SHINGLE_FREQ,
    )


def _minhash_lsh_sql() -> str:
    n_bands = dd.MINHASH_PERMS // dd.MINHASH_BAND_SIZE
    band_exprs = ", ".join(
        "concat_ws(':', "
        + f"{bi}, "
        + ", ".join(f"mh{bi * dd.MINHASH_BAND_SIZE + j}" for j in range(dd.MINHASH_BAND_SIZE))
        + ")"
        for bi in range(n_bands)
    )
    return f"""
WITH sigs AS ({_minhash_sig_sql()}),
buckets AS (SELECT doc, unnest([{band_exprs}]) AS bucket FROM sigs)
SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc < b.doc
"""


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.simhash_pairs(load(spark, sf_dir, "documents"), "doc_id", "text")


def _simhash_sql() -> str:
    bits, chunks = dd.SIMHASH_BITS, dd.SIMHASH_CHUNKS
    chunk_bits = bits // chunks
    mask = (1 << chunk_bits) - 1
    votes = ",\n  ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}" for i in range(bits)
    )
    sig = " + ".join(f"CASE WHEN v{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END" for i in range(bits))
    chunk_exprs = ", ".join(
        f"concat_ws(':', {ci}, (simhash >> {ci * chunk_bits}) & {mask})" for ci in range(chunks)
    )
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id AS doc, unnest({_TOKS}) AS tok FROM documents
),
hashed AS (SELECT doc, {_sql_hash64('tok', dd.SIMHASH_HEX_CHARS)} AS h FROM toks),
votes AS (SELECT doc,
  {votes}
FROM hashed GROUP BY doc),
sigs AS (SELECT doc, {sig} AS simhash FROM votes),
buckets AS (SELECT doc, simhash, unnest([{chunk_exprs}]) AS bucket FROM sigs)
SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc < b.doc
WHERE bit_count(xor(a.simhash, b.simhash)) <= {chunks - 1}
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components of the Jaccard pair graph,
    labeled by cluster-minimum doc id (iterative min-label propagation on
    the Spark side; a recursive transitive-closure CTE on the oracle side —
    different algorithms, same well-defined result)."""
    from monster_etl_spark.operators.graph import connected_components

    pairs = dd.ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), "doc_id", "text", n=NGRAM_N, threshold=JACCARD_THRESHOLD
    )
    return connected_components(pairs)


CLUSTERS_SQL = f"""
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
)
SELECT a AS node, least(a, MIN(b)) AS component FROM reach GROUP BY a
"""


# decontamination: eval set = every 25th doc, n-grams shorter than the
# dedup shingles (n=5) with >= 2 shared grams flagging a pair
DECONTAM_N = 5
DECONTAM_MIN_SHARED = 2


def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ev = d.filter(d.doc_id % 25 == 0)
    tr = d.filter(d.doc_id % 25 != 0)
    return dd.ngram_contamination(
        tr, ev, "doc_id", "text", n=DECONTAM_N, min_shared=DECONTAM_MIN_SHARED
    )


def _decontam_sql() -> str:
    tr_sh = _shingles_raw_sql(
        DECONTAM_N, "(SELECT * FROM documents WHERE doc_id % 25 <> 0)"
    )
    ev_sh = _shingles_raw_sql(
        DECONTAM_N, "(SELECT * FROM documents WHERE doc_id % 25 = 0)"
    )
    h = _sql_hash64("shingle")
    return f"""
WITH tr AS (SELECT doc, {h} AS h FROM ({tr_sh})),
ev AS (SELECT doc, {h} AS h FROM ({ev_sh}))
SELECT tr.doc AS train_id, ev.doc AS eval_id, COUNT(*) AS shared_ngrams
FROM tr JOIN ev USING (h)
GROUP BY tr.doc, ev.doc
HAVING COUNT(*) >= {DECONTAM_MIN_SHARED}
"""



FUZZY_MAX_DIST = 2
FUZZY_MAX_BLOCK = 500
FUZZY_N_KEYS = 2


def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage shape (operators/dedup.py::fuzzy_pairs) in the
    low-cardinality formulation: the fixture reuses a ~64-name vocabulary
    across SF-many parts, so the scalable plan matches DISTINCT VALUES
    and weights every value pair by its multiplicity (cnt_a x cnt_b
    cross-name, C(cnt,2) same-name) instead of dragging every row through
    the canopy join — the standard trick for fuzzy-matching a
    repeated-value column, turning O(rows-in-block squared) into
    O(values-in-block squared). Blocking/df therefore counts distinct
    values per token. Output: (name_a, name_b, dist, n_pairs), same-name
    dist-0 rows included. Planted-typo recall is pinned in
    tests/test_dedup_guard.py on the raw operator."""
    from monster_etl_spark.operators.dedup import fuzzy_pairs

    vals = (
        load(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    fp = fuzzy_pairs(
        vals, "p_name", "p_name", max_dist=FUZZY_MAX_DIST,
        max_block=FUZZY_MAX_BLOCK, n_keys=FUZZY_N_KEYS,
    )
    cnts = vals.select("p_name", "cnt")
    cross = (
        fp.join(
            cnts.withColumnRenamed("p_name", "id_a").withColumnRenamed("cnt", "cnt_a"),
            "id_a",
        )
        .join(
            cnts.withColumnRenamed("p_name", "id_b").withColumnRenamed("cnt", "cnt_b"),
            "id_b",
        )
        .select(
            F.col("id_a").alias("name_a"),
            F.col("id_b").alias("name_b"),
            "dist",
            (F.col("cnt_a") * F.col("cnt_b")).alias("n_pairs"),
        )
    )
    same = vals.filter(F.col("cnt") >= 2).select(
        F.col("p_name").alias("name_a"),
        F.col("p_name").alias("name_b"),
        F.lit(0).cast("long").alias("dist"),
        (F.col("cnt") * (F.col("cnt") - 1) / 2).cast("long").alias("n_pairs"),
    )
    return cross.unionByName(same)


FUZZY_SQL = f"""
WITH vals AS (SELECT p_name, count(*) AS cnt FROM part GROUP BY p_name),
toks AS (
  SELECT DISTINCT p_name AS rid, p_name AS rtext, unnest(string_split(p_name, ' ')) AS tok
  FROM vals
),
df_t AS (SELECT tok, count(*) AS tok_df FROM toks GROUP BY tok),
ranked AS (
  SELECT rid, rtext, printf('%010d|%s', tok_df, tok) AS bkey,
         row_number() OVER (PARTITION BY rid ORDER BY printf('%010d|%s', tok_df, tok)) AS rn
  FROM toks JOIN df_t USING (tok)
),
keyed AS (SELECT rid, rtext, bkey FROM ranked WHERE rn <= {FUZZY_N_KEYS}),
ok AS (SELECT bkey FROM keyed GROUP BY bkey HAVING count(*) <= {FUZZY_MAX_BLOCK}),
k2 AS (SELECT keyed.* FROM keyed JOIN ok USING (bkey)),
cands AS (
  SELECT DISTINCT a.rid AS name_a, b.rid AS name_b
  FROM k2 a JOIN k2 b ON a.bkey = b.bkey AND a.rid < b.rid
)
SELECT name_a, name_b, CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist,
       ca.cnt * cb.cnt AS n_pairs
FROM cands
JOIN vals ca ON ca.p_name = cands.name_a
JOIN vals cb ON cb.p_name = cands.name_b
WHERE levenshtein(name_a, name_b) <= {FUZZY_MAX_DIST}
UNION ALL
SELECT p_name, p_name, CAST(0 AS BIGINT), CAST(cnt * (cnt - 1) / 2 AS BIGINT)
FROM vals WHERE cnt >= 2
"""


SPAN_W = 8


def dedup_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-span fraction (exact ``SPAN_W``-token substring
    overlap, Lee et al. 2022) — the doc-level curation gate the set-based
    shingle families don't give you."""
    return dd.span_dup_report(
        load(spark, sf_dir, "documents"), "doc_id", "text", span_w=SPAN_W
    )


SPAN_REPORT_SQL = f"""
WITH sh_raw AS ({_shingles_raw_sql(SPAN_W)}),
sh AS (SELECT doc, {_sql_hash64('shingle')} AS h FROM sh_raw),
dfreq AS (SELECT h, count(*) AS n_docs FROM sh GROUP BY h)
SELECT doc AS doc_id, count(*) AS n_spans,
  CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_spans,
  round(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
    AS dup_frac
FROM sh JOIN dfreq USING (h)
GROUP BY doc
"""




SEG_W = 6  # segment width for the sub-document rewrite (tokens)


def dedup_window_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style sub-document dedup WITH reconstruction: globally keep each
    distinct ``SEG_W``-token segment's first occurrence and rebuild the
    cleaned text — the corpus-wide boilerplate-stripping rewrite (where
    ``dedup_span_report`` only scores the overlap)."""
    return dd.window_dedup_rewrite(
        load(spark, sf_dir, "documents"), "doc_id", "text", seg_w=SEG_W
    )


def _window_rewrite_sql() -> str:
    w = SEG_W
    shift = 1 << dd.SEG_POS_BITS
    nseg = f"CAST(ceil(len(toks) / CAST({w} AS DOUBLE)) AS BIGINT)"
    return f"""
WITH base AS (
  SELECT doc_id AS doc, {_TOKS} AS toks FROM documents
),
segs AS (
  SELECT doc, {nseg} AS n_segs, t.s AS pos,
         array_to_string(list_slice(toks, t.s*{w}+1, t.s*{w}+{w}), ' ') AS seg
  FROM base, LATERAL (SELECT unnest(range(0, {nseg})) AS s) t
),
hashed AS (
  SELECT doc, n_segs, pos, seg, {_sql_hash64("'c4seg|' || seg")} AS h FROM segs
),
firsts AS (SELECT h, min(doc*{shift}+pos) AS min_key FROM hashed GROUP BY h),
kept AS (
  SELECT doc, pos, seg FROM hashed JOIN firsts USING (h)
  WHERE doc*{shift}+pos = min_key
),
agg AS (
  SELECT doc, count(*) AS n_kept,
         string_agg(seg, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc
)
SELECT b.doc AS doc_id, {nseg} AS n_segs,
       coalesce(a.n_kept, 0) AS n_kept,
       coalesce(a.clean_text, '') AS clean_text
FROM base b LEFT JOIN agg a ON a.doc = b.doc
"""


QUERIES = {
    "dedup_span_report": QuerySpec(
        dedup_span_report, SPAN_REPORT_SQL, "per-doc duplicated-span fraction (exact substrings)"
    ),
    "dedup_window_rewrite": QuerySpec(
        dedup_window_rewrite, _window_rewrite_sql(),
        "C4-style sub-document dedup with text reconstruction"
    ),
    "dedup_exact": QuerySpec(dedup_exact, EXACT_SQL, "exact content-hash dedup"),
    "dedup_decontaminate": QuerySpec(
        dedup_decontaminate, _decontam_sql(), "train/eval n-gram decontamination"
    ),
    "dedup_ngram_jaccard": QuerySpec(dedup_ngram_jaccard, JACCARD_SQL, "n-gram Jaccard pairs"),
    "dedup_minhash_signatures": QuerySpec(
        dedup_minhash_signatures, _minhash_sig_sql(), "MinHash signatures"
    ),
    "dedup_minhash_lsh": QuerySpec(dedup_minhash_lsh, _minhash_lsh_sql(), "MinHash-LSH candidate pairs"),
    "dedup_simhash": QuerySpec(dedup_simhash_pairs, _simhash_sql(), "SimHash near-dup pairs"),
    "dedup_clusters": QuerySpec(dedup_clusters, CLUSTERS_SQL, "near-dup connected components"),
    "dedup_fuzzy_names": QuerySpec(
        dedup_fuzzy_names, FUZZY_SQL, "multi-key canopy + levenshtein linkage over distinct values"
    ),
}


def dedup_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix (operators/dedup.py
    ``contamination_matrix``): per unordered source pair, the count of
    shared distinct shingle hashes and the containment ratio vs the
    smaller side — the corpus-level audit ("which crawls leak into which
    sources") generalizing train/eval decontamination. Same guarded
    shingle index as every dedup family; the pair meet is an equi-join
    on the hash, per-hash work bounded by the source count squared."""
    from monster_etl_spark.operators.dedup import contamination_matrix

    d = load(spark, sf_dir, "documents")
    return contamination_matrix(
        d, "doc_id", "text", "source", n=NGRAM_N, max_shingle_freq=MAX_SHINGLE_FREQ
    )


DEDUP_CONTAMINATION_SQL = f"""
WITH hs AS ({_HASHED_SHINGLES}),
gh AS (
  SELECT DISTINCT d.source AS grp, hs.h
  FROM hs JOIN documents d ON hs.doc = d.doc_id
),
sizes AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_hashes FROM gh GROUP BY grp),
shared AS (
  SELECT a.grp AS group_a, b.grp AS group_b, CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM gh a JOIN gh b ON a.h = b.h AND a.grp < b.grp
  GROUP BY 1, 2
)
SELECT group_a, group_b, n_shared,
       round(n_shared / CAST(least(sa.n_hashes, sb.n_hashes) AS DOUBLE), 6) AS containment
FROM shared
JOIN sizes sa ON sa.grp = group_a
JOIN sizes sb ON sb.grp = group_b
"""

QUERIES["dedup_contamination_matrix"] = QuerySpec(
    dedup_contamination_matrix,
    DEDUP_CONTAMINATION_SQL,
    "cross-source shingle contamination matrix",
)


MINHASH_EST_MAE_BOUND = 0.25  # mean |est - exact| bound for 8 perms


def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash accuracy contract (the sketch-error pattern of
    q_approx_distinct / knn_*_recall): over the exact >=0.2-Jaccard
    pairs, estimate Jaccard as matching-permutation fraction from the
    8-perm signatures and assert the mean absolute error stays under
    0.25 (k=8 is a bands-and-buckets candidate generator, not a precise
    estimator — binomial sd alone is ~0.17 at J=0.5; the contract
    guards the ESTIMATOR's unbiasedness, the pair recall is guarded by
    dedup_minhash_lsh). One row: (n_pairs, mean_abs_err, estimator_ok),
    all from vocabulary-bounded joins that mirror the candidate path."""
    import pyspark.sql.functions as SF

    sigs = dd.minhash_signatures(
        load(spark, sf_dir, "documents"), "doc_id", "text",
        n=NGRAM_N, max_shingle_freq=MAX_SHINGLE_FREQ,
    )
    exact = dd.ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), "doc_id", "text",
        n=NGRAM_N, threshold=JACCARD_THRESHOLD, max_shingle_freq=MAX_SHINGLE_FREQ,
    )
    sa = sigs.select(SF.col("doc").alias("doc_a"), *[SF.col(f"mh{i}").alias(f"a{i}") for i in range(dd.MINHASH_PERMS)])
    sb = sigs.select(SF.col("doc").alias("doc_b"), *[SF.col(f"mh{i}").alias(f"b{i}") for i in range(dd.MINHASH_PERMS)])
    matches = sum(
        (SF.when(SF.col(f"a{i}") == SF.col(f"b{i}"), 1).otherwise(0) for i in range(dd.MINHASH_PERMS)),
        start=SF.lit(0),
    )
    est = matches.cast("double") / dd.MINHASH_PERMS
    joined = exact.join(sa, "doc_a").join(sb, "doc_b").select(
        "doc_a", "doc_b", "jaccard", est.alias("est")
    )
    # per-row error rounds to 6dp then sums in exact DECIMAL — the mean
    # is summation-order-independent (engine-wide float discipline)
    err6 = SF.round(SF.abs(SF.col("est") - SF.col("jaccard")), 6).cast("decimal(18,6)")
    return joined.agg(
        SF.count(SF.lit(1)).alias("n_pairs"),
        SF.round(SF.sum(err6).cast("double") / SF.count(SF.lit(1)), 6).alias("mean_abs_err"),
        (
            SF.sum(err6).cast("double") / SF.count(SF.lit(1)) <= MINHASH_EST_MAE_BOUND
        ).alias("estimator_ok"),
    )


def _minhash_estimate_sql() -> str:
    matches = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(dd.MINHASH_PERMS)
    )
    return f"""
WITH sigs AS ({_minhash_sig_sql()}),
exact AS ({JACCARD_SQL}),
joined AS (
  SELECT e.doc_a, e.doc_b, e.jaccard,
         CAST(({matches}) AS DOUBLE) / {dd.MINHASH_PERMS} AS est
  FROM exact e
  JOIN sigs sa ON sa.doc = e.doc_a
  JOIN sigs sb ON sb.doc = e.doc_b
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(CAST(SUM(CAST(round(abs(est - jaccard), 6) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_abs_err,
       CAST(SUM(CAST(round(abs(est - jaccard), 6) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*) <= {MINHASH_EST_MAE_BOUND} AS estimator_ok
FROM joined
"""


QUERIES["dedup_minhash_estimate"] = QuerySpec(
    dedup_minhash_estimate,
    _minhash_estimate_sql(),
    "MinHash Jaccard-estimator error contract vs exact pairs",
)


# BFS blast radius: seeds = every 29th document, bounded hop count
BFS_SEED_MOD = 29
BFS_MAX_HOPS = 4


def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded breadth-first hop distance from a seed set over the
    near-dup pair graph — the "contamination blast radius" traversal
    (operators/graph.py::bfs_hops): frontier equi-joins + anti-join
    against the visited set, lineage truncated per round, O(diameter)
    rounds. The oracle replays it as a recursive transitive walk with a
    hop bound and takes MIN(hop) — different algorithm, same
    deterministic result (first BFS visit IS the minimum hop)."""
    from monster_etl_spark.operators.graph import bfs_hops

    docs = load(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=NGRAM_N, threshold=JACCARD_THRESHOLD
    )
    seeds = docs.filter(F.col("doc_id") % BFS_SEED_MOD == 0).select(
        F.col("doc_id").alias("node")
    )
    return bfs_hops(pairs, seeds, max_hops=BFS_MAX_HOPS).select(
        "node", F.col("hop").cast("int").alias("hop")
    )


BFS_HOPS_SQL = f"""
WITH RECURSIVE jp AS ({JACCARD_SQL}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM jp
  UNION
  SELECT doc_b AS a, doc_a AS b FROM jp
),
walk(node, hop) AS (
  SELECT doc_id AS node, 0 AS hop FROM documents WHERE doc_id % {BFS_SEED_MOD} = 0
  UNION
  SELECT e.b, w.hop + 1 FROM walk w JOIN edges e ON w.node = e.a
  WHERE w.hop < {BFS_MAX_HOPS}
)
SELECT node, CAST(MIN(hop) AS INT) AS hop FROM walk GROUP BY node
"""

QUERIES["graph_bfs_hops"] = QuerySpec(
    graph_bfs_hops,
    BFS_HOPS_SQL,
    "bounded BFS hop distance from seeds over the near-dup graph",
)
