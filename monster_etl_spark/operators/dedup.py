"""Deduplication operators for training-data pipelines.

Four families, all expressed with built-in column expressions (no Python
UDFs) so they scale as Catalyst plans:

- exact:          content-hash groupBy (one shuffle on the hash)
- MinHash + LSH:  shingle -> k minhashes -> banded bucket-join; candidate
                  pairs only ever meet inside a band bucket, never all-pairs
- SimHash:        token-hash bit votes -> b-bit signature -> chunk-bucketed
                  Hamming candidate join (pigeonhole: distance <= d pairs
                  share at least one of d+1 chunks)
- n-gram Jaccard: shingle inverted index self-join (exact similarity, the
                  verification step after LSH candidate generation)

Hashing is md5-based (`_hash64`): deterministic, seed-stable across engines,
and reproducible in ANSI SQL — which makes every operator here
oracle-checkable in DuckDB (see ``monster_etl_spark.queries.dedup``).

Scale notes (100 TB posture):
- Shingle inverted indexes skew on ultra-common shingles; ``max_shingle_freq``
  drops shingles present in more than that many documents before the join
  (stopword-shingles carry no dedup signal). AQE skew-join handles the rest.
- MinHash bands keep the candidate join linear in bucket sizes; the band
  width trades recall for bucket size.
- All pair outputs are (small_id, large_id) with ``<`` so results are
  canonical regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from monster_etl_spark.operators.partitioning import spread as _spread
from monster_etl_spark.operators.text import TOKEN_SPLIT_RE

# MinHash parameters shared with the SQL oracles.
MINHASH_PERMS = 8
MINHASH_BAND_SIZE = 2  # 4 bands of 2 signatures
# 60-bit signatures, 15-bit chunks: 2^15 buckets per chunk. 32-bit/8-bit
# chunks degenerate at corpus scale — only 256 buckets per chunk means a
# 50k-doc corpus averages ~200 docs per bucket and the candidate join goes
# quadratic (measured: 143 s / 94M pairs at 50k docs; the 60-bit layout
# keeps buckets sparse AND makes distance<=3 a 20x stricter match). 60 not
# 64: the signature must fit a signed BIGINT in both engines (2^59 max).
SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4  # 15 bits per chunk; finds all pairs with distance <= 3
SIMHASH_HEX_CHARS = 15  # 60-bit token hash (md5 prefix)

# Universal-hash permutation constants for MinHash: perm_i(h) = (a_i*h + b_i)
# mod p. One base hash per shingle (md5 is the expensive part) + cheap
# arithmetic per permutation beats k independent md5 passes ~k-fold.
# a_i odd and < 2^30, h < 2^32 => a*h + b < 2^62: no BIGINT overflow, so the
# identical expression runs in DuckDB (oracle) and Spark.
MINHASH_PRIME = (1 << 61) - 1  # Mersenne prime
MINHASH_AB: tuple[tuple[int, int], ...] = tuple(
    (2 * k + 1, (k * k * 0x9E3779B9 + k + 12289) % (1 << 30))
    for k in (0x1DF5, 0x2E8B, 0x3C6F, 0x4A21, 0x58D3, 0x6665, 0x7417, 0x81C9)
)[:MINHASH_PERMS]


def _hash64(col: Column, salt: str = "", hex_chars: int = 8) -> Column:
    """Deterministic hash as a long: first ``hex_chars`` hex chars of
    md5(salt || value) — 8 chars = 32-bit range (shingle index keys),
    15 chars = 60-bit range (simhash). Identical SQL:
    CAST(concat('0x', substr(md5(...),1,N)) AS UBIGINT).
    """
    payload = F.concat(F.lit(salt), F.lit("|"), col) if salt else col
    return F.conv(F.substring(F.md5(payload), 1, hex_chars), 16, 10).cast("long")


def _grams_from_tokens(toks: Column, n: int) -> Column:
    """Distinct n-gram array from a token-array column; [] under n tokens.
    Single source of the gram construction — callers must pass a
    MATERIALIZED token column (lambda subtrees are not CSE'd; an inline
    split would re-tokenize per element)."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (convenience form;
    prefer materializing tokens first on hot paths)."""
    return _grams_from_tokens(F.split(F.lower(F.trim(text)), TOKEN_SPLIT_RE), n)


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content fingerprint. Returns one row per
    distinct content with the surviving (minimum) id and the duplicate count.
    Map-side partial aggregation makes the shuffle proportional to distinct
    contents, not rows."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, max_shingle_freq: int | None
) -> DataFrame:
    """(doc, shingle) rows, distinct per doc. ``shingles()`` already emits
    per-row-distinct arrays, so exploding needs NO global distinct — that
    would add a full shuffle of the shingle table for nothing.

    The token array is materialized as a projected column FIRST: lambda
    subexpressions are not CSE'd, so inlining the split would re-tokenize
    the text for every element_at — ~3x n_shingles regex splits per row.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)
    with_toks = _spread(df.select(F.col(id_col).alias("doc"), toks.alias("toks")))
    sh = with_toks.select("doc", F.explode(_grams_from_tokens(F.col("toks"), n)).alias("shingle"))
    if max_shingle_freq is not None:
        # drop stopword-shingles: present in > max_shingle_freq docs they
        # carry no dedup signal and create join skew at scale
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
        keep = freq.filter(F.col("df_") <= max_shingle_freq).select("shingle")
        sh = sh.join(keep, "shingle")
    return sh


def _hashed_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, max_shingle_freq: int | None
) -> DataFrame:
    """(doc, h) rows: per-doc-distinct shingles hashed to longs.

    The skew guard runs on the HASH, inverted: count doc frequency per
    shingle hash (map-side-combinable aggregate), keep only the HOT set
    (freq > cap), and ``left_anti`` the shingle table against it. The hot
    set is bounded by total_instances/cap and zipfian-tiny in practice, so
    AQE executes the anti-join as a broadcast — the shingle table is never
    re-shuffled for the guard, and the 8-byte hash key beats joining on
    ~20-byte shingle strings (which the keep-side equi-join formulation
    required)."""
    sh = _exploded_shingles(df, id_col, text_col, n, None).select(
        "doc", _hash64(F.col("shingle")).alias("h")
    )
    if max_shingle_freq is not None:
        hot = (
            sh.groupBy("h")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") > max_shingle_freq)
            .select("h")
        )
        # explicit broadcast: the hot set is bounded by construction
        # (<= total_instances/cap rows, zipfian-tiny in practice) and the
        # hint sits above the bounding Aggregate, so the anti-join can
        # never degrade to a sort-merge re-shuffle of the full shingle
        # table at scale (round-11; guide §3.1 — size estimates after a
        # selective filter are often wrong, pin the strategy you can prove)
        sh = sh.join(F.broadcast(hot), "h", "left_anti")
    return sh


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs >= threshold via an inverted
    shingle index: explode distinct shingles, self-join on shingle
    (co-occurrence = intersection size), then |A|+|B|-inter for the union.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded 6dp.

    The self-join keys on the shingle hash, not the string: the shuffle
    moves 8-byte keys instead of ~20-byte strings and the join compares
    longs. (Identical hashing on the oracle side keeps results bit-equal;
    a collision would need ~2^16+ distinct shingles colliding in the
    32-bit space — and the oracle reproduces it identically if so.)
    """
    sh0 = _hashed_shingles(df, id_col, text_col, n, max_shingle_freq).withColumnRenamed(
        "h", "sh"
    )
    # sizes is computed from the PRE-partition table: referencing the
    # repartition exchange from the self-join sides AND both size joins
    # (4 plan references) defeats AQE's runtime stage reuse in Spark 4.1
    # (measured: the full shingle exchange materialized twice, 2 x 32-task
    # map stages re-running the explode+hash); with sizes off to the side
    # the exchange has exactly the 2 self-join references and materializes
    # ONCE (round-11, stage-level evidence in OPTIMIZATION_r11.md). The
    # sizes pass re-runs the explode into a map-side-combinable per-doc
    # count — partial rows, not the full table (296K vs 5.7MB shuffled at
    # sf0.1; guide §2.3 "aggregate before you shuffle" / §2.4).
    sizes = sh0.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    # pre-partition on the join key: both self-join sides share one
    # identical exchange (reused query stage) — the scan+shingle+hash work
    # runs once, and the join itself is co-partitioned (no extra shuffle)
    sh = sh0.repartition(F.col("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_shared: int = 1,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Train/eval decontamination: flag train docs sharing >= ``min_shared``
    distinct word n-grams with any eval/benchmark doc — the standard
    pre-training hygiene pass for eval-set leakage. Expressed as an
    inverted-index equi-join between the two hashed shingle tables: work is
    linear in shared-shingle instances, never |train| x |eval|, and the
    (small) eval side broadcasts under AQE. ``max_shingle_freq`` drops
    boilerplate n-grams from BOTH sides first when set. Returns
    (train_id, eval_id, shared_ngrams), one row per contaminated pair.
    """
    t = _hashed_shingles(train, id_col, text_col, n, max_shingle_freq).withColumnRenamed(
        "doc", "train_id"
    )
    e = _hashed_shingles(eval_df, id_col, text_col, n, max_shingle_freq).withColumnRenamed(
        "doc", "eval_id"
    )
    return (
        t.join(e, "h")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perms: int = MINHASH_PERMS,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Per-document MinHash signature: for each of ``num_perms`` salted hash
    functions, the minimum hash over the document's shingle set. One
    aggregate over the exploded-shingle table computes all perms at once.
    Documents with no shingles (< n tokens) are dropped.
    ``max_shingle_freq`` drops stopword-shingles (doc frequency above the
    cap) before signing — the skew guard for 100 TB corpora.
    """
    sh = _hashed_shingles(df, id_col, text_col, n, max_shingle_freq)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_AB[:num_perms])
    ]
    return sh.groupBy(F.col("doc")).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perms: int = MINHASH_PERMS,
    band_size: int = MINHASH_BAND_SIZE,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs: signatures split into bands; documents
    sharing any band bucket become a candidate pair. The join key is
    (band index, band values) so work is linear in bucket sizes — the
    100 TB-safe shape (never an all-pairs comparison). Returns distinct
    (doc_a, doc_b), doc_a < doc_b."""
    sigs = minhash_signatures(df, id_col, text_col, n, num_perms, max_shingle_freq)
    n_bands = num_perms // band_size
    bands = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(bi),
                *[F.col(f"mh{bi * band_size + j}") for j in range(band_size)],
            )
            for bi in range(n_bands)
        ]
    )
    bucketed = sigs.select(F.col("doc"), F.explode(bands).alias("bucket"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """Per-document SimHash: hash each distinct token, one vote per bit
    (+1 if set, -1 if clear), signature bit = sign of the vote sum.
    Implemented as one explode + aggregate; the per-bit vote sums are
    ``bits`` parallel aggregate expressions (all map-side combinable).
    """
    # per-row array_distinct, then explode: per-doc distinct tokens with no
    # global distinct shuffle
    toks = _spread(df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("text"))).select(
        "doc",
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), TOKEN_SPLIT_RE))
        ).alias("tok"),
    ).withColumn("h", _hash64(F.col("tok"), hex_chars=SIMHASH_HEX_CHARS))
    # vote_i = (#set - #clear) = 2*sum(bit_i) - n, and sign(vote_i) > 0
    # iff 2*sum_i > n: pure-arithmetic sums (no per-row CASE branch in the
    # wide aggregate) plus ONE shared count — identical signatures,
    # cheaper codegen than ``bits`` conditional sums. Built as PARSED
    # expression strings: the Column-API construction of the 60-wide
    # tree cost 2,457 py4j round trips = 0.85 s of driver time per plan
    # build (cProfile, round-11); one expr() parse per aggregate is a
    # single round trip and yields the identical Catalyst expression
    # (guide §4 — the JVM<->Python boundary exists on the driver too).
    sums = [F.expr(f"sum(shiftright(h, {i}) & 1) AS s{i}") for i in range(bits)]
    agg = toks.groupBy("doc").agg(*sums, F.count(F.lit(1)).alias("n_"))
    # same left-fold sum of CASE terms as the Column reduce it replaces
    # (exact integer adds; dropping the redundant leading 0L changes no
    # value). 1<<i fits a signed BIGINT literal for bits <= 60.
    sig_sql = " + ".join(
        f"(CASE WHEN 2 * s{i} > n_ THEN {1 << i}L ELSE 0L END)" for i in range(bits)
    )
    return agg.select(F.col("doc"), F.expr(sig_sql).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = SIMHASH_BITS,
    chunks: int = SIMHASH_CHUNKS,
    max_distance: int = SIMHASH_CHUNKS - 1,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_distance, found via
    chunk bucketing (pigeonhole: a pair within distance ``chunks-1`` agrees
    on at least one of ``chunks`` signature chunks) — candidates meet only
    inside chunk buckets, never all-pairs. Returns (doc_a, doc_b, hamming).
    """
    assert max_distance < chunks, "pigeonhole guarantee requires max_distance < chunks"
    sigs = simhash_signatures(df, id_col, text_col, bits)
    chunk_bits = bits // chunks
    mask = (1 << chunk_bits) - 1
    # parsed expression string for the same reason as simhash_signatures:
    # one py4j round trip instead of ~5 per chunk
    chunk_arr = F.expr(
        "array("
        + ", ".join(
            f"concat_ws(':', {ci}, shiftright(simhash, {ci * chunk_bits}) & {mask})"
            for ci in range(chunks)
        )
        + ")"
    )
    bucketed = sigs.select("doc", "simhash", F.explode(chunk_arr).alias("bucket"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc") < F.col("b.doc")))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("long").alias("hamming"),
        )
        # filter BEFORE the distinct: hamming is pair-determined, so the
        # order is semantics-free, but filtering first keeps far pairs out
        # of the dedup shuffle (candidates can be ~n^2 on skewed corpora)
        .filter(F.col("hamming") <= max_distance)
        .distinct()
    )


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    max_block: int | None = 1000,
    n_keys: int = 2,
) -> DataFrame:
    """Record-linkage fuzzy duplicate pairs: multi-key rarest-token canopy
    blocking + Levenshtein verification. Each record enters the blocks of
    its ``n_keys`` globally rarest tokens (ties broken lexicographically;
    the (df, tok) pair is encoded as one sortable string so both engines
    pick identical keys). Multi-key matters for recall: a typo usually
    makes that token UNIQUE (df=1), so with a single rarest-token key the
    two variants of a pair land in different blocks and are never
    compared; with K>=2 they still meet through a shared rare token.
    Candidate work is bounded by block sizes (never corpus²) and a pair
    found through several shared keys is deduplicated before
    verification. ``max_block`` drops pathological blocks (a stopword as
    someone's rarest token) the same way the shingle-frequency guard
    protects the Jaccard join; engaged by default.

    Verification is JVM-side ``levenshtein`` after the distinct — no UDF.
    A true pair sharing none of their ``n_keys`` rarest tokens is still
    missed (the canopy approximation, tunable via ``n_keys``). Returns
    (id_a, id_b, dist), id_a < id_b, dist <= max_dist.
    """
    toks = (
        df.select(F.col(id_col).alias("rid"), F.col(text_col).alias("rtext"))
        .select("rid", "rtext", F.explode(F.split(F.col("rtext"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    df_t = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tok_df"))
    keyed = (
        toks.join(df_t, "tok")
        .groupBy("rid")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.format_string("%010d|%s", F.col("tok_df"), F.col("tok")))
                ),
                1,
                n_keys,
            ).alias("bkeys"),
            F.first("rtext").alias("rtext"),
        )
        .select("rid", "rtext", F.explode("bkeys").alias("bkey"))
    )
    if max_block is not None:
        big = (
            keyed.groupBy("bkey")
            .agg(F.count(F.lit(1)).alias("bn"))
            .filter(F.col("bn") > max_block)
            .select("bkey")
        )
        keyed = keyed.join(big, "bkey", "left_anti")
    keyed = keyed.repartition(F.col("bkey"))
    a, b = keyed.alias("a"), keyed.alias("b")
    cands = (
        a.join(b, (F.col("a.bkey") == F.col("b.bkey")) & (F.col("a.rid") < F.col("b.rid")))
        .select(
            F.col("a.rid").alias("id_a"),
            F.col("b.rid").alias("id_b"),
            F.col("a.rtext").alias("text_a"),
            F.col("b.rtext").alias("text_b"),
        )
        .distinct()
    )
    return cands.select(
        "id_a",
        "id_b",
        F.levenshtein(F.col("text_a"), F.col("text_b")).cast("long").alias("dist"),
    ).filter(F.col("dist") <= max_dist)


def span_dup_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_w: int = 8,
    max_span_freq: int | None = None,
) -> DataFrame:
    """Per-document duplicated-span fraction: the share of a document's
    distinct ``span_w``-token spans that also occur in at least one other
    document (the doc-level signal of Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — exact substring overlap,
    where the shingle families measure set similarity). High ``dup_frac``
    = boilerplate or copied passages; the standard curation gate drops or
    trims such docs.

    Scale shape: reuses the hashed-shingle machinery — spans are per-doc
    distinct BEFORE the explode (no global distinct), span frequency is a
    map-side-combinable count on the 8-byte hash, and the join back is an
    equi-join on that hash. Long spans are zipf-cold so no guard is
    engaged by default; pass ``max_span_freq`` if a template sentence
    longer than ``span_w`` dominates a corpus.

    Returns (id, n_spans, n_shared_spans, dup_frac) for docs with at
    least ``span_w`` tokens.
    """
    sh = _hashed_shingles(df, id_col, text_col, span_w, max_span_freq)
    dfreq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("n_docs"))
    shared = F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).cast("long")
    return (
        sh.join(dfreq, "h")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            shared.alias("n_shared_spans"),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_spans",
            "n_shared_spans",
            F.round(F.col("n_shared_spans") / F.col("n_spans"), 6).alias("dup_frac"),
        )
    )


# pos packs into the low 20 bits of the first-occurrence key; documents
# longer than 2^20 segments (~8M tokens at seg_w=8) would need a wider
# shift. Shared with the SQL oracle.
SEG_POS_BITS = 20


def window_dedup_rewrite(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_w: int = 8,
) -> DataFrame:
    """Sub-document corpus dedup with reconstruction (C4 / Lee et al. 2022
    style): cut every document into consecutive ``seg_w``-token segments,
    keep only each distinct segment's globally-first occurrence (minimum
    ``(doc, position)``), and rebuild the cleaned text from the surviving
    segments in order. Unlike :func:`span_dup_report` (which only scores),
    this REMOVES repeated passages — the boilerplate-stripping rewrite an
    LLM curation pipeline runs corpus-wide.

    Scale shape (100 TB posture):
    - Segmentation is narrow: one pass builds the segment array per row
      (tokens materialized once; lambda subtrees are not CSE'd).
    - The only corpus-wide state is ``segment-hash -> min first-occurrence
      key``: a map-side-combinable MIN aggregate over 8-byte hashes, then
      an equi-join back — shuffle bytes are proportional to distinct
      segments, never to text volume.
    - Reconstruction groups per document (bounded by document length);
      ``array_sort`` on (pos, seg) structs keeps it deterministic under
      any partitioning.
    - The first-occurrence rule needs a total order; ``doc * 2^20 + pos``
      packs it into one BIGINT so the MIN stays a primitive aggregate
      (struct-min would disable map-side partials in some engines).

    Returns (id, n_segs, n_kept, clean_text); documents whose every
    segment occurred earlier elsewhere come back with ``n_kept=0`` and
    empty ``clean_text``.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT_RE)
    base = _spread(df.select(F.col(id_col).alias("doc"), toks.alias("toks")))
    n_segs = F.ceil(F.size("toks") / F.lit(float(seg_w))).cast("long")
    seg_at = lambda s: F.array_join(  # noqa: E731
        F.slice(F.col("toks"), s * seg_w + 1, seg_w), " "
    )
    segs = base.select(
        "doc",
        n_segs.alias("n_segs"),
        F.posexplode(F.transform(F.sequence(F.lit(0), n_segs - 1), seg_at)).alias(
            "pos", "seg"
        ),
    )
    key = F.col("doc") * (1 << SEG_POS_BITS) + F.col("pos")
    hashed = segs.select(
        "doc", "n_segs", "pos", "seg", _hash64(F.col("seg"), salt="c4seg").alias("h")
    )
    firsts = hashed.groupBy("h").agg(F.min(key).alias("min_key"))
    kept = hashed.join(firsts, "h").filter(key == F.col("min_key"))
    rebuilt = kept.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))), lambda x: x["seg"]
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        base.select("doc", n_segs.alias("n_segs"))
        .join(rebuilt, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "n_segs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def contamination_matrix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    n: int = 3,
    max_shingle_freq: int | None = 100,
) -> DataFrame:
    """Cross-group contamination matrix: for every pair of corpus groups
    (sources, splits, crawls), how much n-gram content they share — the
    corpus-level generalization of train/eval ``decontaminate`` (which
    answers the same question for one ordered pair at document grain).

    Per group, the distinct shingle-hash set (skew-guarded like every
    shingle consumer: super-common grams carry no contamination signal
    and would quadratically inflate the hash join). Pairs meet on an
    equi-join over the hash — per hash the work is (groups carrying it)²,
    bounded by the group count, never corpus². Returns one row per
    unordered group pair: (group_a, group_b, n_shared, containment)
    where containment = shared / min(|A|, |B|) — 1.0 means the smaller
    side's guarded shingle set is fully contained in the other.
    """
    sh = _hashed_shingles(df, id_col, text_col, n, max_shingle_freq)
    grp = df.select(F.col(id_col).alias("doc"), F.col(group_col).alias("grp"))
    gh = sh.join(grp, "doc").select("grp", "h").distinct()
    sizes = gh.groupBy("grp").agg(F.count(F.lit(1)).alias("n_hashes"))
    a = gh.select(F.col("grp").alias("group_a"), "h")
    b = gh.select(F.col("grp").alias("group_b"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("grp").alias("group_a"), F.col("n_hashes").alias("_na"))
    sb = sizes.select(F.col("grp").alias("group_b"), F.col("n_hashes").alias("_nb"))
    return (
        shared.join(F.broadcast(sa), "group_a")
        .join(F.broadcast(sb), "group_b")
        .select(
            "group_a",
            "group_b",
            "n_shared",
            F.round(F.col("n_shared") / F.least("_na", "_nb"), 6).alias("containment"),
        )
    )
