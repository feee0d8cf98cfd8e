"""Deterministic sampling operators for corpus curation.

Seeded random samples are not reproducible across engines (or even across
Spark partition layouts), so every sampler here ranks rows by an
engine-agnostic content hash (md5 of a salted id, first 8 hex digits as a
bigint — the same construction ``operators.dedup`` uses) and takes the
lowest-hash rows. The result is a uniform pseudo-random sample that is
bit-identical in Spark, DuckDB, and across reruns/cluster sizes.

Scale design:

- ``reservoir_sample`` (global n): ``ORDER BY hash LIMIT n`` compiles to
  TakeOrderedAndProject — per-partition partial top-n then a driver merge
  of #partitions * n rows; no full sort, no shuffle of the corpus.
- ``stratified_sample`` (n per stratum): the naive plan (rank window per
  stratum) moves every row of a stratum through one task, which dies on
  a 100 TB stratum. Instead: (1) count each stratum (map-side-combinable
  agg), (2) pre-filter to rows whose hash falls under an oversampled
  threshold — a narrow map that discards ~(1 - oversample*n/c) of every
  big stratum before any shuffle, (3) exact hash-rank the survivors per
  stratum. The window now sees ~oversample*n rows per stratum regardless
  of corpus size. With ``oversample`` >= 4 the chance the true n-th
  lowest hash exceeds the threshold is astronomically small (Chernoff on
  a binomial with mean 4n); both engines run the identical pipeline, so
  the outputs agree even in that tail case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 1 << 32
DEFAULT_OVERSAMPLE = 4.0


def sample_hash(id_col: Column, salt: str = "sample") -> Column:
    """Engine-agnostic uniform hash in [0, 2^32): first 8 md5 hex digits
    of ``salt|id``. Mirrors the SQL expression in ``sample_hash_sql``."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), id_col.cast("string"))), 1, 8), 16, 10
    ).cast("long")


def sample_hash_sql(id_expr: str, salt: str = "sample") -> str:
    """DuckDB twin of :func:`sample_hash` for oracle strings."""
    return (
        f"CAST(CAST(concat('0x', substr(md5(concat('{salt}|', CAST({id_expr} AS VARCHAR))), 1, 8)) "
        "AS UBIGINT) AS BIGINT)"
    )


def reservoir_sample(df: DataFrame, n: int, id_col: str, salt: str = "sample") -> DataFrame:
    """Deterministic global sample of ``n`` rows: the n lowest-hash ids.

    Equivalent in distribution to a uniform reservoir sample, but stable
    across engines and reruns. Plan: TakeOrderedAndProject (partial
    top-n per partition), never a full sort.
    """
    h = sample_hash(F.col(id_col), salt)
    return df.orderBy(h.asc(), F.col(id_col).asc()).limit(n)


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    id_col: str,
    salt: str = "sample",
    oversample: float = DEFAULT_OVERSAMPLE,
) -> DataFrame:
    """Deterministic exact-quota sample: the ``n_per_stratum`` lowest-hash
    rows of every stratum (all rows if the stratum is smaller).

    Columns: input columns + ``sample_rank`` (1-based within stratum).
    """
    h = sample_hash(F.col(id_col), salt).alias("_h")
    counts = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("_c"))
    # threshold per stratum: hash cutoff expected to admit oversample*n rows
    cutoff = F.least(
        F.lit(HASH_SPACE - 1).cast("double"),
        F.ceil(F.lit(float(oversample * n_per_stratum)) / F.col("_c") * HASH_SPACE).cast(
            "double"
        ),
    )
    pre = (
        df.select("*", h)
        .join(counts.select(*strata, cutoff.alias("_cut")), on=strata)
        .filter(F.col("_h") <= F.col("_cut"))
    )
    w = Window.partitionBy(*strata).orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        pre.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= n_per_stratum)
        .drop("_h", "_cut")
    )


def stratified_sample_sql(
    table: str,
    strata: list[str],
    n_per_stratum: int,
    id_expr: str,
    select_cols: list[str],
    salt: str = "sample",
    oversample: float = DEFAULT_OVERSAMPLE,
) -> str:
    """DuckDB twin of :func:`stratified_sample` (same two-phase plan so
    the tail-case behavior is identical, not just usually-identical)."""
    h = sample_hash_sql(id_expr, salt)
    keys = ", ".join(strata)
    cols = ", ".join(select_cols)
    return f"""
WITH hashed AS (
  SELECT *, {h} AS _h FROM {table}
),
counts AS (
  SELECT {keys}, COUNT(*) AS _c,
         least(CAST({HASH_SPACE - 1} AS DOUBLE),
               ceil({float(oversample * n_per_stratum)} / COUNT(*) * {HASH_SPACE})) AS _cut
  FROM {table} GROUP BY {keys}
),
pre AS (
  SELECT hashed.*
  FROM hashed JOIN counts USING ({keys})
  WHERE _h <= _cut
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY {keys} ORDER BY _h ASC, {id_expr} ASC) AS sample_rank
  FROM pre
)
SELECT {cols}, sample_rank FROM ranked WHERE sample_rank <= {n_per_stratum}
"""


def weighted_sample(
    df: DataFrame,
    n: int,
    id_col: str,
    weight_col: str,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sample without replacement (Efraimidis &
    Spirakis 2006 exponential race): each row draws a pseudo-uniform
    u in (0, 1] from the engine-agnostic content hash and competes with
    key = -ln(u) / w; the n SMALLEST keys win. Inclusion probability is
    proportional to weight (exactly the A-ES reservoir semantics), yet
    the outcome is bit-identical across engines, reruns, and partition
    layouts — the property seeded ``rand()`` cannot give.

    Scale shape: the key is a narrow per-row projection;
    ``ORDER BY key LIMIT n`` compiles to TakeOrderedAndProject (partial
    top-n per partition, driver merges #partitions * n rows) — no global
    sort, no shuffle of the corpus. Zero/negative/null weights are
    excluded (their race key is undefined), matching the A-ES contract.
    """
    # (hash + 1) / 2^32: u in (0, 1], never 0 -> ln is finite
    u = (sample_hash(F.col(id_col), salt) + F.lit(1).cast("double")) / F.lit(
        float(HASH_SPACE)
    )
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).cast("double") > 0)
        .withColumn("__wkey__", key)
        .orderBy(F.col("__wkey__").asc(), F.col(id_col).asc())
        .limit(n)
        .drop("__wkey__")
    )


def weighted_sample_sql(
    table: str,
    n: int,
    id_expr: str,
    weight_expr: str,
    salt: str = "wsample",
    projection: str = "*",
) -> str:
    """DuckDB twin of ``weighted_sample`` (identical hash, identical
    double math, identical tiebreak)."""
    h = sample_hash_sql(id_expr, salt)
    return f"""
SELECT {projection} FROM {table}
WHERE CAST({weight_expr} AS DOUBLE) > 0
ORDER BY -ln(({h} + 1.0) / {float(HASH_SPACE)}) / CAST({weight_expr} AS DOUBLE) ASC,
         {id_expr} ASC
LIMIT {n}
"""


def temperature_quotas(
    df: DataFrame,
    strata: list[str],
    total_n: int,
    tau: float = 0.5,
) -> DataFrame:
    """Temperature-rescaled per-stratum quotas (the multilingual-corpus
    rebalancing rule of mBERT/XLM-R and the mixture-reweighting step of
    DoReMi-style pipelines): stratum l with c_l rows gets sampling mass
    proportional to c_l ** tau. tau = 1 reproduces natural proportions;
    tau -> 0 approaches uniform, upweighting rare languages/domains.

    Exactness contract (the part seeded samplers cannot give): quotas are
    apportioned by the largest-remainder method over INTEGER micro-weights
    ``w6 = round(c^tau * 1e6)``; the one division (base share) is IEEE
    double division of exact integers — deterministic and identical in
    Spark and DuckDB — and remainders are pure integer arithmetic, so the
    quotas bit-agree regardless of aggregation order.
    ``sum(quota) == min(total_n, sum(least(quota_raw, c)))``; a stratum is
    never asked for more rows than it has (without-replacement cap), and
    capped surplus is NOT redistributed (single-pass apportionment — the
    deterministic, engine-agreeing choice).

    Scale shape: one map-side-combinable count per stratum; everything
    after operates on #strata rows (metadata-sized).
    """
    pow_col = (
        F.sqrt(F.col("_c").cast("double"))
        if tau == 0.5
        else F.pow(F.col("_c").cast("double"), F.lit(float(tau)))
    )
    counts = df.groupBy(*strata).agg(F.count(F.lit(1)).alias("_c"))
    w = counts.withColumn("w6", F.round(pow_col * 1e6).cast("long"))
    # Domain guard: the integer products below (total_n * w6 and
    # q_base * _w_tot) must fit in BIGINT. DuckDB raises on overflow;
    # Spark (non-ANSI) would WRAP silently and hand back garbage quotas,
    # so fail loudly at the same boundary. Binding when
    # total_n * max_stratum^tau > ~9.2e12 — e.g. total_n 1e6 over a
    # 1e13-row stratum at tau=0.5; shrink tau or quota in that regime.
    cap = (1 << 63) - 1
    w = w.withColumn(
        "w6",
        F.when(
            F.col("w6") > F.lit(cap // max(total_n, 1)),
            F.raise_error(
                F.lit(
                    f"temperature_quotas overflow: total_n={total_n} * w6 "
                    f"exceeds BIGINT; reduce total_n or tau"
                )
            ).cast("long"),
        ).otherwise(F.col("w6")),
    )
    tot = w.agg(F.sum("w6").alias("_w_tot"))
    j = w.crossJoin(F.broadcast(tot))
    base = (F.lit(total_n) * F.col("w6")) / F.col("_w_tot")
    j = j.withColumn("q_base", F.floor(base).cast("long")).withColumn(
        "rem", F.lit(total_n) * F.col("w6") - F.col("q_base") * F.col("_w_tot")
    )
    slots = j.agg((F.lit(total_n) - F.sum("q_base")).alias("_slots"))
    ranked = (
        j.crossJoin(F.broadcast(slots))
        .withColumn(
            "rem_rank",
            F.row_number().over(
                Window.orderBy(F.col("rem").desc(), *[F.col(c).asc() for c in strata])
            ),
        )
        .withColumn(
            "quota",
            F.least(
                F.col("q_base")
                + F.when(F.col("rem_rank") <= F.col("_slots"), F.lit(1)).otherwise(F.lit(0)),
                F.col("_c"),
            ).cast("long"),
        )
    )
    return ranked.select(*strata, F.col("_c").alias("stratum_rows"), "quota")


def temperature_quotas_sql(
    table: str, strata: list[str], total_n: int, tau: float = 0.5
) -> str:
    """DuckDB twin of :func:`temperature_quotas` (identical integer
    apportionment; sqrt for tau=0.5 so the micro-weights bit-agree)."""
    keys = ", ".join(strata)
    powe = "sqrt(CAST(_c AS DOUBLE))" if tau == 0.5 else f"pow(CAST(_c AS DOUBLE), {tau})"
    order = ", ".join(f"{c} ASC" for c in strata)
    return f"""
WITH counts AS (SELECT {keys}, COUNT(*) AS _c FROM {table} GROUP BY {keys}),
w AS (SELECT *, CAST(round({powe} * 1e6) AS BIGINT) AS w6 FROM counts),
tot AS (SELECT CAST(sum(w6) AS BIGINT) AS _w_tot FROM w),
j AS (
  SELECT w.*, _w_tot,
         CAST(floor(({total_n} * w6) / CAST(_w_tot AS DOUBLE)) AS BIGINT) AS q_base,
         {total_n} * w6 - CAST(floor(({total_n} * w6) / CAST(_w_tot AS DOUBLE)) AS BIGINT) * _w_tot AS rem
  FROM w, tot
),
slots AS (SELECT {total_n} - CAST(sum(q_base) AS BIGINT) AS _slots FROM j),
ranked AS (
  SELECT j.*, _slots,
         ROW_NUMBER() OVER (ORDER BY rem DESC, {order}) AS rem_rank
  FROM j, slots
)
SELECT {keys}, _c AS stratum_rows,
       CAST(least(q_base + CASE WHEN rem_rank <= _slots THEN 1 ELSE 0 END, _c) AS BIGINT) AS quota
FROM ranked
"""


def quota_sample(
    df: DataFrame,
    quotas: DataFrame,
    strata: list[str],
    id_col: str,
    salt: str = "sample",
    oversample: float = DEFAULT_OVERSAMPLE,
) -> DataFrame:
    """Variable-quota stratified sample: take each stratum's ``quota``
    lowest-hash rows, where ``quotas`` carries (strata..., stratum_rows,
    quota) — e.g. the output of :func:`temperature_quotas`.

    Same two-phase scale shape as :func:`stratified_sample`: a narrow
    hash-threshold prefilter discards all but ~oversample*quota rows of
    every stratum BEFORE the per-stratum rank window, so no task ever
    sees a whole 100 TB stratum. The quotas frame is #strata rows —
    always broadcast.
    """
    h = sample_hash(F.col(id_col), salt).alias("_h")
    cutoff = F.least(
        F.lit(HASH_SPACE - 1).cast("double"),
        F.ceil(
            F.lit(float(oversample)) * F.col("quota") / F.col("stratum_rows") * HASH_SPACE
        ).cast("double"),
    )
    pre = (
        df.select("*", h)
        .join(F.broadcast(quotas.withColumn("_cut", cutoff)), on=strata)
        .filter(F.col("_h") <= F.col("_cut"))
    )
    w = Window.partitionBy(*strata).orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        pre.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= F.col("quota"))
        .drop("_h", "_cut")
    )
