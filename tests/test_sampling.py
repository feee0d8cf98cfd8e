"""Sampling operator properties.

The discriminating check: the scale plan (count -> oversampled hash
pre-filter -> rank the survivors) must select exactly the same rows as the
brute-force plan (rank everything, no pre-filter). If the pre-filter
threshold were wrong — off-by-one in the hash space, ceil vs floor, a
missed small-stratum cap — the two diverge immediately.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from monster_etl_spark.operators.sampling import (
    reservoir_sample,
    sample_hash,
    stratified_sample,
)
from monster_etl_spark.queries import load


def _brute_force_stratified(df, strata, n, id_col):
    h = sample_hash(F.col(id_col)).alias("_h")
    w = Window.partitionBy(*strata).orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        df.select("*", h)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
        .drop("_h")
    )


def test_stratified_equals_brute_force(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    fast = stratified_sample(d, ["lang"], 7, "doc_id")
    slow = _brute_force_stratified(d, ["lang"], 7, "doc_id")
    cols = ["doc_id", "lang", "sample_rank"]
    assert sorted(fast.select(*cols).collect()) == sorted(slow.select(*cols).collect())


def test_stratified_small_stratum_keeps_all(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    per_lang = {r["lang"]: r["c"] for r in d.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    big_n = max(per_lang.values()) + 5
    out = stratified_sample(d, ["lang"], big_n, "doc_id")
    got = {r["lang"]: r["c"] for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert got == per_lang  # quota above stratum size -> every row kept


def test_reservoir_deterministic_and_sized(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    a = [r["doc_id"] for r in reservoir_sample(d, 20, "doc_id").select("doc_id").collect()]
    b = [r["doc_id"] for r in reservoir_sample(d.repartition(13), 20, "doc_id").select("doc_id").collect()]
    assert len(a) == 20
    assert sorted(a) == sorted(b)  # partition layout must not change the sample


def test_salt_changes_sample(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in reservoir_sample(d, 20, "doc_id", salt="a").collect()}
    b = {r["doc_id"] for r in reservoir_sample(d, 20, "doc_id", salt="b").collect()}
    assert a != b  # different salt -> a different (still deterministic) draw


def test_weighted_sample_bias_and_determinism(spark):
    from monster_etl_spark.operators.sampling import weighted_sample

    rows = [(i, 100.0 if i < 10 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id: long, w: double")
    got = [r["id"] for r in weighted_sample(df, 100, "id", "w").collect()]
    # the 10 weight-100 rows each beat ~99% of weight-1 rows for a slot
    assert len(got) == 100
    assert sum(1 for i in got if i < 10) >= 8
    # bit-identical under a different partition layout
    got2 = [r["id"] for r in weighted_sample(df.repartition(13), 100, "id", "w").collect()]
    assert sorted(got) == sorted(got2)
    # zero/negative/null weights never win
    df2 = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 5.0)], "id: long, w: double"
    )
    assert [r["id"] for r in weighted_sample(df2, 10, "id", "w").collect()] == [4]


def test_weighted_sample_plan_is_partial_topn(spark):
    """ORDER BY key LIMIT n must compile to TakeOrderedAndProject —
    per-partition partial top-n, no global sort of the corpus."""
    from monster_etl_spark.operators.sampling import weighted_sample

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    plan = weighted_sample(df, 10, "id", "w")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
