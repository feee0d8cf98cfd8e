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
