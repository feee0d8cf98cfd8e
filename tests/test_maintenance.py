"""merge_upsert precedence semantics + profile sanity."""

from monster_etl_spark.operators.maintenance import exact_profile, merge_upsert, profile


def test_merge_upsert_precedence_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "old", 10), (2, "keep", 20)], "k bigint, v string, ver bigint"
    )
    updates = spark.createDataFrame(
        [(1, "new", 11), (3, "insert", 5)], "k bigint, v string, ver bigint"
    )
    out = {r["k"]: (r["v"], r["ver"]) for r in merge_upsert(target, updates, "k", "ver").collect()}
    assert out == {1: ("new", 11), 2: ("keep", 20), 3: ("insert", 5)}


def test_merge_upsert_stale_update_loses(spark):
    target = spark.createDataFrame([(1, "current", 10)], "k bigint, v string, ver bigint")
    updates = spark.createDataFrame([(1, "stale", 3)], "k bigint, v string, ver bigint")
    out = merge_upsert(target, updates, "k", "ver").collect()
    assert (out[0]["v"], out[0]["ver"]) == ("current", 10)


def test_merge_upsert_tie_prefers_updates(spark):
    target = spark.createDataFrame([(1, "t", 7)], "k bigint, v string, ver bigint")
    updates = spark.createDataFrame([(1, "u", 7)], "k bigint, v string, ver bigint")
    assert merge_upsert(target, updates, "k", "ver").collect()[0]["v"] == "u"
    assert (
        merge_upsert(target, updates, "k", "ver", prefer_updates_on_tie=False).collect()[0]["v"]
        == "t"
    )


def test_profile_shapes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = profile(docs).collect()[0]
    assert row["n_rows"] == docs.count()
    assert row["doc_id__nulls"] == 0
    assert row["lang__min"] is not None
    exact = exact_profile(docs, ["lang"]).collect()[0]
    assert exact["lang__distinct"] == 5
