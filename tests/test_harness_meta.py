"""Meta-tests: the correctness harness itself must discriminate (a vacuous
comparator would green-light everything), and the engine must serve
concurrent queries from one session."""

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from monster_etl_spark.queries import all_queries, load
from tests.oracle_harness import compare


def test_compare_catches_value_mutation(spark, sf_dir):
    df = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ok = compare(df, "SELECT n_nationkey, n_name FROM nation", sf_dir)
    assert not ok
    mutated = df.withColumn("n_nationkey", F.col("n_nationkey") + 1)
    problems = compare(mutated, "SELECT n_nationkey, n_name FROM nation", sf_dir)
    assert problems, "value mutation must be detected"


def test_compare_catches_row_count_and_schema(spark, sf_dir):
    df = load(spark, sf_dir, "nation").select("n_nationkey")
    assert compare(df.limit(3), "SELECT n_nationkey FROM nation", sf_dir)
    assert compare(
        df.withColumnRenamed("n_nationkey", "nk"), "SELECT n_nationkey FROM nation", sf_dir
    )


def test_compare_catches_float_drift(spark, sf_dir):
    df = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_discount")
    drifted = df.withColumn("l_discount", F.col("l_discount") + 1e-9)
    problems = compare(drifted, "SELECT l_orderkey, l_linenumber, l_discount FROM lineitem", sf_dir)
    assert problems, "sub-ulp-scale drift must still be detected (exact canon)"


def test_queries_md_in_sync():
    # QUERIES.md is generated (tools/gen_queries_md.py); its headline counts
    # must match the live registry so docs can't drift again
    import re

    with open("/root/repo/QUERIES.md") as f:
        head = f.read(400)
    m = re.search(r"(\d+) queries; (\d+) oracle-backed", head)
    assert m, "QUERIES.md missing count line"
    registry = all_queries()
    assert int(m.group(1)) == len(registry)
    assert int(m.group(2)) == sum(1 for s in registry.values() if s.oracle is not None)


def test_concurrent_queries_one_session(spark, sf_dir):
    qs = all_queries()
    names = ["q1_pricing_summary", "t9_parse_longs", "text_token_stats", "q_window_topk"]

    def run(name):
        return name, qs[name].fn(spark, sf_dir).count()

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = dict(ex.map(run, names))
    assert all(v > 0 for v in results.values()), results
