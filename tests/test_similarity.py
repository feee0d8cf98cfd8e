"""ANN recall: the approximate paths must recover most of the exact
brute-force top-k."""

from monster_etl_spark.operators import similarity as sim
from monster_etl_spark.queries import load


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(emb.vec_id % 50 == 0)
    exact = _topk_sets(sim.brute_force_topk(queries, emb, k=5))
    approx = _topk_sets(sim.ivf_topk(queries, emb, k=5))
    assert approx.keys() == exact.keys()
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.5, f"IVF recall too low: {hits}/{total}"


def test_lsh_topk_subset_of_bucket(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(emb.vec_id % 50 == 0)
    out = sim.lsh_topk(queries, emb, k=5)
    # ranks are dense and start at 1 per query
    for q, rows in _topk_sets(out).items():
        assert 1 <= len(rows) <= 5
