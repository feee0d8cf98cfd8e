"""Shingle-frequency skew guard: stopword-shingles above the doc-frequency
cap must not generate candidate pairs (they carry no dedup signal and are
the join hot keys at scale), while genuinely shared rare shingles still
match."""

from monster_etl_spark.operators import dedup as dd


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_shingles_do_not_pair(spark):
    # every doc shares the same 3-gram boilerplate; only docs 1/2 also
    # share a rare payload shingle
    boiler = "terms of service apply"
    rows = [
        (1, f"alpha beta gamma delta {boiler}"),
        (2, f"alpha beta gamma delta epsilon {boiler}"),
        (3, f"zeta eta theta {boiler}"),
        (4, f"iota kappa lambda {boiler}"),
        (5, f"mu nu xi {boiler}"),
    ]
    guarded = dd.ngram_jaccard_pairs(
        _docs(spark, rows), "doc_id", "text", n=3, threshold=0.1, max_shingle_freq=3
    ).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in guarded}
    # boilerplate shingles appear in 5 docs (> cap 3): without the guard
    # all 10 pairs appear; with it only the real near-dup pair survives
    assert pairs == {(1, 2)}

    unguarded = dd.ngram_jaccard_pairs(
        _docs(spark, rows), "doc_id", "text", n=3, threshold=0.1, max_shingle_freq=None
    ).collect()
    assert len(unguarded) == 10  # sanity: the guard is what removed them


def test_ngram_contamination_flags_leaked_eval_text(spark):
    evald = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    train = _docs(
        spark,
        [
            # verbatim leak of a long eval span
            (1, "noise before the quick brown fox jumps over the lazy dog and after"),
            # shares only a 4-gram, below the n=5 window
            (2, "quick brown fox jumps somewhere else entirely today"),
            (3, "completely unrelated text with no overlap whatsoever here"),
        ],
    )
    out = dd.ngram_contamination(train, evald, "doc_id", "text", n=5, min_shared=2).collect()
    assert {(r["train_id"], r["eval_id"]) for r in out} == {(1, 100)}
    assert out[0]["shared_ngrams"] >= 2


def test_guard_changes_minhash_signatures_consistently(spark):
    rows = [(i, "common words shared by all docs plus unique" + "x" * i) for i in range(1, 5)]
    sig_g = dd.minhash_signatures(_docs(spark, rows), "doc_id", "text", n=3, max_shingle_freq=2)
    sig_u = dd.minhash_signatures(_docs(spark, rows), "doc_id", "text", n=3)
    # the guard drops shared shingles from every doc's set, so the min over
    # remaining hashes can only move; both variants stay deterministic
    assert sig_g.count() == sig_u.count() == 4
    assert sig_g.collect() == sig_g.collect()


def test_fuzzy_pairs_planted_typos(spark):
    """Planted dirty names: typo variants sharing their rarest token must
    pair; unrelated records must not; the block guard must drop a
    stopword-flooded block."""
    from monster_etl_spark.operators.dedup import fuzzy_pairs

    rows = [
        (1, "acme corporation zurich"),
        (2, "acme corporaton zurich"),   # 1 deletion
        (3, "acme corp zurich"),         # too far (dist 7 from 1)
        (4, "globex industries geneva"),
        (5, "globex industries genevva"), # 1 insertion
        (6, "initech llc dallas"),
    ]
    df = spark.createDataFrame(rows, "rid: long, name: string")
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in fuzzy_pairs(
        df, "rid", "name", max_dist=2, max_block=None
    ).collect()}
    assert got == {(1, 2): 1, (4, 5): 1}, got

    # guard: give every record the same rare token -> one giant block,
    # max_block=3 drops it entirely
    flood = spark.createDataFrame(
        [(i, f"zzz name{i}") for i in range(10)], "rid: long, name: string"
    )
    assert fuzzy_pairs(flood, "rid", "name", max_dist=99, max_block=3).count() == 0
    assert fuzzy_pairs(flood, "rid", "name", max_dist=99, max_block=None).count() == 45
