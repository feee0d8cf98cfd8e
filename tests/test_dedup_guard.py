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
