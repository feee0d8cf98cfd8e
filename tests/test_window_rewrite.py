"""Sub-document dedup rewrite: a passage repeated across documents must
survive only at its globally-first (doc, position) occurrence; unique text
is untouched; a fully-duplicated document collapses to empty."""

from monster_etl_spark.operators import dedup as dd


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repeated_passage_kept_only_at_first_occurrence(spark):
    boiler = "all rights reserved contact us"  # 5 tokens < seg_w alignment
    rows = [
        (1, f"alpha beta gamma delta epsilon {boiler}"),
        (2, f"zeta eta theta iota kappa {boiler}"),  # same boiler, same alignment
        (3, "unique words entirely different content here"),
    ]
    out = {
        r["doc_id"]: r
        for r in dd.window_dedup_rewrite(_docs(spark, rows), seg_w=5).collect()
    }
    # doc 1: both segments first occurrences -> full text survives
    assert out[1]["clean_text"] == "alpha beta gamma delta epsilon " + boiler
    assert out[1]["n_segs"] == out[1]["n_kept"] == 2
    # doc 2: its boiler segment occurred in doc 1 at the same alignment
    assert out[2]["clean_text"] == "zeta eta theta iota kappa"
    assert (out[2]["n_segs"], out[2]["n_kept"]) == (2, 1)
    # doc 3 untouched (6 tokens -> segments of 5 + 1, both unique)
    assert out[3]["n_kept"] == out[3]["n_segs"] == 2
    assert out[3]["clean_text"] == "unique words entirely different content here"


def test_full_duplicate_doc_collapses_to_empty(spark):
    rows = [
        (10, "one two three four five six"),
        (11, "one two three four five six"),
    ]
    out = {
        r["doc_id"]: r
        for r in dd.window_dedup_rewrite(_docs(spark, rows), seg_w=3).collect()
    }
    assert out[10]["n_kept"] == 2 and out[10]["clean_text"] == "one two three four five six"
    assert out[11]["n_kept"] == 0 and out[11]["clean_text"] == ""


def test_tail_segment_is_its_own_unit(spark):
    # 7 tokens at seg_w=3 -> segments of 3,3,1; the 1-token tail is a
    # distinct unit and dedups independently
    rows = [(1, "a b c d e f g"), (2, "x y z g")]
    out = {
        r["doc_id"]: r
        for r in dd.window_dedup_rewrite(_docs(spark, rows), seg_w=3).collect()
    }
    assert out[1]["n_segs"] == 3 and out[1]["n_kept"] == 3
    # doc 2's tail "g" matches doc 1's tail "g" (both pos-aligned tails)
    assert out[2]["clean_text"] == "x y z"
