"""plan_summary must report the facts the plan tests rely on."""

from monster_etl_spark.explain import plan_summary
from monster_etl_spark.queries import all_queries

Q = all_queries()


def test_summary_of_narrow_chain(spark, sf_dir):
    s = plan_summary(Q["t9_parse_longs"].fn(spark, sf_dir))
    assert s.is_narrow
    assert s.python_evals == 0
    assert s.codegen_spans >= 1
    assert len(s.scans) == 1 and s.scans[0].fmt == "parquet"


def test_summary_of_star_join(spark, sf_dir):
    s = plan_summary(Q["q5_local_supplier_volume"].fn(spark, sf_dir))
    assert s.broadcast_hash_joins >= 4
    assert s.sort_merge_joins == 0
    assert s.broadcasts >= 4
    assert any("r_name" in sc.pushed_filters for sc in s.scans)


def test_no_broadcast_hint_on_sf_growing_side(spark, sf_dir):
    """Audit EVERY registry query's analyzed plan: explicit broadcast()
    hints may pin only the constant-size dims (nation/region) or
    cardinality-bounded subtrees (global aggregates, limits) — never an
    SF-growing table. AQE choosing broadcast at a small SF is fine (it
    re-decides from runtime sizes); a hint is forever, and a hinted
    growing side is the round-1 q3/q5/q18 scale-killer class."""
    from monster_etl_spark.explain import broadcast_hinted_tables

    allowed = {"n_nationkey", "r_regionkey"}
    bad = {}
    for name, spec in Q.items():
        flagged = [
            h
            for h in broadcast_hinted_tables(spec.fn(spark, sf_dir))
            if h not in allowed
        ]
        if flagged:
            bad[name] = flagged
    assert bad == {}, f"broadcast hints on SF-growing relations: {bad}"


def test_summary_counts_python_crossing(spark, sf_dir):
    s = plan_summary(Q["multimodal_image_features"].fn(spark, sf_dir))
    assert s.python_evals >= 0  # mapInPandas shows as its own node, not Eval
    # but the scan must still be pruned to the two needed columns
    assert any("text" in sc.read_schema for sc in s.scans)


# Round-8 verdict stretch #8: the ONLY queries whose plans may carry a
# BroadcastNestedLoopJoin. Two documented classes, both with a
# cardinality-BOUNDED broadcast side:
# - the ANN family's brute-force contract (bounded-|Q| query side
#   broadcast against the corpus) and its index builders' 1-row
#   centroid/codebook arrays;
# - broadcast 1-ROW scalar subtrees (global aggregates: normalization
#   constants, thresholds, bin edges) crossJoined back onto a table —
#   the TPC-H scalar-subquery shapes and the sketch/profile queries.
# A future Spark upgrade or refactor that turns an equi-join into a
# nested loop ANYWHERE else fails this sweep by name.
_BNLJ_WHITELIST = {
    # ANN family: brute-force contract + broadcast index arrays
    "knn_brute_force", "knn_ivf", "knn_ivf_recall", "knn_pq",
    "knn_pq_recall", "knn_ivfpq", "knn_ivfpq_recall",
    "knn_ivfpq_residual", "knn_ivfpq_residual_recall",
    # OPQ recall row: the rotated corpus feeds the same ivfpq chain,
    # so the same broadcast centroid/LUT arrays appear (plus the exact
    # brute-force contract side)
    "knn_opq_recall",
    # broadcast 1-row scalar subtrees (global constants / thresholds)
    "q2_min_cost_supplier", "q9_product_profit", "q11_important_stock",
    "q16_supplier_part_counts", "q20_promotion_suppliers",
    "q22_dormant_customers", "q_rfm_segments", "q_drift_psi",
    "q_equidepth_bins", "q_histogram", "q_key_skew_profile",
    "q_negative_samples", "q_zorder_key", "sample_temperature",
    "text_tfidf", "text_bm25_rank", "text_unigram_logprob",
    "text_bigram_logprob", "text_token_pagerank",
}


def test_no_unbroadcast_cartesian_in_any_registry_plan(spark, sf_dir):
    """Registry-wide audit, one plan build per query, two invariants:

    - no CartesianProduct node anywhere (an UNBROADCAST cross product —
      both sides shuffled to every task pair — is a scale killer nowhere
      AQE can fix);
    - BroadcastNestedLoopJoin only in the documented
      brute-force/1-row-scalar whitelist above (round-8 verdict #8).

    Streaming queries are skipped (their plan only exists inside a
    running query)."""
    from monster_etl_spark.explain import formatted_plan

    bad = {}
    for name, spec in Q.items():
        if name.startswith("stream_"):
            continue
        try:
            plan = formatted_plan(spec.fn(spark, sf_dir))
        except Exception as ex:  # pragma: no cover - surface which query broke
            bad[name] = f"explain failed: {ex}"
            continue
        if "CartesianProduct" in plan:
            bad[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_WHITELIST:
            bad[name] = "BroadcastNestedLoopJoin outside the documented whitelist"
    assert bad == {}, f"cross-product audit failures: {bad}"


def test_python_eval_only_in_multimodal_and_untar(spark, sf_dir):
    """Registry-wide audit: Python UDF evaluation nodes
    (BatchEvalPython / ArrowEvalPython) may appear ONLY in the
    multimodal/untar family — everything else must stay JVM-side.
    This counts BOTH the row-UDF nodes and MapInPandas, so every Python
    crossing in every registry plan is either in the exception families
    below or a failure."""
    # s8_ is the jar-less Avro fallback source: a Python OCF decoder IS
    # the operator there (the jar-backed path on a real cluster is pure
    # JVM), so it joins the audited exception family
    allowed_prefixes = ("multimodal_", "s7_", "s8_")
    # the named exceptions: operators whose Arrow-vectorized numpy
    # kernel IS the operator (a numeric inner loop built-ins only
    # express as interpreted HOF folds — measured 7.6x at 2M corpus
    # rows, see brute_force_topk_arrow's docstring); each
    # must document the bit-parity argument in its docstring
    allowed_names = {
        "knn_brute_force_arrow",
        "knn_ivf_arrow",
        # per-cell GEMM pair kernel with exact-fold rescore — the
        # SemDeDup pair step's audited twin (_cell_pairs_arrow docstring
        # carries the bit-parity argument; equality asserted in
        # tests/test_similarity.py::test_semantic_pair_engines_equal)
        "semantic_dedup_verdicts_arrow",
        # OPQ rotation: a per-batch (d x d) GEMM IS the operator
        # (rotate_embeddings docstring); orthogonality/norm invariants
        # are what these two rows verify end to end
        "knn_opq_invariants",
        "knn_opq_recall",
    }
    bad = {}
    for name, spec in Q.items():
        if (
            name.startswith("stream_")
            or name.startswith(allowed_prefixes)
            or name in allowed_names
        ):
            continue
        try:
            s = plan_summary(spec.fn(spark, sf_dir))
        except Exception as ex:
            bad[name] = f"plan_summary failed: {ex}"
            continue
        if s.python_evals or s.map_in_pandas:
            bad[name] = (s.python_evals, s.map_in_pandas)
    assert bad == {}, f"Python evaluation outside multimodal: {bad}"


def test_unpartitioned_windows_only_on_bounded_inputs(spark, sf_dir):
    """Registry-wide audit: a window with no partition spec funnels its
    ENTIRE input through one task — fine only when that input is
    structurally bounded, a scale-killer when it is corpus-sized
    (round-3: the compaction planner's inventory-wide cumsum; fixed
    along with equi-depth binning via operators/prefix.py's two-phase
    scan). Every unpartitioned window remaining in the registry is
    pinned here with its bound; a new query adding one over an
    SF-growing input fails this test."""
    from monster_etl_spark.explain import unpartitioned_windows

    # query -> max unpartitioned windows, each over a KNOB- or
    # CONSTANT-bounded input (never SF-growing):
    allowed = {
        "q_compaction_plan": 1,   # prefix.py offsets rollup: num_ranges rows
        "q_equidepth_bins": 1,    # prefix.py offsets rollup: num_ranges rows
        "q_drift_psi": 2,         # PSI share sums: PSI_BINS (10) rows
        "sample_temperature": 1,  # quota remainder rank: one row per stratum
        "text_zipf_fit": 1,       # log-log OLS rank: top-ZIPF_TOP (200) rows
    }
    bad = {}
    for name, spec in Q.items():
        if name.startswith("stream_"):
            continue
        try:
            n = len(unpartitioned_windows(spec.fn(spark, sf_dir)))
        except Exception as ex:  # pragma: no cover - surface which query broke
            bad[name] = f"plan walk failed: {ex}"
            continue
        if n > allowed.get(name, 0):
            bad[name] = n
    assert bad == {}, f"unpartitioned windows beyond the bounded whitelist: {bad}"
