"""Round-7 verdict #2: bench.py must self-attribute round-over-round
deltas instead of shipping drift unexplained. These tests pin the
attribution state machine — which causes fire, in which priority order —
with a stub registry so the probe runs are deterministic and cheap."""

import json
import os

import bench


class _Spec:
    def __init__(self, fn):
        self.fn = fn


def _fake_registry(spark):
    # probe target: a trivially cheap real Spark job (noop sink works)
    return {"qx": _Spec(lambda s, d: spark.range(1))}


def _fp():
    return {
        "driver_memory": "16g",
        "shuffle_partitions": "32",
        "initial_partitions": "1024",
        "master": "local[32]",
    }


def _prev(queries, session=None, stage_metrics=None):
    p = {"sf": 0.1, "queries": queries, "session": session or _fp()}
    if stage_metrics:
        p["stage_metrics"] = stage_metrics
    return p


def test_improvements_and_noise_floor(spark):
    reg = _fake_registry(spark)
    deltas = bench._attribute_deltas(
        _prev({"qx": 10.0, "qy": 0.05, "qz": 3.0}),
        {"qx": 5.0, "qy": 0.15, "qz": 3.1},  # qy: sub-floor noise; qz: <15%
        reg, spark, "unused", _fp(), None,
    )
    assert deltas["qx"]["cause"] == "improvement"
    assert "qy" not in deltas  # both sides under _MIN_ABS_S
    assert "qz" not in deltas  # within the 15% band


def test_regression_converges_at_steady_state(spark):
    reg = _fake_registry(spark)
    # prev 10s, reported 20s — the probe's real steady state (~ms) is far
    # below prev * 1.15, so the cause must be measurement depth
    deltas = bench._attribute_deltas(
        _prev({"qx": 10.0}), {"qx": 20.0}, reg, spark, "unused", _fp(), None,
    )
    rec = deltas["qx"]
    assert rec["cause"].startswith("converges-at-steady-state")
    assert len(rec["probe_runs"]) == bench._PROBE_RUNS
    assert rec["steady"] <= 10.0 * (1 + bench._DRIFT)


def test_regression_persistent_unexplained(spark):
    reg = _fake_registry(spark)
    # prev is far below any achievable steady state; no stage metrics, no
    # config diff -> the honest "needs review" cause
    deltas = bench._attribute_deltas(
        _prev({"qx": 0.0001}), {"qx": 5.0}, reg, spark, "unused", _fp(), None,
    )
    assert deltas["qx"]["cause"].startswith("persistent-unexplained")


def test_regression_names_session_config_change(spark):
    reg = _fake_registry(spark)
    prev_fp = dict(_fp(), driver_memory="8g")
    deltas = bench._attribute_deltas(
        _prev({"qx": 0.0001}, session=prev_fp), {"qx": 5.0},
        reg, spark, "unused", _fp(), None,
    )
    assert deltas["qx"]["cause"].startswith("session-config-change")
    assert "driver_memory" in deltas["qx"]["cause"]


def test_regression_names_stage_metric_shift(spark):
    reg = _fake_registry(spark)
    prev_sm = {"0.1": {"qx": {"shuffle_write": 1 << 20, "disk_spill": 0}}}
    cur_sm = {"0.1": {"qx": {"shuffle_write": 1 << 30, "disk_spill": 0}}}
    deltas = bench._attribute_deltas(
        _prev({"qx": 0.0001}, stage_metrics=prev_sm), {"qx": 5.0},
        reg, spark, "unused", _fp(), cur_sm,
    )
    assert deltas["qx"]["cause"].startswith("stage-metric-shift: shuffle_write")


def test_non_registry_names_are_not_probed(spark):
    deltas = bench._attribute_deltas(
        _prev({"etl_tsv_to_jsonl": 1.0}), {"etl_tsv_to_jsonl": 10.0},
        {}, spark, "unused", _fp(), None,
    )
    assert deltas["etl_tsv_to_jsonl"]["cause"].startswith("non-registry")
    assert "probe_runs" not in deltas["etl_tsv_to_jsonl"]


def test_metric_shift_detection():
    assert bench._metric_shift(None, {"shuffle_write": 5}) is None
    flat = {"shuffle_write": 1 << 30, "disk_spill": 0}
    assert bench._metric_shift(flat, dict(flat)) is None
    # sub-MiB absolute wiggle is ignored even when relatively large
    assert bench._metric_shift({"disk_spill": 10}, {"disk_spill": 1000}) is None
    got = bench._metric_shift(
        {"shuffle_write": 1 << 30}, {"shuffle_write": 2 << 30}
    )
    assert got and got.startswith("shuffle_write")


def test_prev_summary_never_uses_interim_sidecar(tmp_path):
    """Round-8 verdict #1: the baseline must be the previous ROUND's
    end-state. A working-tree BENCH_SUMMARY.json alone (the builder's own
    interim run) is NOT a baseline — without a driver-committed
    BENCH_r{N}.json there is no anchor at all."""
    p = tmp_path / "BENCH_SUMMARY.json"
    p.write_text(json.dumps({"sf": 0.1, "queries": {"q": 1.0}}))
    assert bench._prev_summary(str(tmp_path), 0.1) is None


def test_prev_summary_round_file_fallback_and_sf_gating(tmp_path):
    """Outside a git checkout the anchor degrades to the round file's own
    parsed block (driver-truncated but immutable round-end numbers);
    sf mismatches and newest-round precedence are enforced."""
    (tmp_path / "BENCH_r01.json").write_text(json.dumps(
        {"parsed": {"sf": 0.1, "queries": {"q": 1.0}}}))
    (tmp_path / "BENCH_r02.json").write_text(json.dumps(
        {"parsed": {"sf": 0.1, "queries": {"q": 2.0}}}))
    (tmp_path / "BENCH_r03.json").write_text(json.dumps(
        {"parsed": {"sf": 0.01, "queries": {"q": 9.0}}}))
    # an interim sidecar sitting next to the round files must be ignored
    (tmp_path / "BENCH_SUMMARY.json").write_text(json.dumps(
        {"sf": 0.1, "queries": {"q": 99.0}}))
    got = bench._prev_summary(str(tmp_path), 0.1)
    assert got is not None
    assert got["queries"] == {"q": 2.0}  # newest round AT THIS sf wins
    assert "BENCH_r02.json" in got["baseline_anchor"]
    assert bench._prev_summary(str(tmp_path), 1.0) is None  # sf never recorded


def test_prev_summary_anchors_to_round_boundary_commit():
    """Against the real repo: the baseline for the driver sf must be the
    sidecar committed ALONGSIDE the newest BENCH_r{N}.json — the full
    record of the driver's round-end run — not whatever interim sidecar
    is in the working tree. Pinned to round-8's known end-state totals so
    a regression to ratcheting behavior fails loudly."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(bench.__file__))
    rounds = sorted(
        int(re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
    )
    if not rounds:  # fresh checkout without driver artifacts
        return
    newest = rounds[-1]
    with open(os.path.join(here, f"BENCH_r{newest:02d}.json")) as f:
        parsed = json.load(f).get("parsed") or {}
    if parsed.get("sf") is None:
        return
    got = bench._prev_summary(here, parsed["sf"])
    assert got is not None and got.get("sf") == parsed["sf"]
    assert f"BENCH_r{newest:02d}.json" in got.get("baseline_anchor", "")
    # the anchor is the SAME run the driver recorded: totals must agree
    if parsed.get("value") is not None and "value" in got:
        assert abs(got["value"] - parsed["value"]) < 1e-6
    # full sidecar (when git is available) carries >= the truncated set
    assert set(parsed.get("queries", {})) <= set(got["queries"])
