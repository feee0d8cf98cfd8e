"""Shuffle/spill accounting (monster_etl_spark.metrics): the delta logic
must be immune to UI retained-stage eviction, and the no-UI path must
degrade to None (the engine's default session keeps the UI off)."""

from monster_etl_spark import metrics


def _m(sw=0, sr=0, ms=0, ds=0):
    return {"shuffle_write": sw, "shuffle_read": sr, "mem_spill": ms, "disk_spill": ds}


def test_delta_sums_only_new_stage_attempts():
    before = {"1.0": _m(sw=100, sr=100), "2.0": _m(sw=50)}
    after = {**before, "3.0": _m(sw=7, sr=9, ds=3), "3.1": _m(sw=1)}
    assert metrics.delta(before, after) == _m(sw=8, sr=9, ds=3)


def test_delta_immune_to_eviction():
    """The UI retains a bounded stage list: stages from BEFORE can vanish
    from AFTER. A cumulative-total diff would go negative (observed on a
    real bench run); the keyed diff must not."""
    before = {f"{i}.0": _m(sw=1000) for i in range(10)}
    after = {"9.0": _m(sw=1000), "10.0": _m(sw=42, ms=5)}  # 0..8 evicted
    assert metrics.delta(before, after) == _m(sw=42, ms=5)


def test_delta_none_propagates():
    assert metrics.delta(None, {"1.0": _m()}) is None
    assert metrics.delta({"1.0": _m()}, None) is None


def test_snapshot_none_when_ui_disabled(spark):
    # the shared test session runs with spark.ui.enabled=false
    assert spark.sparkContext.uiWebUrl is None
    assert metrics.snapshot(spark) is None


def test_fmt_bytes():
    assert metrics.fmt_bytes(0) == "0B"
    assert metrics.fmt_bytes(1023) == "1023B"
    assert metrics.fmt_bytes(1536) == "1.5KiB"
    assert metrics.fmt_bytes(3 * 1024**3) == "3.0GiB"
