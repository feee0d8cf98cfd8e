"""Manifest-based file skipping: the z-order -> manifest -> pruned-read
loop must skip most files on a 2-D band predicate and still return exactly
the rows a full scan + filter returns."""

from pyspark.sql import functions as F

from monster_etl_spark.operators.maintenance import zorder_layout
from monster_etl_spark.operators.manifest import build_manifest, pruned_paths, pruned_read


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def test_manifest_stats_match_data(spark, sf_dir, tmp_path):
    out = str(tmp_path / "plain")
    o = _orders(spark, sf_dir)
    o.repartition(4).write.parquet(out)
    m = build_manifest(spark, out, ["o_custkey", "o_totalprice"]).collect()
    # per-column totals across files must equal the table
    total = sum(r["n_rows"] for r in m if r["column"] == "o_custkey")
    assert total == o.count()
    lo = min(r["vmin"] for r in m if r["column"] == "o_totalprice")
    hi = max(r["vmax"] for r in m if r["column"] == "o_totalprice")
    got = o.agg(F.min("o_totalprice"), F.max("o_totalprice")).collect()[0]
    assert lo == got[0] and hi == got[1]


def test_zorder_manifest_prunes_both_dims(spark, sf_dir, tmp_path):
    zdir = str(tmp_path / "z")
    o = _orders(spark, sf_dir)
    zorder_layout(o, ["o_custkey", "o_totalprice"], num_files=8).write.parquet(zdir)
    manifest = build_manifest(spark, zdir, ["o_custkey", "o_totalprice"])

    stats = o.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("o_totalprice"), F.max("o_totalprice")
    ).collect()[0]
    ck_band = (float(stats[0]), float(stats[0] + (stats[1] - stats[0]) * 0.2))
    tp_band = (float(stats[2]), float(stats[2] + (stats[3] - stats[2]) * 0.2))
    preds = {"o_custkey": ck_band, "o_totalprice": tp_band}

    surviving = pruned_paths(manifest, preds)
    assert len(surviving) < 8, "2-D band predicate should skip z-ordered files"

    got = sorted(r["o_orderkey"] for r in pruned_read(spark, zdir, manifest, preds).collect())
    exp = sorted(
        r["o_orderkey"]
        for r in o.filter(
            F.col("o_custkey").between(*ck_band) & F.col("o_totalprice").between(*tp_band)
        ).collect()
    )
    assert got == exp, "file skipping lost or invented rows"


def test_pruned_read_empty_band(spark, sf_dir, tmp_path):
    out = str(tmp_path / "p2")
    _orders(spark, sf_dir).repartition(2).write.parquet(out)
    manifest = build_manifest(spark, out, ["o_totalprice"])
    assert pruned_paths(manifest, {"o_totalprice": (-2.0, -1.0)}) == []
    assert pruned_read(spark, out, manifest, {"o_totalprice": (-2.0, -1.0)}).count() == 0


def test_unknown_stats_never_prune(spark, tmp_path):
    """A file whose footer lacks usable min/max for a column must get an
    unknown (None, None) band and survive every predicate — pruning is a
    superset guarantee even when the writer omitted statistics (round-2
    ADVICE: a band built only from stat-bearing row groups can be
    narrower than the data)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path / "nostats"
    out.mkdir()
    tbl = pa.table({"x": pa.array([1.0, 2.0, 3.0], pa.float64())})
    pq.write_table(tbl, out / "part-00000.parquet", write_statistics=False)

    m = build_manifest(spark, str(out), ["x"])
    rows = m.collect()
    assert rows[0]["vmin"] is None and rows[0]["vmax"] is None
    # a predicate far outside the data must NOT prune the unknown-band file
    assert pruned_paths(m, {"x": (100.0, 200.0)}) == [str(out / "part-00000.parquet")]


def test_nan_rowgroup_poisons_band(spark, tmp_path):
    """NaN min/max (or NaN-suppressed stats) are not a usable band: the
    file must fall back to unknown rather than a too-narrow band."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path / "nanstats"
    out.mkdir()
    # two row groups: one clean, one NaN-bearing — if the NaN group's
    # stats are absent or NaN, the whole file's band must become unknown
    tbl = pa.table({"x": pa.array([1.0, 2.0, math.nan, math.nan], pa.float64())})
    pq.write_table(tbl, out / "part-00000.parquet", row_group_size=2)

    m = build_manifest(spark, str(out), ["x"])
    r = m.collect()[0]
    # either pyarrow produced clean stats for both groups (band covers the
    # finite values) or the band is unknown — it must never be NaN/narrow
    if r["vmin"] is not None:
        assert r["vmin"] == r["vmin"] and r["vmax"] == r["vmax"], "NaN band escaped"
        assert r["vmin"] <= 1.0 and r["vmax"] >= 2.0
    assert pruned_paths(m, {"x": (1.5, 1.6)}) != []


def test_update_manifest_detects_inplace_rewrite(spark, sf_dir, tmp_path):
    """A part file rewritten under the SAME name must be re-harvested:
    manifest identity is (path, size, mtime), not path alone."""
    import glob

    from monster_etl_spark.operators.manifest import update_manifest

    out = str(tmp_path / "rw")
    _orders(spark, sf_dir).repartition(2).write.parquet(out)
    m1 = build_manifest(spark, out, ["o_totalprice"])
    m1.write.parquet(str(tmp_path / "m1"))
    m1_stored = spark.read.parquet(str(tmp_path / "m1"))

    victim = sorted(glob.glob(f"{out}/part-*.parquet"))[0]
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"o_orderkey": pa.array([1], pa.int64()),
                  "o_custkey": pa.array([1], pa.int64()),
                  "o_totalprice": pa.array([999999.5], pa.float64())}),
        victim,
    )
    m2 = update_manifest(spark, m1_stored, out, ["o_totalprice"])
    got = {r["file"]: (r["vmin"], r["vmax"]) for r in m2.collect()}
    assert got[victim] == (999999.5, 999999.5), "stale stats survived an in-place rewrite"


def test_update_manifest_incremental(spark, sf_dir, tmp_path):
    """Appending files must only harvest the NEW footers; deleted files
    drop out; the updated manifest equals a from-scratch rebuild."""
    from monster_etl_spark.operators.manifest import build_manifest, update_manifest

    out = str(tmp_path / "t")
    o = _orders(spark, sf_dir)
    o.filter("o_orderkey % 2 = 0").repartition(2).write.parquet(out)
    m1 = build_manifest(spark, out, ["o_totalprice"])
    m1_rows = m1.collect()

    # append more files (same dir, new part files)
    o.filter("o_orderkey % 2 = 1").repartition(2).write.mode("append").parquet(out)
    m2 = update_manifest(spark, m1, out, ["o_totalprice"])
    rebuilt = build_manifest(spark, out, ["o_totalprice"])
    key = lambda r: (r["file"], r["column"])
    assert sorted(map(tuple, m2.collect())) == sorted(map(tuple, rebuilt.collect()))
    assert len(m2.collect()) > len(m1_rows)

    # manifests are stored tables between updates — persist before the
    # next maintenance round (a lazy manifest would re-read its source
    # footers on every evaluation, including ones since deleted)
    mdir = str(tmp_path / "manifest")
    m2.write.parquet(mdir)
    m2_stored = spark.read.parquet(mdir)

    # delete one file -> it must drop out of the updated manifest
    import glob
    import os

    victim = sorted(glob.glob(f"{out}/part-*.parquet"))[0]
    os.remove(victim)
    m3 = update_manifest(spark, m2_stored, out, ["o_totalprice"])
    assert victim not in {r["file"] for r in m3.collect()}


class TestBloomSkipping:
    @staticmethod
    def _staged(spark, sf_dir, tmp_path):
        out = str(tmp_path / "li_bloom")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        # range-partition on orderkey: each key lands in exactly one file
        li.repartitionByRange(16, "l_orderkey").write.mode("overwrite").parquet(out)
        return out

    def test_bloom_prunes_to_superset_of_hits(self, spark, sf_dir, tmp_path):
        from monster_etl_spark.operators.manifest import (
            bloom_pruned_paths,
            build_bloom_manifest,
        )

        out = self._staged(spark, sf_dir, tmp_path)
        bm = build_bloom_manifest(spark, out, ["l_orderkey"]).cache()
        key = spark.read.parquet(out).agg(F.max("l_orderkey")).collect()[0][0]
        surviving = bloom_pruned_paths(bm, "l_orderkey", key)
        # the key exists: at least its file survives, and far fewer than all
        assert 1 <= len(surviving) < 16
        # true containing file is in the surviving set (no false negatives)
        actual = {
            r.f
            for r in spark.read.parquet(out)
            .filter(F.col("l_orderkey") == key)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        }
        assert all(
            any(a.endswith(s.rsplit("/", 1)[-1]) for s in surviving) for a in actual
        )

    def test_bloom_pruned_read_matches_full_filter(self, spark, sf_dir, tmp_path):
        from monster_etl_spark.operators.manifest import (
            bloom_pruned_read,
            build_bloom_manifest,
        )

        out = self._staged(spark, sf_dir, tmp_path)
        bm = build_bloom_manifest(spark, out, ["l_orderkey"]).cache()
        key = spark.read.parquet(out).agg(F.min("l_orderkey")).collect()[0][0]
        got = bloom_pruned_read(spark, out, bm, "l_orderkey", key)
        want = spark.read.parquet(out).filter(F.col("l_orderkey") == key)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_bloom_absent_value_prunes_everything_or_reads_empty(self, spark, sf_dir, tmp_path):
        from monster_etl_spark.operators.manifest import (
            bloom_pruned_read,
            build_bloom_manifest,
        )

        out = self._staged(spark, sf_dir, tmp_path)
        bm = build_bloom_manifest(spark, out, ["l_orderkey"]).cache()
        got = bloom_pruned_read(spark, out, bm, "l_orderkey", -987654321)
        assert got.count() == 0
