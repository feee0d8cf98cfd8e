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
