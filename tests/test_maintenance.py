"""merge_upsert precedence semantics + profile sanity."""

from monster_etl_spark.operators.maintenance import exact_profile, merge_upsert, profile


def test_merge_upsert_precedence_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "old", 10), (2, "keep", 20)], "k bigint, v string, ver bigint"
    )
    updates = spark.createDataFrame(
        [(1, "new", 11), (3, "insert", 5)], "k bigint, v string, ver bigint"
    )
    out = {r["k"]: (r["v"], r["ver"]) for r in merge_upsert(target, updates, "k", "ver").collect()}
    assert out == {1: ("new", 11), 2: ("keep", 20), 3: ("insert", 5)}


def test_merge_upsert_stale_update_loses(spark):
    target = spark.createDataFrame([(1, "current", 10)], "k bigint, v string, ver bigint")
    updates = spark.createDataFrame([(1, "stale", 3)], "k bigint, v string, ver bigint")
    out = merge_upsert(target, updates, "k", "ver").collect()
    assert (out[0]["v"], out[0]["ver"]) == ("current", 10)


def test_merge_upsert_tie_prefers_updates(spark):
    target = spark.createDataFrame([(1, "t", 7)], "k bigint, v string, ver bigint")
    updates = spark.createDataFrame([(1, "u", 7)], "k bigint, v string, ver bigint")
    assert merge_upsert(target, updates, "k", "ver").collect()[0]["v"] == "u"
    assert (
        merge_upsert(target, updates, "k", "ver", prefer_updates_on_tie=False).collect()[0]["v"]
        == "t"
    )


def test_profile_shapes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = profile(docs).collect()[0]
    assert row["n_rows"] == docs.count()
    assert row["doc_id__nulls"] == 0
    assert row["lang__min"] is not None
    exact = exact_profile(docs, ["lang"]).collect()[0]
    assert exact["lang__distinct"] == 5


def test_zorder_layout_tightens_file_stats(spark, sf_dir, tmp_path):
    """Write orders z-ordered on (o_custkey, o_totalprice) vs sorted on
    o_custkey alone, then read back real parquet footer min/max stats.
    With uniform data the bounding-box AREA is the same under any
    space-filling order (8 files = 1/8 of the plane each); z-order's
    data-skipping win is that every file is narrow on BOTH dimensions —
    the linear layout spans 100% of the non-sort dimension in every file,
    so a filter on o_totalprice alone prunes nothing. Assert on the
    worst-dimension fractional span, the quantity that bounds pruning for
    single-dimension predicates."""
    import pyarrow.parquet as pq

    from monster_etl_spark.operators.maintenance import zorder_layout

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "linear")
    zorder_layout(o, ["o_custkey", "o_totalprice"], bits=8, num_files=8).write.parquet(zdir)
    o.repartitionByRange(8, "o_custkey").sortWithinPartitions("o_custkey").write.parquet(ldir)

    def file_boxes(d):
        import glob

        boxes = []
        for f in glob.glob(f"{d}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = [float("inf")] * 2
            hi = [float("-inf")] * 2
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                for i in range(row.num_columns):
                    col = row.column(i)
                    name = col.path_in_schema
                    if name in ("o_custkey", "o_totalprice"):
                        k = 0 if name == "o_custkey" else 1
                        lo[k] = min(lo[k], float(col.statistics.min))
                        hi[k] = max(hi[k], float(col.statistics.max))
            boxes.append((hi[0] - lo[0], hi[1] - lo[1]))
        return boxes

    def avg_worst_frac(boxes, full):
        fracs = [max(dx / full[0], dy / full[1]) for dx, dy in boxes]
        return sum(fracs) / len(fracs)

    lo = o.agg(
        {"o_custkey": "min", "o_totalprice": "min"}
    ).collect()[0]
    hi = o.agg({"o_custkey": "max", "o_totalprice": "max"}).collect()[0]
    full = (
        hi["max(o_custkey)"] - lo["min(o_custkey)"],
        hi["max(o_totalprice)"] - lo["min(o_totalprice)"],
    )
    z_frac = avg_worst_frac(file_boxes(zdir), full)
    l_frac = avg_worst_frac(file_boxes(ldir), full)
    # linear: every file spans ~100% of o_totalprice -> worst frac ~1.0;
    # z: 8 range-buckets of the curve split custkey in 2 and totalprice in
    # 4 (or vice versa) -> worst frac ~0.5
    assert z_frac < 0.75 * l_frac, (z_frac, l_frac)
    assert l_frac > 0.9  # sanity: the strawman really is unpruned on dim 2


def test_zorder_key_locality(spark):
    """Points adjacent in both dimensions must map to nearby z-values;
    points far apart in one dimension must not collide."""
    from pyspark.sql import functions as F

    from monster_etl_spark.operators.maintenance import zorder_key

    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x: long, y: long")
    mins = {"x": F.lit(0), "y": F.lit(0)}
    maxs = {"x": F.lit(15), "y": F.lit(15)}
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(["x", "y"], mins, maxs, bits=4)).collect()
    }
    # bijective on the 16x16 grid
    assert len(set(got.values())) == 256
    # classic Morton property: z(x,y) interleaves the bits exactly
    def morton(x, y):
        z = 0
        for b in range(4):
            z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y), (x, y, z, morton(x, y))


def test_expectations_nulls_are_violations(spark):
    from pyspark.sql import functions as F

    from monster_etl_spark.operators.maintenance import expectations, unique_rule

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -1.0), (3, 5.0)], "id: long, v: double"
    )
    got = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in expectations(df, {"v_positive": F.col("v") > 0}).collect()
    }
    # NULL comparison result counts as a violation (unknown != compliant)
    assert got == {"v_positive": (2, False)}
    uniq = unique_rule(df, ["id"], "id_unique").collect()[0]
    assert (uniq["rule"], uniq["n_violations"], uniq["passed"]) == ("id_unique", 1, False)
