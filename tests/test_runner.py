"""Declarative pipeline runner + quarantine read tests."""

import glob
import json

import pytest
from pyspark.sql import types as T

from monster_etl_spark.plans.runner import run_pipeline
from monster_etl_spark.sources.jsonl import read_json_lines_quarantine


def test_declarative_pipeline_tsv_to_jsonl(spark, tmp_path):
    # a frequency-analysis-shaped pipeline declared as data, not code
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.tsv").write_text(
        "varId\tchromosome\tposition\teaf\ttop\n"
        "4:835425:G:T\t4\t835425\t0.13\ttrue\n"
        "5:100:A:C\t5\t\t\tfalse\n"
    )
    out = tmp_path / "out"
    pipeline = {
        "source": {"format": "tsv", "path": f"{src}/*.tsv"},
        "steps": [
            {"op": "snake_case"},
            {"op": "rename_fields", "mapping": {"var_id": "variant_id"}},
            {"op": "remove_fields", "fields": ["chromosome"]},
            {"op": "parse_longs", "fields": ["position"]},
            {"op": "parse_doubles", "fields": ["eaf"]},
            {"op": "parse_booleans", "fields": ["top"]},
        ],
        "sink": {"format": "jsonl", "path": str(out), "drop_null_fields": True},
    }
    df = run_pipeline(spark, pipeline)
    assert dict(df.dtypes) == {
        "variant_id": "string",
        "position": "bigint",
        "eaf": "double",
        "top": "boolean",
    }
    recs = []
    for f in sorted(glob.glob(f"{out}/part-*")):
        with open(f) as fh:
            recs += [json.loads(x) for x in fh if x.strip()]
    recs.sort(key=lambda r: r["variant_id"])
    assert recs == [
        {"variant_id": "4:835425:G:T", "position": 835425, "eaf": 0.13, "top": True},
        {"variant_id": "5:100:A:C", "top": False},
    ]


def test_runner_unknown_op_raises(spark, tmp_path):
    (tmp_path / "x.tsv").write_text("a\n1\n")
    with pytest.raises(ValueError, match="unknown op"):
        run_pipeline(
            spark,
            {
                "source": {"format": "tsv", "path": f"{tmp_path}/x.tsv"},
                "steps": [{"op": "explode_everything"}],
            },
        )


def test_quarantine_read_splits_good_and_bad(spark, tmp_path):
    p = tmp_path / "mixed.json"
    p.write_text('{"id": 1, "v": "ok"}\n{broken\n{"id": 2, "v": "fine"}\n{"id": "NaN"}\n')
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    good, bad = read_json_lines_quarantine(spark, str(p), schema)
    assert sorted((r["id"], r["v"]) for r in good.collect()) == [(1, "ok"), (2, "fine")]
    bad_lines = sorted(r["corrupt_record"] for r in bad.collect())
    assert bad_lines == ['{"id": "NaN"}', "{broken"]
