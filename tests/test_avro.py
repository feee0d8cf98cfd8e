"""Avro OCF codec + jar-less Spark source: round-trips over the full
type surface, named-type references, codec paths, malformed-input
errors, and the distributed read/write fallback."""

import json

import pytest

from monster_etl_spark.sources.avro_py import (
    avro_read_blob,
    avro_schema_to_ddl,
    avro_write_blob,
)

FULL_SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "tokens", "type": {"type": "array", "items": "string"}},
        {"name": "score", "type": "double"},
        {"name": "ratio", "type": "float"},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "kind", "type": {"type": "enum", "name": "K", "symbols": ["A", "B", "C"]}},
        {"name": "sig", "type": {"type": "fixed", "name": "Sig", "size": 4}},
        {"name": "sig2", "type": "Sig"},  # named-type reference
        {"name": "nested", "type": {"type": "record", "name": "N", "fields": [
            {"name": "flag", "type": "boolean"},
            {"name": "payload", "type": "bytes"},
        ]}},
    ],
}


def _records(n):
    return [
        {
            "doc_id": i,
            "text": None if i % 3 == 0 else f"text {i}",
            "tokens": [f"w{j}" for j in range(i % 5)],
            "score": i * 0.5,
            "ratio": float(i % 7),
            "props": {"a": i, "b": -i},
            "kind": "ABC"[i % 3],
            "sig": bytes([i & 255] * 4),
            "sig2": bytes([255 - (i & 255)] * 4),
            "nested": {"flag": i % 2 == 0, "payload": bytes([i & 255])},
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_full_type_surface(codec):
    recs = _records(2500)  # spans multiple 1000-record blocks
    blob = avro_write_blob(FULL_SCHEMA, recs, codec)
    schema, out = avro_read_blob(blob)
    assert out == recs
    assert schema["name"] == "Doc"


def test_deflate_actually_compresses():
    recs = _records(2000)
    assert len(avro_write_blob(FULL_SCHEMA, recs, "deflate")) < 0.7 * len(
        avro_write_blob(FULL_SCHEMA, recs, "null")
    )


def test_varint_zigzag_edges():
    s = {"type": "record", "name": "E", "fields": [{"name": "v", "type": "long"}]}
    edge = [{"v": x} for x in (0, -1, 1, 63, 64, -64, -65, 2**62, -(2**62))]
    assert avro_read_blob(avro_write_blob(s, edge))[1] == edge


def test_deterministic_output():
    recs = _records(50)
    assert avro_write_blob(FULL_SCHEMA, recs) == avro_write_blob(FULL_SCHEMA, recs)


def test_malformed_inputs_raise():
    blob = bytearray(avro_write_blob(FULL_SCHEMA, _records(10)))
    with pytest.raises(ValueError):
        avro_read_blob(b"NOPE" + bytes(blob[4:]))
    corrupted = bytes(blob[:-8]) + b"\x00" * 8  # clobber the block sync
    with pytest.raises(ValueError):
        avro_read_blob(corrupted)
    with pytest.raises(ValueError):
        avro_write_blob(FULL_SCHEMA, _records(5), codec="snappy") and None
    with pytest.raises(ValueError):
        avro_read_blob(avro_write_blob(FULL_SCHEMA, _records(5), "snappy"))


def test_schema_to_ddl():
    ddl = avro_schema_to_ddl(FULL_SCHEMA)
    assert "doc_id long" in ddl and "tokens array<string>" in ddl
    assert "props map<string, long>" in ddl and "kind string" in ddl
    assert "nested struct<flag: boolean, payload: binary>" in ddl
    with pytest.raises(ValueError):
        avro_schema_to_ddl(
            {"type": "record", "name": "X", "fields": [
                {"name": "u", "type": ["int", "string"]}  # non-nullable union
            ]}
        )


def test_read_avro_py_distributed(spark, tmp_path):
    from monster_etl_spark.sources.columnar import read_avro, read_avro_py

    schema = {"type": "record", "name": "R", "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
    ]}
    for g in range(3):
        recs = [{"k": i, "s": None if i % 4 == 0 else f"v{i}", "xs": [i, i * 2]}
                for i in range(g * 100, (g + 1) * 100)]
        (tmp_path / f"part-{g}.avro").write_bytes(avro_write_blob(schema, recs))
    df = read_avro_py(spark, f"{tmp_path}/*.avro")
    assert df.count() == 300
    rows = {r["k"]: r for r in df.collect()}
    assert rows[0]["s"] is None and rows[1]["s"] == "v1"
    assert rows[7]["xs"] == [7, 14]
    # the dispatching wrapper lands on the same fallback in this container
    assert read_avro(spark, f"{tmp_path}/*.avro").count() == 300


def test_write_avro_py_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from monster_etl_spark.sources.columnar import read_avro_py, write_avro_py

    df = spark.range(500).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 5 != 0, F.concat(F.lit("s"), F.col("id"))).alias("s"),
        F.array(F.col("id"), F.col("id") * 3).alias("xs"),
    )
    out = str(tmp_path / "out")
    write_avro_py(df, out)
    back = read_avro_py(spark, f"{out}/*.avro")
    assert back.count() == 500
    got = {r["k"]: r for r in back.collect()}
    assert got[0]["s"] is None and got[1]["s"] == "s1" and got[9]["xs"] == [9, 27]


def test_split_ocf_block_boundaries():
    """split_ocf walks block boundaries without decoding: each chunk is a
    valid standalone OCF (header + whole blocks) and the concatenated
    record streams equal the original."""
    from monster_etl_spark.sources.avro_py import _build_avro_codec

    codec = _build_avro_codec()
    schema = {"type": "record", "name": "R",
              "fields": [{"name": "k", "type": "long"},
                         {"name": "s", "type": "string"}]}
    recs = [{"k": i, "s": f"v{i}" * 20} for i in range(5000)]
    blob = codec["write_ocf"](schema, recs, codec="deflate", block_records=250)
    # small target -> many chunks; each must decode independently
    chunks = codec["split_ocf"](blob, target_bytes=4096)
    assert len(chunks) > 3
    out = []
    for ch in chunks:
        sj, rs = codec["read_ocf"](ch)
        assert sj["name"] == "R"
        out.extend(rs)
    assert out == recs
    # oversized target: untouched
    assert codec["split_ocf"](blob, target_bytes=1 << 30) == [blob]


def test_read_avro_py_splits_single_large_file(spark, tmp_path):
    """One large .avro file must decode across >1 task (round-5 verdict
    item 6): the plan carries the round-robin exchange between the
    boundary-walk pass and the decode pass, and rows are unchanged."""
    from monster_etl_spark.sources.avro_py import avro_write_blob
    from monster_etl_spark.sources.columnar import read_avro_py

    schema = {"type": "record", "name": "Big",
              "fields": [{"name": "k", "type": "long"},
                         {"name": "payload", "type": "string"}]}
    recs = [{"k": i, "payload": ("x" * 200) + str(i)} for i in range(20000)]
    # null codec so the blob comfortably exceeds a small split target;
    # monkey-patch the split size via the module constant instead? the
    # reader uses 32 MB — write ~45 MB so it genuinely splits
    big = avro_write_blob(schema, recs, codec="null")
    reps = (45 * (1 << 20)) // len(big) + 1
    # many blocks of the same records: vary k per block-run via distinct
    # writes appended is invalid OCF; instead write one file with enough
    # records to cross 32 MB
    n = reps * 20000
    recs = [{"k": i, "payload": ("x" * 200) + str(i)} for i in range(n)]
    big = avro_write_blob(schema, recs, codec="null")
    assert len(big) > (1 << 25)
    (tmp_path / "one.avro").write_bytes(big)
    df = read_avro_py(spark, f"{tmp_path}/one.avro")
    # decode stage parallelism: the repartition pins >1 partition
    assert df.rdd.getNumPartitions() > 1
    assert df.count() == n
    sample = {r["k"]: r["payload"] for r in df.filter("k % 10007 = 0").collect()}
    for k, v in sample.items():
        assert v == ("x" * 200) + str(k)
