"""Multimodal plumbing tests: schema, mapInPandas batch shape, deterministic
fake decode, and the real-decode stub gate."""

import pytest
from pyspark.sql import functions as F

from monster_etl_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mm.documents_as_media(docs)


def test_media_schema(media):
    assert dict(media.dtypes) == {
        "media_id": "bigint",
        "content": "binary",
        "meta": "struct<mime:string,source:string>",
    }


def test_extract_image_features(media):
    feats = mm.extract_image_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    src = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    assert rows.keys() == src.keys()
    for mid, r in rows.items():
        n = len(src[mid])
        assert r["n_bytes"] == n
        assert r["width"] == (n % 640) + 1
        assert r["height"] == (n % 480) + 1
        import zlib

        assert r["byte_crc"] == zlib.crc32(src[mid])


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        list(mm.decode_image_batch(iter([]), real_decode=True))


def test_frame_sample_ids(media):
    out = mm.frame_sample_ids(media, every_nth=100).limit(5).collect()
    for r in out:
        assert r["frame_ids"][0] == 0
        assert len(r["frame_ids"]) >= 1
