"""Chunking and mixture-weights operator semantics."""

import pytest
from pyspark.sql import functions as F

from monster_etl_spark.operators import text as tx


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


def test_chunk_documents_windows_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(10))
    out = tx.chunk_documents(
        _docs(spark, [(1, words)]), chunk_tokens=4, overlap=1
    ).collect()
    # stride 3: chunks at 0,3,6,9 -> ceil((10-1)/3)=3 chunks
    chunks = {r["chunk_id"]: r for r in out}
    assert sorted(chunks) == [0, 1, 2]
    assert chunks[0]["chunk_text"] == "w0 w1 w2 w3"
    assert chunks[1]["chunk_text"] == "w3 w4 w5 w6"  # 1-token overlap
    assert chunks[2]["chunk_text"] == "w6 w7 w8 w9"
    assert all(r["n_chunk_tokens"] == 4 for r in out)


def test_chunk_documents_short_doc_single_chunk(spark):
    out = tx.chunk_documents(_docs(spark, [(1, "just two")]), chunk_tokens=64, overlap=16).collect()
    assert len(out) == 1
    assert out[0]["chunk_id"] == 0
    assert out[0]["n_chunk_tokens"] == 2
    assert out[0]["chunk_text"] == "just two"


def test_chunk_documents_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        tx.chunk_documents(_docs(spark, [(1, "a")]), chunk_tokens=4, overlap=4)


def test_mixture_weights_epochs_and_drops(spark):
    rows = [(i, f"src{i % 3}") for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    out = tx.mixture_weights(d, "source", {"src0": 3.0, "src1": 0.0}, id_col="doc_id")
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["src0"] == 300  # exactly 3 epochs each, no fractional part
    assert "src1" not in counts  # dropped entirely
    assert counts["src2"] == 100  # default weight 1.0
    # epochs are 0..2 for the up-sampled source
    epochs = {r["epoch"] for r in out.filter("source = 'src0'").collect()}
    assert epochs == {0, 1, 2}


def test_mixture_weights_fractional_is_deterministic(spark):
    rows = [(i, "s") for i in range(1000)]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    n1 = tx.mixture_weights(d, "source", {"s": 0.5}, id_col="doc_id").count()
    n2 = tx.mixture_weights(d, "source", {"s": 0.5}, id_col="doc_id").count()
    assert n1 == n2  # hash-determined, not seeded-random
    assert 380 <= n1 <= 620  # ~half kept
