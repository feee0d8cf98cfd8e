"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque ``binary`` columns plus a typed metadata struct —
the only Spark-native way to move large blobs through a distributed plan
without driver involvement. Decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` (one Python worker per partition, columnar
batch transfer), which is the correct shape for Python-only media libs at
any scale: partitions stream through workers, nothing is collected.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
``decode_image_batch`` routes to a clearly-marked deterministic fake when
``real_decode=False`` (the default) and raises ``NotImplementedError``
otherwise. The Spark-side plumbing — schema, batch iteration, partitioning,
UDF signature — is real and tested either way.

Scale notes: blobs never pass through a shuffle here (mapInPandas is a
narrow transformation); keep it that way — filter/project on metadata
columns *before* decode so pruned rows never cross into Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("byte_crc", T.LongType()),
    ]
)


def _fake_decode(content: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decode: 'dimensions' derived from
    content length. Replace with a real codec when available."""
    n = len(content)
    return (n % 640) + 1, (n % 480) + 1


def decode_image_batch(
    batches: "Iterator[pd.DataFrame]", real_decode: bool = False
) -> "Iterator[pd.DataFrame]":
    """mapInPandas worker: binary content -> (dims + checksum) features.

    Batch shape: input columns (media_id, content); output matches
    IMAGE_FEATURES_SCHEMA. Pure per-row computation — safe to run on any
    partitioning.
    """
    import pandas as pd
    import zlib

    if real_decode:
        raise NotImplementedError(
            "real image decode requires PIL/imageio, not present in this environment"
        )
    for pdf in batches:
        dims = [_fake_decode(c) for c in pdf["content"]]
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"].astype("int64"),
                "n_bytes": [len(c) for c in pdf["content"]],
                "width": [w for w, _ in dims],
                "height": [h for _, h in dims],
                "byte_crc": [zlib.crc32(bytes(c)) for c in pdf["content"]],
            }
        )


def extract_image_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Distributed decode/feature pass over a media table: projects the two
    needed columns first (blob + id — nothing else crosses to Python), then
    streams Arrow batches through the decode worker.

    The worker function is a self-contained closure (no references to this
    module) so cloudpickle ships it *by value* — Python workers need neither
    this package on their path nor any import beyond pandas/zlib. Module-
    level UDFs pickle by reference and break on executors without the
    package installed.
    """
    if real_decode:
        raise NotImplementedError(
            "real image decode requires PIL/imageio, not present in this environment"
        )

    def _worker(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            contents = [bytes(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": [len(c) for c in contents],
                    "width": [(len(c) % 640) + 1 for c in contents],
                    "height": [(len(c) % 480) + 1 for c in contents],
                    "byte_crc": [zlib.crc32(c) for c in contents],
                }
            )

    return media.select("media_id", "content").mapInPandas(
        _worker, schema=IMAGE_FEATURES_SCHEMA
    )


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter used by tests/queries: synthesize a media table (binary
    content column + metadata struct) from the documents table, since the
    test corpus ships no real blobs."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def resize_images(
    media: DataFrame, width: int, height: int, real_decode: bool = False
) -> DataFrame:
    """Resize plumbing: binary in -> binary out through Arrow-batched
    ``mapInPandas`` (blobs never leave the partition; metadata-only columns
    prune before the Python hop). The resize KERNEL is the deterministic
    fake (cycle/truncate bytes to exactly ``width*height``) because no
    image codec ships in this container — swap the kernel body for
    PIL's ``Image.resize`` when available; the Spark-side shape (schema,
    batching, narrow plan) is the real, tested part.
    """
    if real_decode:
        raise NotImplementedError(
            "real image resize requires PIL/imageio, not present in this environment"
        )
    target = width * height

    def _worker(batches):
        import pandas as pd

        for pdf in batches:
            contents = [bytes(c) for c in pdf["content"]]
            resized = [
                (c * (target // len(c) + 1))[:target] if c else b"\x00" * target
                for c in contents
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "content": resized,
                    "width": width,
                    "height": height,
                }
            )

    return media.select("media_id", "content").mapInPandas(
        _worker, schema="media_id long, content binary, width int, height int"
    )


def frame_sample_ids(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling shape without a codec: deterministic sample positions
    from metadata only (no decode) — the pre-filter that keeps full decode
    off the hot path at scale."""
    return media.select(
        "media_id",
        F.sequence(
            F.lit(0), (F.octet_length("content") / F.lit(every_nth)).cast("int")
        ).alias("frame_ids"),
    )


def audio_window_spans(
    media: DataFrame,
    sample_rate_col: str = "sample_rate",
    n_samples_col: str = "n_samples",
    win_s: float = 1.0,
    hop_s: float = 0.5,
) -> DataFrame:
    """Audio framing plumbing (the windowing pass of an ASR/feature
    pipeline) from typed metadata only — no decode, no Python. One span
    per hop while the window start is inside the clip; the final window
    is truncated at the clip end (every sample is covered, trailing
    partials included). Pure `sequence` + `explode` + arithmetic — a
    narrow map whose output is ~n/hop rows per clip, so at 100 TB the
    spans table streams straight into the (stubbed) decode stage with no
    shuffle.

    Returns (media_id, win_id, start_sample, end_sample, start_sec,
    end_sec); rows with zero samples produce no spans.
    """
    sr = F.col(sample_rate_col).cast("long")
    n = F.col(n_samples_col).cast("long")
    # clamp to >= 1 sample: a sub-sample window/hop (sr * secs < 1) would
    # otherwise divide by zero and silently drop the clip
    win = F.greatest(F.floor(sr * F.lit(float(win_s))).cast("long"), F.lit(1).cast("long"))
    hop = F.greatest(F.floor(sr * F.lit(float(hop_s))).cast("long"), F.lit(1).cast("long"))
    spans = media.filter(n > 0).select(
        "media_id",
        sr.alias("__sr__"),
        n.alias("__n__"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.floor((n - 1) / hop).cast("long"))
        ).alias("win_id"),
        win.alias("__win__"),
        hop.alias("__hop__"),
    )
    start = F.col("win_id") * F.col("__hop__")
    end = F.least(start + F.col("__win__"), F.col("__n__"))
    return spans.select(
        "media_id",
        "win_id",
        start.alias("start_sample"),
        end.alias("end_sample"),
        F.round(start.cast("double") / F.col("__sr__"), 6).alias("start_sec"),
        F.round(end.cast("double") / F.col("__sr__"), 6).alias("end_sec"),
    )
