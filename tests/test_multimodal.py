"""Multimodal plumbing tests: schema, mapInPandas batch shape, deterministic
fake decode, and the real-decode codec routing."""

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


def test_real_decode_routes_to_codecs():
    """real_decode=True no longer raises — it routes to the shipped
    pixel decoders (round-5 verdict #5). The module-level worker decodes
    a real PNG to its true dims and falls back to fake dims for junk."""
    import pandas as pd

    from monster_etl_spark.operators.png import png_encode_gray8_full

    blob = png_encode_gray8_full(bytes(range(64)), 16)  # 16x4 gray PNG
    junk = b"not an image"
    pdf = pd.DataFrame({"media_id": [1, 2], "content": [blob, junk]})
    out = pd.concat(list(mm.decode_image_batch(iter([pdf]), real_decode=True)))
    by_id = {int(r.media_id): (int(r.width), int(r.height)) for r in out.itertuples()}
    assert by_id[1] == (16, 4)
    n = len(junk)
    assert by_id[2] == ((n % 640) + 1, (n % 480) + 1)


def test_module_fn_and_worker_closure_agree(media):
    """decode_image_batch (unit-testable module fn) and the self-contained
    mapInPandas closure must stay in sync — this pins it."""
    import pandas as pd

    rows = media.limit(20).select("media_id", "content").collect()
    pdf = pd.DataFrame({"media_id": [r["media_id"] for r in rows],
                        "content": [bytes(r["content"]) for r in rows]})
    module_out = pd.concat(list(mm.decode_image_batch(iter([pdf])))).reset_index(drop=True)
    dist_out = (
        mm.extract_image_features(media.limit(20))
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    module_out = module_out.sort_values("media_id").reset_index(drop=True)
    # dtype-normalized compare: the Spark schema types width/height as INT
    # (pandas int32), the module fn emits int64 — values must be identical
    dist_norm = dist_out[module_out.columns].astype("int64")
    assert module_out.astype("int64").equals(dist_norm)


def test_resize_images_plumbing(media):
    out = mm.resize_images(media, width=16, height=12).collect()
    src = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    assert {r["media_id"] for r in out} == src.keys()
    for r in out:
        c = bytes(r["content"])
        assert len(c) == 16 * 12  # fake kernel: exact target byte count
        assert (r["width"], r["height"]) == (16, 12)
        # cycle/truncate is deterministic from the source bytes
        s = src[r["media_id"]]
        assert c == (s * (192 // len(s) + 1))[:192] if s else c == b"\x00" * 192


def test_resize_real_decode_resamples_decoded_pixels(spark, sf_dir):
    """Round-5 verdict #5: real_decode=True must consume the shipped
    pixel decoders, not raise. Nearest-neighbor over decoded PNG pixels
    is analytically checkable: out[y][x] = src[(y*h)//H][(x*w)//W]."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
    png_media = mm.documents_as_png_media(docs, width=32)
    out = {
        r["media_id"]: bytes(r["content"])
        for r in mm.resize_images(png_media, 8, 8, real_decode=True).collect()
    }
    for r in docs.collect():
        data = bytes(r["text"], "utf-8")
        h = max(1, -(-len(data) // 32))
        padded = data.ljust(32 * h, b"\x00")
        expect = bytes(
            padded[((y * h) // 8) * 32 + (x * 32) // 8]
            for y in range(8)
            for x in range(8)
        )
        assert out[r["doc_id"]] == expect

    # undecodable content falls back to the fake cycle/truncate kernel
    raw = mm.documents_as_media(docs)
    fake = {
        r["media_id"]: bytes(r["content"])
        for r in mm.resize_images(raw, 4, 4, real_decode=True).collect()
    }
    for r in docs.collect():
        s = bytes(r["text"], "utf-8")
        want = (s * (16 // len(s) + 1))[:16] if s else b"\x00" * 16
        assert fake[r["doc_id"]] == want


def test_extract_image_features_real_decode_dims(spark, sf_dir):
    """real_decode=True reports FULL-decode dimensions — including TIFF
    and BMP, which the header fast path can't size."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(6)
    for adapter, w in (
        (lambda d: mm.documents_as_png_media(d, width=32), 32),
        (lambda d: mm.documents_as_tiff_media(d, width=32), 32),
        (lambda d: mm.documents_as_bmp_media(d, width=32), 32),
    ):
        feats = {
            r["media_id"]: (r["width"], r["height"])
            for r in mm.extract_image_features(adapter(docs), real_decode=True).collect()
        }
        for r in docs.collect():
            n = len(bytes(r["text"], "utf-8"))
            h = max(1, -(-n // 32))
            assert feats[r["doc_id"]] == (w, h)


def test_frame_sample_ids(media):
    out = mm.frame_sample_ids(media, every_nth=100).limit(5).collect()
    for r in out:
        assert r["frame_ids"][0] == 0
        assert len(r["frame_ids"]) >= 1


def test_audio_window_spans_edges(spark):
    from monster_etl_spark.operators.multimodal import audio_window_spans

    media = spark.createDataFrame(
        [
            ("a", 16000, 40000),  # 2.5s: windows at 0/8k/16k/24k/32k, last two truncated
            ("b", 16000, 16000),  # exactly 1s: [0,16k), [8k,16k) partial
            ("c", 16000, 1),      # single sample: one tiny window
            ("d", 16000, 0),      # empty clip: no spans
        ],
        "media_id: string, sample_rate: long, n_samples: long",
    )
    rows = {
        (r["media_id"], r["win_id"]): (r["start_sample"], r["end_sample"], r["end_sec"])
        for r in audio_window_spans(media).collect()
    }
    assert sum(1 for k in rows if k[0] == "a") == 5
    assert rows[("a", 4)] == (32000, 40000, 2.5)
    assert rows[("b", 0)] == (0, 16000, 1.0)
    assert rows[("b", 1)] == (8000, 16000, 1.0)
    assert rows[("c", 0)] == (0, 1, round(1 / 16000, 6))
    assert not any(k[0] == "d" for k in rows)
    # every clip's samples are fully covered: max end == n
    assert max(v[1] for k, v in rows.items() if k[0] == "a") == 40000


def test_audio_window_spans_subsample_rate(spark):
    """sr so low the hop rounds to zero samples must not divide by zero or
    drop the clip — window/hop clamp to one sample."""
    from monster_etl_spark.operators.multimodal import audio_window_spans

    media = spark.createDataFrame(
        [("tiny", 1, 3)], "media_id: string, sample_rate: long, n_samples: long"
    )
    rows = audio_window_spans(media, win_s=0.5, hop_s=0.25).collect()
    # hop clamps to 1 sample -> 3 windows, each 1 sample wide (win also clamps)
    assert [(r["start_sample"], r["end_sample"]) for r in rows] == [(0, 1), (1, 2), (2, 3)]


def _png(w, h):
    import struct
    import zlib as z

    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", z.crc32(b"IHDR" + ihdr))
    return b"\x89PNG\r\n\x1a\n" + chunk


def _gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00"


def _jpeg(w, h):
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">HBHH", 17, 8, h, w) + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_header_dims_pure():
    """PNG IHDR / JPEG SOF0 / GIF screen descriptor parse to real
    dimensions; truncated or non-image bytes return None (fake path)."""
    from monster_etl_spark.operators.multimodal import _header_dims

    assert _header_dims(_png(640, 480)) == (640, 480)
    assert _header_dims(_png(1, 70000)) == (1, 70000)  # >u16: PNG is u32
    assert _header_dims(_gif(320, 200)) == (320, 200)
    assert _header_dims(_jpeg(1024, 768)) == (1024, 768)
    assert _header_dims(b"plain text payload") is None
    assert _header_dims(_png(640, 480)[:20]) is None  # truncated header
    assert _header_dims(b"\xff\xd8\xff\xe0\x00") is None  # truncated JPEG
    assert _header_dims(b"") is None


def test_extract_image_features_real_headers(spark):
    """The Spark path must report header-parsed dims for real image bytes
    and fall back to the deterministic fake for everything else, in the
    same batch."""
    from monster_etl_spark.operators.multimodal import extract_image_features

    rows = [
        (1, _png(800, 600)),
        (2, _jpeg(123, 45)),
        (3, _gif(64, 32)),
        (4, b"not an image at all"),
    ]
    media = spark.createDataFrame(rows, "media_id: long, content: binary")
    got = {r["media_id"]: (r["width"], r["height"]) for r in
           extract_image_features(media).collect()}
    assert got[1] == (800, 600)
    assert got[2] == (123, 45)
    assert got[3] == (64, 32)
    n = len(b"not an image at all")
    assert got[4] == ((n % 640) + 1, (n % 480) + 1)


# ---- real PNG pixel decode (pure stdlib) ----


def _filter_row(ftype, line, prev, channels):
    """Apply a PNG scanline filter FORWARD (what an encoder does), so the
    decoder's reversal can be verified against the original bytes."""
    out = bytearray()
    for x, b in enumerate(line):
        a = line[x - channels] if x >= channels else 0
        up = prev[x]
        c = prev[x - channels] if x >= channels else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (a + up) >> 1
        else:  # Paeth
            p = a + up - c
            pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
        out.append((b - pred) & 0xFF)
    return bytes(out)


def _png_with_filters(width, height, channels, pixels, ftypes):
    """Hand-built PNG using a chosen filter type per scanline."""
    import struct
    import zlib

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        raw += bytes([ftypes[y]]) + _filter_row(ftypes[y], line, prev, channels)
        prev = line

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_decode_all_filters_roundtrip(channels):
    """Every scanline filter (None/Sub/Up/Average/Paeth) and every
    supported color type must decode back to the exact original pixels."""
    width, height = 7, 5
    stride = width * channels
    pixels = bytes((i * 37 + 11) % 256 for i in range(stride * height))
    blob = _png_with_filters(width, height, channels, pixels, ftypes=[0, 1, 2, 3, 4])
    got = mm.png_decode(blob)
    assert got is not None
    w, h, ch, px = got
    assert (w, h, ch) == (width, height, channels)
    assert px == pixels


def test_png_encode_decode_roundtrip():
    payload = bytes(range(256)) * 3
    blob = mm.png_encode_gray8(payload, width=32)
    w, h, ch, px = mm.png_decode(blob)
    assert (w, ch) == (32, 1)
    assert h == -(-len(payload) // 32)
    assert px[: len(payload)] == payload
    assert set(px[len(payload):]) <= {0}


def test_png_decode_rejects_unsupported():
    # palette type, 16-bit depth, truncated stream, non-PNG
    import struct
    import zlib

    def png(depth, ctype):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, 0)
        body = struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(
            ">I", zlib.crc32(b"IHDR" + ihdr)
        )
        return b"\x89PNG\r\n\x1a\n" + body

    assert mm.png_decode(png(8, 3)) is None  # palette
    assert mm.png_decode(png(16, 0)) is None  # 16-bit
    assert mm.png_decode(b"\x89PNG\r\n\x1a\ntruncated") is None
    assert mm.png_decode(b"GIF89a\x00\x00") is None


def test_extract_pixel_stats_mixed_batch(spark):
    """Real PNGs decode to true stats; junk rows yield decoded=false with
    null stats — never an exception mid-batch."""
    gray = mm.png_encode_gray8(bytes([10, 20, 30, 40]), width=2)
    rows = [(1, gray), (2, b"definitely not a png")]
    media = spark.createDataFrame(rows, "media_id: long, content: binary")
    got = {r["media_id"]: r for r in mm.extract_pixel_stats(media).collect()}
    assert got[1]["decoded"] is True
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (2, 2, 1)
    assert got[1]["mean_intensity"] == pytest.approx(25.0)
    assert (got[1]["min_intensity"], got[1]["max_intensity"]) == (10, 40)
    assert got[2]["decoded"] is False
    assert got[2]["width"] is None and got[2]["mean_intensity"] is None


def test_image_oracles_match_adapters_for_empty_doc(spark, tmp_path):
    """The encoders emit a minimum one-row image for an EMPTY document
    (max(1, ...) in every adapter); the analytic oracles must count that
    all-padding row too (greatest(..., 1) + coalesce), or an empty text
    in the corpus silently breaks the hash gate (round-4 advice)."""
    import duckdb

    from monster_etl_spark.queries import multimodal_queries as mq
    from tests.oracle_harness import canon_rows

    docs = spark.createDataFrame(
        [(1, ""), (2, "hello"), (3, "x" * 67)],
        "doc_id: long, text: string",
    )
    sf = str(tmp_path / "sf_empty")
    docs.write.parquet(f"{sf}/documents.parquet")

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    cases = [
        (mq.multimodal_png_pixel_stats, mq.PNG_PIXEL_SQL),
        (mq.multimodal_gif_pixel_stats, mq.PNG_PIXEL_SQL),
        (mq.multimodal_jpeg_pixel_stats, mq.JPEG_PIXEL_SQL),
        (mq.multimodal_wav_sample_stats, mq.WAV_SAMPLE_SQL),
    ]
    for fn, sql in cases:
        sdf = fn(spark, sf)
        res = con.sql(sql)
        o_cols, o_rows = res.columns, res.fetchall()
        assert sorted(sdf.columns) == sorted(o_cols), fn.__name__
        got = canon_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
        want = canon_rows(o_cols, o_rows)
        assert got == want, f"{fn.__name__}: {got} != {want}"


def test_gif_fused_stats_equals_standalone_composition(spark, sf_dir):
    """Round-8 fusion contract: gif_frame_stats_from_documents (one
    mapInPandas) must be row-identical to the standalone adapter +
    extractor composition (two mapInPandas stages with an Arrow
    round-trip between them)."""
    from monster_etl_spark.operators.multimodal import (
        documents_as_animated_gif_media,
        extract_gif_frame_stats,
        gif_frame_stats_from_documents,
    )
    from monster_etl_spark.queries import load

    docs = load(spark, sf_dir, "documents")
    fused = gif_frame_stats_from_documents(docs).collect()
    media = documents_as_animated_gif_media(docs)
    two_stage = extract_gif_frame_stats(media).collect()
    assert sorted(map(tuple, fused)) == sorted(map(tuple, two_stage))
    assert len(fused) > 0


def test_fused_media_stats_equals_two_stage_all_families(spark, sf_dir):
    """The generic fusion (round-8): for each extractor family, the fused
    one-mapInPandas composition must be row-identical to the standalone
    adapter -> extractor plan it replaces."""
    from monster_etl_spark.operators import multimodal as mm
    from monster_etl_spark.queries import load

    docs = load(spark, sf_dir, "documents")
    cases = [
        (  # pixel family, via the TIFF adapter (LZW + predictor path)
            mm._tiff_media_worker(width=32),
            mm._pixel_stats_worker(),
            mm.PIXEL_STATS_SCHEMA,
            mm.extract_pixel_stats(mm.documents_as_tiff_media(docs, width=32)),
        ),
        (  # audio family, via G.711
            mm._g711_media_worker(law="alaw"),
            mm._audio_stats_worker(),
            mm.AUDIO_STATS_SCHEMA,
            mm.extract_audio_stats(mm.documents_as_g711_media(docs, law="alaw")),
        ),
        (  # video family, via MJPEG-in-AVI
            mm._mjpeg_media_worker(frame_bytes=16, fps=10),
            mm._video_frame_stats_worker(),
            mm.VIDEO_FRAME_SCHEMA,
            mm.extract_video_frame_stats(
                mm.documents_as_mjpeg_media(docs, frame_bytes=16, fps=10)
            ),
        ),
    ]
    for media_w, stats_w, schema, two_stage_df in cases:
        fused = mm.fused_media_stats(docs, media_w, stats_w, schema).collect()
        two = two_stage_df.collect()
        assert sorted(map(tuple, fused)) == sorted(map(tuple, two))
        assert len(fused) > 0


def test_audio_header_profile_fields():
    """Round-9: the audio-container profiler — RIFF fmt / FLAC
    STREAMINFO walk against encoder ground truth; container sniffing,
    integer-floor duration, junk and truncated headers -> None."""
    from monster_etl_spark.operators.flac import flac_encode_pcm16
    from monster_etl_spark.operators.multimodal import audio_header_profile_fn
    from monster_etl_spark.operators.wav import (
        wav_encode_g711,
        wav_encode_pcm16,
    )

    profile = audio_header_profile_fn()
    samples = [(v - 128) * 256 for v in range(100)]

    w = profile(wav_encode_pcm16(samples, 16000))
    assert w == {
        "container": "wav", "wav_format": 1, "sample_rate": 16000,
        "n_channels": 1, "bits_per_sample": 16, "n_samples": 100,
        "duration_ms": 100 * 1000 // 16000,
    }

    f = profile(flac_encode_pcm16(samples, 16000))
    assert f["container"] == "flac" and f["wav_format"] is None
    assert (f["sample_rate"], f["n_channels"], f["bits_per_sample"]) == (16000, 1, 16)
    assert f["n_samples"] == 100 and f["duration_ms"] == 100 * 1000 // 16000

    # a non-PCM RIFF format code is reported, not guessed at
    g = profile(wav_encode_g711([0, 100, -100], law="ulaw", sample_rate=8000))
    assert g["container"] == "wav" and g["wav_format"] == 7
    assert g["sample_rate"] == 8000 and g["n_samples"] == 3

    assert profile(b"") is None
    assert profile(b"RIFFxxxxWAVE") is None  # truncated: no fmt/data
    assert profile(b"not audio at all, just bytes" * 3) is None


def test_audio_header_profile_mixed_corpus(spark):
    """Mixed WAV/FLAC adapter + profiler end-to-end: parity sniffs the
    right container per blob and fields are analytic in text length."""
    from monster_etl_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(0, "abcd"), (1, "xy"), (2, ""), (3, "hello world")],
        "doc_id long, text string",
    )
    out = {
        r.media_id: r
        for r in mm.fused_media_stats(
            docs, mm._mixed_audio_media_worker(sample_rate=16000),
            mm._audio_profile_worker(),
            "media_id long, container string, wav_format int, sample_rate int, "
            "n_channels int, bits_per_sample int, n_samples long, "
            "duration_ms long, profiled boolean",
        ).collect()
    }
    assert [out[i].container for i in range(4)] == ["wav", "flac", "wav", "flac"]
    assert all(out[i].profiled for i in range(4))
    assert [out[i].n_samples for i in range(4)] == [4, 2, 0, 11]
    assert out[3].duration_ms == 11 * 1000 // 16000
