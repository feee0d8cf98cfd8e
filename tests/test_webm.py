"""Matroska/WebM EBML element-walk profiler (round-11): synthesizer +
profiler against each other, vint edge cases, the unknown-size
streaming Segment, the never-raise corruption contract, and the fused
adapter end-to-end."""

from monster_etl_spark.operators.webm import (
    webm_encode,
    webm_profile,
    webm_profile_fn,
)


def test_profile_full_field_contract():
    p = webm_profile(webm_encode(5))
    assert p == {
        "doc_type": "webm",
        "doc_type_version": 4,
        "timestamp_scale": 1_000_000,
        # 5 clusters x 40 ticks x 1ms/tick
        "duration_ms": 200,
        "n_tracks": 2,
        "video_codec": "V_VP9",
        "video_width": 640,
        "video_height": 360,
        "audio_codec": "A_OPUS",
        "audio_channels": 2,
        "audio_sample_rate": 48000,
        "n_clusters": 5,
        "block_bytes": 5 * 84,  # 4 framing + 80 data per SimpleBlock
    }


def test_profile_timestamp_scale_and_matroska():
    # a 500us tick halves the millisecond duration; matroska doc type
    # and an H.264 codec id pass through; no audio track
    p = webm_profile(webm_encode(
        6, doc_type="matroska", audio=None,
        video=("V_MPEG4/ISO/AVC", 320, 240), timestamp_scale=500_000,
    ))
    assert p["doc_type"] == "matroska" and p["n_tracks"] == 1
    assert p["video_codec"] == "V_MPEG4/ISO/AVC"
    assert p["duration_ms"] == 6 * 40 * 500_000 // 1_000_000 == 120
    assert p["audio_codec"] is None and p["audio_sample_rate"] is None


def test_profile_unknown_segment_size():
    """RFC 8794 all-ones size: a streaming/live Segment extends to end
    of buffer and must profile identically to the sized form."""
    sized = webm_profile(webm_encode(4))
    streaming = webm_profile(webm_encode(4, unknown_segment_size=True))
    assert streaming == sized


def test_profile_vint_multibyte_sizes():
    """Cluster payloads > 127 bytes force 2-byte size vints; very large
    block_data exercises longer ones. The walk must skip by size, not
    by guessing."""
    p = webm_profile(webm_encode(2, block_data=5000))
    assert p["n_clusters"] == 2 and p["block_bytes"] == 2 * 5004


def test_profile_never_raises_on_garbage():
    profile = webm_profile_fn()
    whole = webm_encode(3)
    cases = [
        b"",
        b"junk" * 20,
        whole[:3],
        whole[:-5],
        whole + b"\x00\x00",
        b"\x1a\x45\xdf\xa3" + b"\xff" * 10,
    ]
    for i in range(min(120, len(whole))):
        cases.append(whole[:i] + b"\xff" + whole[i + 1 :])
        cases.append(whole[:i] + b"\x00" + whole[i + 1 :])
    for c in cases:
        p = profile(c)  # must not raise
        assert p is None or isinstance(p, dict)
    assert profile(whole) is not None


def test_webm_fused_corpus_end_to_end(spark):
    from monster_etl_spark.operators import multimodal as mm
    from monster_etl_spark.queries.multimodal_queries import (
        _WEBM_PROFILE_SCHEMA,
    )

    docs = spark.createDataFrame(
        [(i, "w" * (9 * i)) for i in range(10)], "doc_id long, text string"
    )
    out = {
        r.media_id: r
        for r in mm.fused_media_stats(
            docs, mm._webm_media_worker(), mm._webm_profile_worker(),
            _WEBM_PROFILE_SCHEMA,
        ).collect()
    }
    assert len(out) == 10 and all(out[i].profiled for i in range(10))
    for i in range(10):
        r = out[i]
        np_ = max(1, (9 * i) // 28)
        sc = 500_000 if i % 3 == 0 else 1_000_000
        assert r.doc_type == ("webm" if i % 2 == 0 else "matroska")
        assert r.timestamp_scale == sc
        assert r.duration_ms == np_ * 40 * sc // 1_000_000
        assert r.video_codec == ("V_VP9", "V_VP8", "V_AV1")[i % 3]
        assert (r.video_width, r.video_height) == (
            16 * (1 + i % 5), 16 * (1 + i % 3))
        if i % 2 == 0:
            assert r.audio_codec == ("A_OPUS" if i % 4 == 0 else "A_VORBIS")
            assert r.audio_sample_rate == (48000 if i % 4 == 0 else 44100)
            assert r.n_tracks == 2
        else:
            assert r.audio_codec is None and r.n_tracks == 1
        assert r.n_clusters == np_ and r.block_bytes == np_ * 84
