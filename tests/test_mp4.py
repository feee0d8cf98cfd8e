"""MP4/ISO-BMFF box-walk profiler (round-10): synthesizer + profiler
against each other field-by-field across every corpus variant (brand
mix, v0/v1 mvhd, 32/64-bit mdat size, audio present/absent), the
never-raise corruption contract, and the fused adapter end-to-end."""

import pytest

from monster_etl_spark.operators.mp4 import (
    mp4_box_profile,
    mp4_box_profile_fn,
    mp4_encode,
)


def test_profile_full_field_contract():
    b = mp4_encode(
        b"hello world",
        major_brand=b"mp42",
        timescale=600,
        duration=110,
        video=(b"avc1", 80, 48),
        audio=(b"mp4a", 2, 44100),
        mvhd_version=1,
        mdat_largesize=True,
    )
    assert mp4_box_profile(b) == {
        "major_brand": "mp42",
        "timescale": 600,
        "duration_ms": 110 * 1000 // 600,  # integer floor, engine-exact
        "n_tracks": 2,
        "video_codec": "avc1",
        "video_width": 80,
        "video_height": 48,
        "audio_codec": "mp4a",
        "audio_channels": 2,
        "audio_sample_rate": 44100,
        "mdat_bytes": 11,
    }


@pytest.mark.parametrize("mvhd_version", [0, 1])
@pytest.mark.parametrize("largesize", [False, True])
def test_profile_variant_paths_agree(mvhd_version, largesize):
    """v0/v1 mvhd and 32/64-bit mdat size must profile identically —
    the container variants carry the same semantics."""
    kw = dict(
        major_brand=b"isom",
        timescale=1000,
        duration=2500,
        video=(b"vp09", 640, 360),
        audio=None,
    )
    base = mp4_box_profile(mp4_encode(b"x" * 33, **kw))
    got = mp4_box_profile(
        mp4_encode(b"x" * 33, mvhd_version=mvhd_version,
                   mdat_largesize=largesize, **kw)
    )
    assert got == base
    assert base["duration_ms"] == 2500 * 1000 // 1000
    assert base["video_codec"] == "vp09" and base["audio_codec"] is None
    assert base["mdat_bytes"] == 33


def test_profile_audio_only_and_multi_mdat():
    b = mp4_encode(b"abc", video=None, audio=(b"mp4a", 1, 16000))
    p = mp4_box_profile(b)
    assert p["n_tracks"] == 1 and p["video_codec"] is None
    assert (p["audio_channels"], p["audio_sample_rate"]) == (1, 16000)
    # a second mdat appended: sizes sum, structure still valid
    p2 = mp4_box_profile(b + mp4_encode(b"defg", video=None, audio=None)[-12:])
    assert p2["mdat_bytes"] == 3 + 4


def test_profile_never_raises_on_garbage():
    """The corruption contract every decoder in this repo carries: a
    malformed blob profiles to None, never raises mid-batch."""
    profile = mp4_box_profile_fn()
    whole = mp4_encode(b"payload", audio=(b"mp4a", 1, 8000))
    cases = [
        b"",
        b"junk" * 10,
        b"\x00\x00\x00\x08free",           # well-formed but not MP4
        whole[:10],                          # truncated inside ftyp
        whole[:60],                          # truncated inside moov
        whole[:-3],                          # truncated inside mdat
        b"\xff" * 64,
        whole[:4] + b"ftyp" + b"\xff" * 8,  # ftyp then garbage sizes
    ]
    # size-field corruption sweep: flip each of the first 80 bytes to 0xFF
    for i in range(min(80, len(whole))):
        cases.append(whole[:i] + b"\xff" + whole[i + 1 :])
    for c in cases:
        p = profile(c)  # must not raise
        assert p is None or isinstance(p, dict)
    assert profile(whole) is not None


def test_profile_zero_timescale_is_malformed():
    """mvhd timescale 0 is a division-by-zero clock: the strict
    profile-as-None contract applies — no silent max(1, ts) substitute
    (round-10 ADVICE)."""
    good = mp4_encode(b"x" * 10, timescale=600, duration=1200)
    assert mp4_box_profile(good)["duration_ms"] == 2000
    bad = mp4_encode(b"x" * 10, timescale=0, duration=1200)
    assert mp4_box_profile(bad) is None


def test_mp4_fused_corpus_end_to_end(spark):
    """Adapter + profiler through fused_media_stats: the doc_id-derived
    mix (brand, tracks, v1 mvhd, largesize) profiles analytically."""
    from monster_etl_spark.operators import multimodal as mm
    from monster_etl_spark.queries.multimodal_queries import _MP4_PROFILE_SCHEMA

    docs = spark.createDataFrame(
        [(i, "d" * i) for i in range(8)], "doc_id long, text string"
    )
    out = {
        r.media_id: r
        for r in mm.fused_media_stats(
            docs, mm._mp4_media_worker(), mm._mp4_profile_worker(),
            _MP4_PROFILE_SCHEMA,
        ).collect()
    }
    assert len(out) == 8 and all(out[i].profiled for i in range(8))
    for i in range(8):
        r = out[i]
        assert r.major_brand == ("mp42" if i % 3 == 0 else "isom")
        assert r.duration_ms == i * 10 * 1000 // 600
        assert r.n_tracks == (2 if i % 2 == 0 else 1)
        assert (r.video_width, r.video_height) == (
            16 * (1 + i % 5), 16 * (1 + i % 3))
        if i % 2 == 0:
            assert r.audio_codec == "mp4a"
            assert r.audio_channels == 1 + ((i // 2) % 2)
        else:
            assert r.audio_codec is None and r.audio_channels is None
        assert r.mdat_bytes == i
