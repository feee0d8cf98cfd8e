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
        "fragmented": False,
        "n_fragments": 0,
        "frag_samples": 0,
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


def test_fmp4_duration_paths_agree():
    """The three fMP4 duration sources must agree on the same movie:
    declared mehd total, summed per-sample trun durations, and the
    trun-without-durations trex-default fallback (round-10 verdict #4).
    mvhd duration is 0 in all three (the real-muxer shape that made the
    pre-fix profiler report 0)."""
    kw = dict(timescale=1000, fragments=3, samples_per_frag=4,
              sample_duration=25)
    want = 3 * 4 * 25  # ticks at ts=1000 -> 300 ms
    via_mehd = mp4_box_profile(mp4_encode(b"p" * 30, **kw))
    via_trun = mp4_box_profile(
        mp4_encode(b"p" * 30, write_mehd=False, **kw))
    via_trex = mp4_box_profile(
        mp4_encode(b"p" * 30, write_mehd=False, trun_durations=False, **kw))
    for p in (via_mehd, via_trun, via_trex):
        assert p is not None and p["fragmented"]
        assert p["duration_ms"] == want
        assert p["n_fragments"] == 3 and p["frag_samples"] == 12
        assert p["mdat_bytes"] == 30
    # plain movies are explicitly un-fragmented
    plain = mp4_box_profile(mp4_encode(b"p", duration=500, timescale=1000))
    assert not plain["fragmented"] and plain["n_fragments"] == 0


def test_fmp4_media_timescale_conversion():
    """trun/trex sample durations count in the TRACK's mdhd media
    timescale; the profiler must convert with that clock, not the
    movie's. (Here both clocks are written by the same synthesizer so
    they agree — this pins that the mdhd parse itself works by checking
    a non-trivial timescale end to end.)"""
    p = mp4_box_profile(mp4_encode(
        b"x", timescale=90000, fragments=2, samples_per_frag=3,
        sample_duration=3000, write_mehd=False))
    assert p["duration_ms"] == 2 * 3 * 3000 * 1000 // 90000 == 200


def test_fmp4_never_raises_on_garbage():
    """Corruption sweep over the fragmented shape: moof/traf/trun/mvex
    structures must profile to None or a dict, never raise."""
    profile = mp4_box_profile_fn()
    whole = mp4_encode(b"frag-payload", fragments=2, samples_per_frag=3,
                       sample_duration=10)
    cases = [whole[:i] for i in range(0, len(whole), 7)]
    for i in range(min(200, len(whole))):
        cases.append(whole[:i] + b"\xff" + whole[i + 1 :])
        cases.append(whole[:i] + b"\x00" + whole[i + 1 :])
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
        if i % 4 == 3:  # fragmented docs: duration from the moof chain
            nf = max(1, i // 40)
            spf, sdur = 1 + i % 3, 20 * (1 + (i // 4) % 2)
            assert r.fragmented and r.n_fragments == nf
            assert r.frag_samples == nf * spf
            assert r.duration_ms == nf * spf * sdur * 1000 // 600
        else:
            assert not r.fragmented and r.n_fragments == 0
            assert r.frag_samples == 0
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
