"""Ogg/Opus page-walk profiler (round-10): synthesizer + profiler
against each other, codec sniffing, the never-raise corruption
contract, and the fused adapter end-to-end."""

from monster_etl_spark.operators.ogg import (
    ogg_encode,
    ogg_page_profile,
    ogg_page_profile_fn,
)


def test_profile_full_field_contract():
    b = ogg_encode(5, channels=2, input_rate=44100, samples_per_page=960)
    assert ogg_page_profile(b) == {
        "codec": "opus",
        "n_pages": 6,  # BOS + 5 audio
        "n_streams": 1,
        "channels": 2,
        "input_rate": 44100,
        "pre_skip": 312,
        "last_granule": 4800,
        # granule counts 48 kHz samples regardless of input rate, and
        # playback duration discards the pre-skip priming samples
        # (RFC 7845); integer floor ms
        "duration_ms": (4800 - 312) * 1000 // 48000,
        "eos_seen": True,
        "body_bytes": 19 + 5 * 100,
    }


def test_profile_pre_skip_subtraction_and_clamp():
    # a custom pre-skip flows through, and a pre-skip exceeding the
    # stream's granule clamps duration at 0 rather than going negative
    p = ogg_page_profile(ogg_encode(2, pre_skip=1000))
    assert p["pre_skip"] == 1000
    assert p["duration_ms"] == (2 * 960 - 1000) * 1000 // 48000
    short = ogg_page_profile(ogg_encode(1, pre_skip=2000))
    assert short["last_granule"] == 960 and short["duration_ms"] == 0


def test_profile_codec_sniff_and_multi_stream():
    import struct

    # a fake vorbis BOS page: same page layout, vorbis ident magic
    ident = b"\x01vorbis" + b"\x00" * 23
    lace = bytes([255] * (len(ident) // 255) + [len(ident) % 255])
    page = (b"OggS" + bytes((0, 0x02))
            + struct.pack("<qIII", 0, 99, 0, 0) + bytes((len(lace),))
            + lace + ident)
    p = ogg_page_profile(page)
    assert p["codec"] == "vorbis" and p["duration_ms"] is None
    assert p["channels"] is None  # OpusHead-only fields
    # a second stream's BOS after the first: counted, not profiled
    two = ogg_encode(2) + page.replace(struct.pack("<I", 99), struct.pack("<I", 7), 1)
    p2 = ogg_page_profile(two)
    assert p2["codec"] == "opus" and p2["n_streams"] == 2


def test_profile_never_raises_on_garbage():
    profile = ogg_page_profile_fn()
    whole = ogg_encode(4, channels=1, input_rate=16000)
    cases = [
        b"",
        b"junk" * 30,
        whole[:10],               # inside the first header
        whole[:-7],               # truncated mid-body
        whole + b"x",             # trailing garbage (not a page)
        b"OggS" + b"\x01" + whole[5:],  # bad version byte
    ]
    for i in range(0, min(60, len(whole))):
        cases.append(whole[:i] + b"\xff" + whole[i + 1 :])
    for c in cases:
        p = profile(c)  # must not raise
        assert p is None or isinstance(p, dict)
    assert profile(whole) is not None


def test_ogg_fused_corpus_end_to_end(spark):
    from monster_etl_spark.operators import multimodal as mm
    from monster_etl_spark.queries.multimodal_queries import _OGG_PROFILE_SCHEMA

    docs = spark.createDataFrame(
        [(i, "y" * (11 * i)) for i in range(8)], "doc_id long, text string"
    )
    out = {
        r.media_id: r
        for r in mm.fused_media_stats(
            docs, mm._ogg_media_worker(), mm._ogg_profile_worker(),
            _OGG_PROFILE_SCHEMA,
        ).collect()
    }
    assert len(out) == 8 and all(out[i].profiled for i in range(8))
    for i in range(8):
        r = out[i]
        np_ = max(1, (11 * i) // 24)
        assert r.codec == "opus" and r.n_pages == np_ + 1
        assert r.channels == 1 + i % 2
        assert r.input_rate == (48000, 44100, 16000)[i % 3]
        assert r.pre_skip == 312 + 24 * (i % 5)
        assert r.last_granule == np_ * 960
        assert r.duration_ms == max(0, np_ * 960 - r.pre_skip) * 1000 // 48000
        assert r.eos_seen and r.body_bytes == 19 + np_ * 100
