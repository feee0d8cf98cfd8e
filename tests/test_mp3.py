"""MP3/MPEG-audio frame-walk profiler (round-10): synthesizer +
profiler against each other across the parameter mix (bitrate table,
rates, mono/stereo, ID3 tag), VBR detection, the never-raise corruption
contract, and the fused adapter end-to-end."""

import pytest

from monster_etl_spark.operators.mp3 import (
    MPEG1_L3_BITRATES,
    mp3_encode,
    mp3_frame_profile,
    mp3_frame_profile_fn,
)


def test_profile_full_field_contract():
    b = mp3_encode(10, bitrate_idx=9, rate_idx=0, mono=False, id3=True)
    assert mp3_frame_profile(b) == {
        "version": "1",
        "layer": 3,
        "bitrate_kbps": 128,  # table index 9
        "sample_rate": 44100,
        "channel_mode": "stereo",
        "n_frames": 10,
        "cbr": True,
        "duration_ms": 10 * 1152 * 1000 // 44100,  # integer floor
        "id3_bytes": 64,
        "stream_bytes": len(b),
        "vbr_header": None,
    }


def test_xing_fast_path_and_fallback():
    """Round-10 verdict #6: a first-frame Xing/Info tag with frame+byte
    totals is trusted at O(1) frames read — n_frames/duration are the
    tag's audio-frame totals, cbr is the tag's verdict — and ANY
    inconsistency falls back to the full walk (which then counts the
    tag frame like any other)."""
    x = mp3_frame_profile(mp3_encode(10, xing="xing"))
    assert x["n_frames"] == 10 and x["vbr_header"] == "xing" and not x["cbr"]
    assert x["duration_ms"] == 10 * 1152 * 1000 // 44100
    i = mp3_frame_profile(mp3_encode(7, xing="info", mono=True, rate_idx=1))
    assert i["n_frames"] == 7 and i["vbr_header"] == "info" and i["cbr"]
    assert i["channel_mode"] == "mono"
    assert i["duration_ms"] == 7 * 1152 * 1000 // 48000
    # id3 + xing compose; stream_bytes counts the tag frame
    flen = 144 * 128 * 1000 // 44100
    c = mp3_frame_profile(mp3_encode(4, xing="xing", id3=True))
    assert c["id3_bytes"] == 64 and c["n_frames"] == 4
    assert c["stream_bytes"] == 64 + 5 * flen
    # corrupt the tag's byte total: profiler must WALK instead of trust
    # (6 frames counted: tag + 5 audio), never return the wrong fast
    # answer
    b = mp3_encode(5, xing="xing")
    t = 4 + 32 + 12  # bytes-field offset in the first frame
    bad = b[:t] + (999_999).to_bytes(4, "big") + b[t + 4 :]
    f = mp3_frame_profile(bad)
    assert f["n_frames"] == 6 and f["vbr_header"] == "xing" and f["cbr"]
    # garbage sweep over a tagged stream never raises
    whole = mp3_encode(6, xing="info")
    for j in range(min(150, len(whole))):
        r = mp3_frame_profile(whole[:j] + b"\xff" + whole[j + 1 :])
        assert r is None or isinstance(r, dict)


@pytest.mark.parametrize("bitrate_idx", range(1, 15))
@pytest.mark.parametrize("rate_idx", range(3))
def test_profile_whole_parameter_table(bitrate_idx, rate_idx):
    """Every (bitrate, rate) cell of the MPEG1-L3 table round-trips:
    the frame-length hop lands exactly on end-of-stream for all of
    them (an off-by-one in the length formula would shift every
    subsequent header and profile as None)."""
    b = mp3_encode(4, bitrate_idx=bitrate_idx, rate_idx=rate_idx, mono=True)
    p = mp3_frame_profile(b)
    assert p is not None and p["n_frames"] == 4 and p["cbr"]
    assert p["bitrate_kbps"] == MPEG1_L3_BITRATES[bitrate_idx - 1]
    assert p["sample_rate"] == (44100, 48000, 32000)[rate_idx]
    assert p["channel_mode"] == "mono"


def test_profile_vbr_detection():
    vbr = mp3_encode(2, bitrate_idx=5) + mp3_encode(3, bitrate_idx=9)
    p = mp3_frame_profile(vbr)
    assert p["cbr"] is False and p["n_frames"] == 5
    assert p["bitrate_kbps"] == 64  # first frame's, by contract
    # duration accumulates per frame, so it is VBR-safe by construction
    assert p["duration_ms"] == 5 * 1152 * 1000 // 44100


def test_profile_never_raises_on_garbage():
    profile = mp3_frame_profile_fn()
    whole = mp3_encode(6, bitrate_idx=3, rate_idx=1, id3=True)
    cases = [
        b"",
        b"junk" * 20,
        whole[:3],                    # inside the ID3 magic
        whole[: len(whole) - 5],      # truncated mid-frame
        whole + b"trailing",          # garbage after the last frame
        b"ID3\x03\x00\x00\x00\x00\x7f\x7f",  # tag size past EOF
        b"\xff\xfb\x00\x00",          # bitrate index 0 (free format)
        b"\xff\xfb\xf0\x00",          # bitrate index 15 (reserved)
        b"\xff\xeb\x90\x00" + b"\x00" * 400,  # reserved version bits
    ]
    for i in range(0, min(60, len(whole))):
        cases.append(whole[:i] + b"\xff" + whole[i + 1 :])
    for c in cases:
        p = profile(c)  # must not raise
        assert p is None or isinstance(p, dict)
    assert profile(whole) is not None


def test_mp3_fused_corpus_end_to_end(spark):
    """Adapter + profiler through fused_media_stats: the doc_id-derived
    parameter mix profiles analytically, including the tag-skip docs."""
    from monster_etl_spark.operators import multimodal as mm
    from monster_etl_spark.queries.multimodal_queries import _MP3_PROFILE_SCHEMA

    docs = spark.createDataFrame(
        [(i, "x" * (7 * i)) for i in range(10)], "doc_id long, text string"
    )
    out = {
        r.media_id: r
        for r in mm.fused_media_stats(
            docs, mm._mp3_media_worker(), mm._mp3_profile_worker(),
            _MP3_PROFILE_SCHEMA,
        ).collect()
    }
    assert len(out) == 10 and all(out[i].profiled for i in range(10))
    for i in range(10):
        r = out[i]
        n = 7 * i
        nf = max(1, n // 16)
        rate = (44100, 48000, 32000)[i % 3]
        br = MPEG1_L3_BITRATES[i % 14]
        assert r.bitrate_kbps == br and r.sample_rate == rate
        assert r.channel_mode == ("mono" if i % 2 else "stereo")
        assert r.n_frames == nf and r.cbr == (i % 5 != 2)
        assert r.vbr_header == {2: "xing", 4: "info"}.get(i % 5)
        assert r.duration_ms == nf * 1152 * 1000 // rate
        assert r.id3_bytes == (64 if i % 4 == 0 else 0)
        tagf = 1 if i % 5 in (2, 4) else 0
        assert r.stream_bytes == r.id3_bytes + (nf + tagf) * (
            144000 * br // rate)
