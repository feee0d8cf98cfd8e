"""WAV codec: PCM round-trips, bit depths, float scaling, chunk walking,
channel handling, junk immunity, and the distributed stats pass."""

import struct

from monster_etl_spark.operators.wav import wav_decode, wav_encode_pcm16


def _wav(fmt_code, n_ch, rate, bits, data, extra_chunks=b""):
    fmt = struct.pack("<IHHIIHH", 16, fmt_code, n_ch, rate, 0, 0, bits)
    body = extra_chunks + b"fmt " + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_pcm16_roundtrip_exact():
    s = [0, 100, -32768, 32767, -1, 12345]
    assert wav_decode(wav_encode_pcm16(s, 8000)) == (8000, 1, 16, s)


def test_bit_depths():
    assert wav_decode(_wav(1, 1, 4000, 8, bytes([0, 128, 255]))) == (
        4000, 1, 8, [-128, 0, 127]
    )
    d24 = b"".join(v.to_bytes(3, "little", signed=True) for v in (-8388608, 0, 8388607))
    assert wav_decode(_wav(1, 1, 8000, 24, d24)) == (8000, 1, 24, [-8388608, 0, 8388607])
    d32 = struct.pack("<3i", -(2**31), 0, 2**31 - 1)
    assert wav_decode(_wav(1, 1, 8000, 32, d32)) == (8000, 1, 32, [-(2**31), 0, 2**31 - 1])


def test_float_scaled_to_24bit_grid():
    f = struct.pack("<3f", 0.5, -1.0, 0.25)
    assert wav_decode(_wav(3, 1, 44100, 32, f)) == (
        44100, 1, 32, [4194304, -8388608, 2097152]
    )


def test_chunk_walk_skips_unknown_and_pads_odd():
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # odd length + pad byte
    d = struct.pack("<2h", 7, -7)
    assert wav_decode(_wav(1, 1, 16000, 16, d, extra_chunks=extra)) == (
        16000, 1, 16, [7, -7]
    )


def test_stereo_truncates_partial_frame():
    d = struct.pack("<5h", 1, 2, 3, 4, 5)  # 2.5 stereo frames
    assert wav_decode(_wav(1, 2, 8000, 16, d)) == (8000, 2, 16, [1, 2, 3, 4])


def test_out_of_scope_and_junk_return_none():
    assert wav_decode(b"") is None
    assert wav_decode(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert wav_decode(b"not audio") is None
    # mu-law (format 7) declared out of scope
    assert wav_decode(_wav(7, 1, 8000, 8, bytes([1, 2, 3]))) is None


def test_extract_audio_stats_mixed(spark):
    from monster_etl_spark.operators.multimodal import extract_audio_stats

    good = wav_encode_pcm16([300, -400, 0], 8000)
    rows = [(1, bytearray(good)), (2, bytearray(b"junk"))]
    media = spark.createDataFrame(rows, "media_id: long, content: binary")
    got = {r.media_id: r for r in extract_audio_stats(media).collect()}
    assert got[1].decoded and got[1].sample_rate == 8000
    assert got[1].n_samples == 3 and got[1].peak_abs == 400
    assert abs(got[1].rms - (250000 / 3) ** 0.5) < 1e-9
    assert abs(got[1].duration_sec - 3 / 8000) < 1e-12
    assert not got[2].decoded and got[2].rms is None
