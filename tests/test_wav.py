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
    # MPEG-in-WAV (format 0x55) stays out of scope
    assert wav_decode(_wav(0x55, 1, 8000, 8, bytes([1, 2, 3]))) is None
    # G.711 with a non-8-bit container is malformed
    assert wav_decode(_wav(7, 1, 8000, 16, bytes([1, 2]))) is None
    # ADPCM with an impossible step index (>88) is malformed
    bad_blk = struct.pack("<hBB", 0, 99, 0) + b"\x00" * 4
    assert wav_decode(_wav(0x11, 1, 8000, 4, bad_blk)) is None


def test_g711_companding_matches_audioop_full_range():
    """Byte-exact encode AND 16-bit-exact decode vs CPython's audioop
    (the canonical Sun g711.c tables) over the full int16 range —
    skipped where audioop is gone (3.13+); the analytic registry oracles
    then still pin the same math end-to-end."""
    import pytest

    audioop = pytest.importorskip("audioop")
    from monster_etl_spark.operators.wav import wav_encode_g711

    xs = list(range(-32768, 32768, 17)) + [-32768, -1, 0, 1, 32767]
    pcm = b"".join(struct.pack("<h", x) for x in xs)
    for law, lin2, law2lin in (
        ("ulaw", audioop.lin2ulaw, audioop.ulaw2lin),
        ("alaw", audioop.lin2alaw, audioop.alaw2lin),
    ):
        wav = wav_encode_g711(xs, law, 8000)
        body = wav[wav.rindex(b"data") + 8 :][: len(xs)]
        assert body == lin2(pcm, 2), f"{law} encode differs from g711.c"
        rate, n_ch, bits, dec = wav_decode(wav)
        assert (rate, n_ch, bits, len(dec)) == (8000, 1, 8, len(xs))
        ref = list(struct.unpack(f"<{len(xs)}h", law2lin(body, 2)))
        assert dec == ref, f"{law} decode differs from g711.c"


def test_g711_quantization_error_bounded():
    # companding error grows with the segment: bounded by half the step
    # (2^(seg+3) for mu-law), never worse than ~3.2% of full scale
    from monster_etl_spark.operators.wav import wav_encode_g711

    xs = list(range(-32768, 32768, 251))
    for law in ("ulaw", "alaw"):
        _, _, _, dec = wav_decode(wav_encode_g711(xs, law, 8000))
        worst = max(abs(a - b) for a, b in zip(dec, xs))
        assert worst <= 1024, (law, worst)


def test_adpcm_step_recurrence_matches_audioop():
    """The (predictor, index) state machine is audioop's adpcm2lin
    exactly: decode a raw nibble stream both ways."""
    import pytest

    audioop = pytest.importorskip("audioop")
    from monster_etl_spark.operators.wav import wav_encode_adpcm

    # encode a signal, extract block 0's nibbles, replay them through
    # audioop (high-nibble-first packing there, low-first in WAV)
    xs = [0] + [((k * 37) % 200 - 100) * 80 for k in range(104)]
    wav = wav_encode_adpcm(xs, 8000, block_bytes=256)  # single block
    body = wav[wav.rindex(b"data") + 8 :]
    pred0, idx0, _ = struct.unpack("<hBB", body[:4])
    assert (pred0, idx0) == (xs[0], 0)
    nibbles = []
    for byte in body[4:]:
        nibbles += [byte & 0xF, byte >> 4]
    nibbles = nibbles[: len(xs) - 1]
    raw = bytes(
        (nibbles[k] << 4) | (nibbles[k + 1] if k + 1 < len(nibbles) else 0)
        for k in range(0, len(nibbles), 2)
    )
    ref = struct.unpack(f"<{2 * len(raw)}h", audioop.adpcm2lin(raw, 2, (xs[0], 0))[0])
    _, _, _, dec = wav_decode(wav)
    assert list(dec[1 : len(nibbles) + 1]) == list(ref[: len(nibbles)])


def test_adpcm_blocks_and_fact_trimming():
    from monster_etl_spark.operators.wav import wav_encode_adpcm

    # smooth ramp: ADPCM tracks within a few steps once converged
    xs = [min(32767, k * 16 - 8000) for k in range(300)]
    for block_bytes in (36, 256):
        rate, n_ch, bits, dec = wav_decode(wav_encode_adpcm(xs, 16000, block_bytes))
        assert (rate, n_ch, bits) == (16000, 1, 4)
        assert len(dec) == len(xs)  # fact chunk trims the pad nibble
        spb = (block_bytes - 4) * 2 + 1
        for b0 in range(0, len(xs), spb):
            assert dec[b0] == xs[b0]  # block headers store samples verbatim
        tail_err = max(abs(a - b) for a, b in zip(dec[50:], xs[50:]))
        assert tail_err <= 64, (block_bytes, tail_err)


def test_adpcm_empty_and_single_sample():
    from monster_etl_spark.operators.wav import wav_encode_adpcm

    assert wav_decode(wav_encode_adpcm([], 16000)) == (16000, 1, 4, [])
    assert wav_decode(wav_encode_adpcm([-123], 16000)) == (16000, 1, 4, [-123])


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
