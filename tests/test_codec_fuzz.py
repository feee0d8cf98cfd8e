"""Cross-codec boundary fuzz: deterministic random/tiny-alphabet/
periodic/constant inputs at sizes that cross code-width and table
boundaries (LZW 9->10->..12-bit bumps, 4094-entry clears, strip/block
edges), round-tripped through every lossless codec. This input class
found the latent TIFF early-change tail bug (see
test_tiff.test_lzw_width_bump_on_final_code) — text corpora never
reach those boundaries, so this is the only coverage they get."""

import random

from monster_etl_spark.operators.bmp import _build_bmp_codec
from monster_etl_spark.operators.flac import _build_flac_codec
from monster_etl_spark.operators.gif import _build_gif_codec
from monster_etl_spark.operators.jpeg import _build_jpeg_codec
from monster_etl_spark.operators.png import _build_png_codec
from monster_etl_spark.operators.tiff import _build_tiff_codec
from monster_etl_spark.operators.wav import _build_wav_codec
from monster_etl_spark.operators.webp import _build_webp_codec

SIZES = [1, 3, 31, 250, 256, 263, 1000, 4095, 4097, 9000]


def _byte_inputs():
    rng = random.Random(20260816)
    for size in SIZES:
        yield bytes(rng.randrange(256) for _ in range(size))
        yield bytes(rng.randrange(4) * 85 for _ in range(size))
        yield (b"ab" * ((size + 1) // 2))[:size]
        yield bytes([7]) * size


def _gray1(data, w=32):
    h = max(1, -(-len(data) // w))
    return (w, h, 1, data + b"\x00" * (w * h - len(data)))


def _gray3(data, w=32):
    w_, h, _, v = _gray1(data, w)
    return (w_, h, 3, b"".join(bytes((x, x, x)) for x in v))


def test_image_codecs_roundtrip_boundary_inputs():
    P = _build_png_codec()
    G = _build_gif_codec()
    B = _build_bmp_codec()
    W = _build_webp_codec()
    T = _build_tiff_codec()
    for data in _byte_inputs():
        e1, e3 = _gray1(data), _gray3(data)
        for il in (False, True):
            assert P["decode"](P["encode_gray8"](data, 32, il)) in (e1, e3)
        assert G["decode"](G["encode_gray8"](data, 32)) in (e1, e3)
        assert B["decode"](B["encode_gray8"](data, 32)) in (e1, e3)
        for mode in ("lz77", "predictor", "palette"):
            for static in (False, True):
                blob = W["encode_gray8"](data, 32, mode, static)
                assert W["decode"](blob) == e3, (mode, static, len(data))
        for comp in (5, 1, 32773):
            for pred in (1, 2):
                blob = T["encode_gray8"](
                    data, 32, compression=comp, predictor=pred
                )
                assert T["decode"](blob) == e1, (comp, pred, len(data))


def test_jpeg_boundary_inputs_decode():
    # lossy: assert decodability + geometry, not pixel equality
    J = _build_jpeg_codec()
    rng = random.Random(20260818)
    for size in (250, 1000, 9000):
        data = bytes(rng.randrange(256) for _ in range(size))
        for ri in (0, 2):
            d = J["decode"](J["encode_gray8"](data, 32, restart_interval=ri))
            assert d is not None and d[0] == 32
        d = J["decode"](J["encode_gray8_progressive"](data, 32))
        assert d is not None and d[0] == 32


def test_audio_codecs_roundtrip_boundary_inputs():
    Wv = _build_wav_codec()
    F = _build_flac_codec()
    rng = random.Random(20260817)
    for size in (1, 96, 256, 257, 4097, 9000):
        for gen in (
            lambda: [rng.randrange(-32768, 32768) for _ in range(size)],
            lambda: [(i * 997) % 65536 - 32768 for i in range(size)],
            lambda: [32767 if i % 2 else -32768 for i in range(size)],
            lambda: [0] * size,
        ):
            s = gen()
            assert list(Wv["decode"](Wv["encode_pcm16"](s, 16000))[3]) == s
            assert list(F["decode"](F["encode_pcm16"](s, 16000, 1))[3]) == s
            assert Wv["decode"](Wv["encode_adpcm"](s, 16000)) is not None
            assert Wv["decode"](Wv["encode_g711"](s, "ulaw")) is not None
            assert Wv["decode"](Wv["encode_g711"](s, "alaw")) is not None


def test_decoders_never_raise_on_corruption():
    """Every decoder's contract is None-or-result on malformed input —
    never an exception (the mapInPandas workers rely on it: one raise
    kills the whole Arrow batch). Bit flips + truncations over every
    codec's own blobs, plus cross-format feeding."""
    from monster_etl_spark.operators.avi import _build_avi_codec

    codecs = {
        "png": _build_png_codec(),
        "gif": _build_gif_codec(),
        "bmp": _build_bmp_codec(),
        "webp": _build_webp_codec(),
        "tiff": _build_tiff_codec(),
        "jpeg": _build_jpeg_codec(),
        "wav": _build_wav_codec(),
        "flac": _build_flac_codec(),
    }
    data = b"hello fuzz world" * 20
    base = {
        "png": codecs["png"]["encode_gray8"](data, 32),
        "gif": codecs["gif"]["encode_gray8"](data, 32),
        "bmp": codecs["bmp"]["encode_gray8"](data, 32),
        "webp": codecs["webp"]["encode_gray8"](data, 32, "lz77", True),
        "tiff": codecs["tiff"]["encode_gray8"](data, 32),
        "jpeg": codecs["jpeg"]["encode_gray8"](data, 32),
        "wav": codecs["wav"]["encode_pcm16"]([100, -100] * 300, 16000),
        "flac": codecs["flac"]["encode_pcm16"]([100, -100] * 300, 16000, 1),
    }
    rng = random.Random(424242)
    for name, blob in base.items():
        dec = codecs[name]["decode"]
        for _trial in range(60):
            bb = bytearray(blob)
            for _ in range(rng.randrange(1, 6)):
                bb[rng.randrange(len(bb))] ^= 1 << rng.randrange(8)
            if rng.random() < 0.3:
                bb = bb[: rng.randrange(len(bb))]
            dec(bytes(bb))  # must not raise
        for ob in base.values():
            dec(bytes(ob))  # cross-format: None or a valid result


def test_webp_batch_matches_scalar_on_corruption():
    """Lane decode must agree with the scalar walk byte-for-byte on
    CORRUPT streams too (truncations + flips re-walk scalar; valid-but-
    mutated streams must produce the same pixels either way)."""
    W = _build_webp_codec()
    rng = random.Random(99)
    base = [
        W["encode_gray8"](f"doc {i} runs aaaaaa {'xyz' * i}".encode(),
                          32, m, s)
        for i in range(6)
        for m in ("lz77", "predictor", "palette")
        for s in (True, False)
    ]
    blobs = []
    for trial in range(300):
        bb = bytearray(base[trial % len(base)])
        for _ in range(rng.randrange(1, 5)):
            bb[rng.randrange(len(bb))] ^= 1 << rng.randrange(8)
        if rng.random() < 0.2:
            bb = bb[: rng.randrange(len(bb))]
        blobs.append(bytes(bb))
    assert W["decode_batch"](blobs) == [W["decode"](b) for b in blobs]


def test_profilers_never_raise_on_corruption():
    """The container profilers (MP4/fMP4 box walk, MP3 frame walk incl.
    Xing, Ogg page walk, WebM EBML walk) share the decoders' contract:
    None-or-dict on any input, never an exception. Random bit flips +
    truncations over each profiler's own synthesized blobs, plus
    cross-format feeding (every profiler sees every other's output)."""
    from monster_etl_spark.operators.mp3 import mp3_encode, mp3_frame_profile_fn
    from monster_etl_spark.operators.mp4 import mp4_encode, mp4_box_profile_fn
    from monster_etl_spark.operators.ogg import ogg_encode, ogg_page_profile_fn
    from monster_etl_spark.operators.webm import webm_encode, webm_profile_fn

    profilers = {
        "mp4": mp4_box_profile_fn(),
        "mp3": mp3_frame_profile_fn(),
        "ogg": ogg_page_profile_fn(),
        "webm": webm_profile_fn(),
    }
    base = {
        "mp4": mp4_encode(b"payload" * 9, audio=(b"mp4a", 2, 48000)),
        "mp4f": mp4_encode(b"payload" * 9, fragments=3, samples_per_frag=4),
        "mp3": mp3_encode(8, id3=True),
        "mp3x": mp3_encode(8, xing="xing"),
        "ogg": ogg_encode(6, channels=2),
        "webm": webm_encode(4),
        "webms": webm_encode(4, unknown_segment_size=True),
    }
    rng = random.Random(20260817)
    for pname, prof in profilers.items():
        for blob in base.values():
            for _trial in range(40):
                bb = bytearray(blob)
                for _ in range(rng.randrange(1, 6)):
                    bb[rng.randrange(len(bb))] ^= 1 << rng.randrange(8)
                if rng.random() < 0.3:
                    bb = bb[: rng.randrange(len(bb))]
                r = prof(bytes(bb))  # must not raise
                assert r is None or isinstance(r, dict)
            r = prof(bytes(blob))  # cross-format: None or a dict
            assert r is None or isinstance(r, dict)
