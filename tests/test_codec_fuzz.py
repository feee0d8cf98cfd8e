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
