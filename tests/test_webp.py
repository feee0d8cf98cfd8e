"""WebP-lossless (VP8L) codec: three-mode round-trips, scalar parity,
multi-tile predictor grids, color-cache/LZ77 paths, transform-inverse
units, and junk immunity."""

import random

import pytest

from monster_etl_spark.operators.webp import (
    _build_webp_codec,
    webp_decode,
    webp_encode_gray8,
)

C = _build_webp_codec()
CS = _build_webp_codec(force_scalar=True)
MODES = ("lz77", "predictor", "palette")


def _gray_rgb(data, w):
    h = max(1, -(-len(data) // w))
    pad = data + b"\x00" * (w * h - len(data))
    return w, h, 3, b"".join(bytes((v, v, v)) for v in pad)


CASES = [
    b"",
    b"a",
    b"hello world, this exercises literals and short runs",
    bytes(range(256)),
    b"\x55" * 400,  # long runs -> LZ77 backrefs
    b"abcabcabc" * 60,  # period-3 repeats -> color-cache hits, no runs
    "héllo wörld — ünïcode ".encode() * 30,
]
random.seed(20260815)
CASES.append(bytes(random.randrange(256) for _ in range(5000)))


@pytest.mark.parametrize("mode", MODES)
def test_roundtrip_all_modes(mode):
    for data in CASES:
        blob = webp_encode_gray8(data, 32, mode)
        assert webp_decode(blob) == _gray_rgb(data, 32), (mode, len(data))


def test_modes_decode_to_identical_pixels():
    data = CASES[-1]
    decoded = {m: webp_decode(webp_encode_gray8(data, 32, m)) for m in MODES}
    assert decoded["lz77"] == decoded["predictor"] == decoded["palette"]


def test_scalar_parity_encode_and_decode():
    """force_scalar builds must produce byte-identical blobs AND pixels
    (the codec-parity discipline the vectorized stages are held to)."""
    for data in CASES:
        for mode in MODES:
            blob = C["encode_gray8"](data, 32, mode)
            assert CS["encode_gray8"](data, 32, mode) == blob
            assert CS["decode"](blob) == C["decode"](blob)


def test_multi_tile_predictor_and_large_image():
    # h = 625 > 512: two vertical predictor tiles; also a large palette
    random.seed(3)
    data = bytes(random.randrange(256) for _ in range(20000))
    for mode in MODES:
        assert webp_decode(webp_encode_gray8(data, 32, mode)) == _gray_rgb(data, 32)


def test_lz77_actually_compresses_runs():
    raw = webp_encode_gray8(b"\x11" * 4096, 32, "lz77")
    assert len(raw) < 256  # one literal + a handful of backrefs


def test_palette_bundles_small_alphabets():
    # 2 distinct values -> 1-bit bundling: 8 pixels/byte
    rng = random.Random(5)
    two = bytes(rng.choice(b"\x00\xff") for _ in range(2048))
    blob = webp_encode_gray8(two, 32, "palette")
    assert webp_decode(blob) == _gray_rgb(two, 32)
    # 16 distinct -> 4-bit bundling
    sixteen = bytes(rng.randrange(16) * 17 for _ in range(2048))
    blob16 = webp_encode_gray8(sixteen, 32, "palette")
    assert webp_decode(blob16) == _gray_rgb(sixteen, 32)
    assert len(blob) < len(blob16) < 2048


def test_nonmultiple_width_and_min_one_row():
    data = bytes(range(61))
    for mode in MODES:
        assert webp_decode(webp_encode_gray8(data, 30, mode)) == _gray_rgb(data, 30)
    assert webp_decode(webp_encode_gray8(b"", 32, "palette"))[:3] == (32, 1, 3)


def test_junk_and_truncation_return_none():
    assert webp_decode(b"") is None
    assert webp_decode(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert webp_decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40) is None
    blob = webp_encode_gray8(b"some document text here", 32, "lz77")
    for cut in (4, 12, 19, 21):
        assert webp_decode(blob[:cut]) is None
    # bit flips must never raise (None or a differently-decoded image)
    for pos in range(12, min(len(blob), 64)):
        bb = bytearray(blob)
        bb[pos] ^= 0xFF
        webp_decode(bytes(bb))


def test_dimension_cap():
    with pytest.raises(ValueError):
        webp_encode_gray8(b"\x00" * (16385 * 32), 32, "lz77")


def test_color_transform_inverse_unit():
    """Cross-color inverse per the spec: deltas are (int8(t)*int8(c))>>5,
    green drives red, green+transformed-red drive blue."""
    inv = C["_inv_color"]
    # one tile covering a 2x1 image; multipliers g2r=32, g2b=64, r2b=255(-1)
    tile = [(255 << 16) | (64 << 8) | 32]
    px = [0xFF000000 | (10 << 16) | (100 << 8) | 20,
          0xFF000000 | (200 << 16) | (50 << 8) | 0]
    out = inv(list(px), 2, 1, 9, tile, 1)
    for orig, got in zip(px, out):
        g = (orig >> 8) & 0xFF
        r = ((orig >> 16) & 0xFF)
        b = orig & 0xFF
        d = lambda t, c: ((t - 256 if t > 127 else t) * (c - 256 if c > 127 else c)) >> 5
        r2 = (r + d(32, g)) & 0xFF
        b2 = (b + d(64, g) + d(255, r2)) & 0xFF
        assert got == (orig & 0xFF00FF00) | (r2 << 16) | b2


def test_predictor_modes_match_per_channel_reference():
    """The SWAR predictor helpers must equal a per-channel reference for
    every mode 0..13 over adversarial channel values."""
    predict = C["_predict"]

    def ref(mode, l, t, tl, tr):
        def ch(p, sh):
            return (p >> sh) & 0xFF

        def clamp(v):
            return 0 if v < 0 else 255 if v > 255 else v

        out = 0
        if mode == 11:
            p_l = sum(abs(ch(l, s) + ch(t, s) - ch(tl, s) - ch(l, s)) for s in (24, 16, 8, 0))
            p_t = sum(abs(ch(l, s) + ch(t, s) - ch(tl, s) - ch(t, s)) for s in (24, 16, 8, 0))
            return l if p_l < p_t else t
        for sh in (24, 16, 8, 0):
            a, b, c, d = ch(l, sh), ch(t, sh), ch(tl, sh), ch(tr, sh)
            if mode == 0:
                v = 255 if sh == 24 else 0
            elif mode == 1:
                v = a
            elif mode == 2:
                v = b
            elif mode == 3:
                v = d
            elif mode == 4:
                v = c
            elif mode == 5:
                v = (((a + d) // 2) + b) // 2
            elif mode == 6:
                v = (a + c) // 2
            elif mode == 7:
                v = (a + b) // 2
            elif mode == 8:
                v = (c + b) // 2
            elif mode == 9:
                v = (b + d) // 2
            elif mode == 10:
                v = ((a + c) // 2 + (b + d) // 2) // 2
            elif mode == 12:
                v = clamp(a + b - c)
            else:
                av = (a + b) // 2
                delta = (av - c) >> 1 if av >= c else -((c - av) >> 1)
                v = clamp(av + delta)
            out |= v << sh
        return out

    rng = random.Random(99)
    pixels = [0, 0xFFFFFFFF, 0xFF000000, 0x00FF00FF] + [
        rng.randrange(1 << 32) for _ in range(40)
    ]
    for mode in range(14):
        for i in range(0, len(pixels) - 3, 4):
            l, t, tl, tr = pixels[i: i + 4]
            assert predict(mode, l, t, tl, tr) == ref(mode, l, t, tl, tr), mode


def test_meta_prefix_and_mapped_distance_roundtrip():
    """TEST-ONLY 'meta' layout: two code groups selected by a 4-px-tile
    entropy image, runs carried by MAPPED distance value 2 (DIST_MAP[1]
    = (1,0) -> linear distance 1) — the decoder's group switching and
    2D distance mapping round-trip on real streams."""
    for data in CASES:
        blob = webp_encode_gray8(data, 32, "meta")
        assert webp_decode(blob) == _gray_rgb(data, 32), len(data)
        assert CS["decode"](blob) == C["decode"](blob)


def test_cross_color_transform_roundtrip():
    """TEST-ONLY 'cross' layout: identity cross-color transform (zero
    multipliers, 4-px tiles) composed with subtract-green — the
    _inv_color tile walk exercised by a full bitstream."""
    for data in CASES:
        blob = webp_encode_gray8(data, 32, "cross")
        assert webp_decode(blob) == _gray_rgb(data, 32), len(data)
