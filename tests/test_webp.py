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


def _addpx_ref(a, b):
    out = 0
    for sh in (24, 16, 8, 0):
        out |= (((a >> sh) + (b >> sh)) & 0xFF) << sh
    return out


@pytest.mark.parametrize("mode", [3, 5, 9, 10])
def test_predictor_right_edge_tr_wraps_to_row_left(mode):
    """Spec rule (libwebp contiguous-buffer wrap): the TR pixel of a
    rightmost-column pixel is the leftmost pixel of the SAME row —
    px[i - w + 1] unconditionally, never the top pixel. Exercises the
    TR-using modes 3/5/9/10 that the in-repo encoder (mode 2 only)
    never emits."""
    predict = C["_predict"]
    rng = random.Random(777 + mode)
    w, h = 4, 3
    residuals = [rng.randrange(1 << 32) for _ in range(w * h)]
    timg = [mode << 8]

    def ref(res):
        px = list(res)
        for y in range(h):
            for x in range(w):
                i = y * w + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = px[i - 1]
                elif x == 0:
                    pred = px[i - w]
                else:
                    tr = px[i - w + 1]  # x == w-1 -> y*w, this row's left
                    pred = predict(mode, px[i - 1], px[i - w], px[i - w - 1], tr)
                px[i] = _addpx_ref(px[i], pred)
        return px

    expect = ref(residuals)
    assert C["_inv_predictor"](list(residuals), w, h, 9, timg, 1) == expect
    assert CS["_inv_predictor"](list(residuals), w, h, 9, timg, 1) == expect
    # the wrap rule must actually bite: at least one right-edge pixel
    # below row 0 differs from the old top-pixel-as-TR behavior
    def old(res):
        px = list(res)
        for y in range(h):
            for x in range(w):
                i = y * w + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = px[i - 1]
                elif x == 0:
                    pred = px[i - w]
                else:
                    tr = px[i - w + 1] if x + 1 < w else px[i - w]
                    pred = predict(mode, px[i - 1], px[i - w], px[i - w - 1], tr)
                px[i] = _addpx_ref(px[i], pred)
        return px

    assert old(residuals) != expect


class _BitW:
    """LSB-first bit writer for hand-crafting spec-legal VP8L payloads."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v, k):
        self.acc |= (v & ((1 << k) - 1)) << self.n
        self.n += k
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def test_palette_before_predictor_stream_decodes():
    """A spec-legal stream listing COLOR_INDEXING before PREDICTOR codes
    the predictor at the palette-reduced xsize; the inverse must walk
    the reduced-width buffer (not the full image width). Hand-crafted
    4x2 image, 4-color palette (xb=2 -> packed width 1), predictor
    mode 1 over the packed image."""
    import struct

    w = _BitW()

    def simple2(s0, s1):
        w.bits(1, 1)  # simple code
        w.bits(1, 1)  # two symbols
        w.bits(1, 1)  # first symbol in 8 bits
        w.bits(s0, 8)
        w.bits(s1, 8)

    def simple1(s0):
        w.bits(1, 1)  # simple code
        w.bits(0, 1)  # one symbol
        w.bits(1, 1)  # 8-bit form
        w.bits(s0, 8)

    # header
    w.bits(0x2F, 8)
    w.bits(4 - 1, 14)
    w.bits(2 - 1, 14)
    w.bits(0, 1)  # alpha hint
    w.bits(0, 3)  # version
    # transform 1: COLOR_INDEXING, 4 entries (xb=2)
    w.bits(1, 1)
    w.bits(3, 2)
    w.bits(4 - 1, 8)
    # palette sub-stream (4x1): delta-coded entries
    # pal[0]=(A255,R10,G20,B30), deltas then (0,5,5,5) x3
    w.bits(0, 1)  # no color cache
    simple2(20, 5)    # green
    simple2(10, 5)    # red
    simple2(30, 5)    # blue
    simple2(255, 0)   # alpha
    simple1(0)        # distance (unused)
    w.bits(0b0000, 4)  # entry 0: g,r,b,a = first symbols
    for _ in range(3):
        w.bits(0b1111, 4)  # entries 1-3: second symbols
    # transform 2: PREDICTOR at the REDUCED xsize (packed width 1)
    w.bits(1, 1)
    w.bits(0, 2)
    w.bits(7, 3)  # sb=9 -> one tile
    # tile image sub-stream (1x1): mode 1 (L) in the green channel
    w.bits(0, 1)  # no cache
    simple1(1)    # green = mode 1
    simple1(0)    # red
    simple1(0)    # blue
    simple1(0)    # alpha
    simple1(0)    # distance
    # (single-symbol codes: the tile pixel costs zero bits)
    w.bits(0, 1)  # end of transforms
    w.bits(0, 1)  # no color cache
    w.bits(0, 1)  # no meta prefix
    # main image (packed 1x2). Packed greens: row0 idx [0,1,2,3] -> 228,
    # row1 idx [3,2,1,0] -> 27. Predictor residuals (pred: BLACK then T):
    # px0 res = (A 1, G 228), px1 res = (G 55).
    simple2(228, 55)  # green
    simple1(0)        # red
    simple1(0)        # blue
    simple2(1, 0)     # alpha
    simple1(0)        # distance
    w.bits(0b00, 2)   # px0: green=228, alpha=1 (red/blue cost 0 bits)
    w.bits(0b11, 2)   # px1: green=55, alpha=0
    payload = w.done()
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(payload)) + b"WEBP"
        + b"VP8L" + struct.pack("<I", len(payload)) + payload
    )
    pal = [(10, 20, 30), (15, 25, 35), (20, 30, 40), (25, 35, 45)]
    order = [0, 1, 2, 3, 3, 2, 1, 0]
    expect = (4, 2, 3, bytes(v for i in order for v in pal[i]))
    assert webp_decode(blob) == expect
    assert CS["decode"](blob) == expect


# ------------------------- round-8: static_codes path + vectorized emit


def test_static_codes_parity_and_roundtrip():
    """static_codes blobs: np/scalar builds byte-identical, pixels
    identical to the adaptive blobs' (lossless either way)."""
    for data in CASES:
        for mode in MODES:
            blob = C["encode_gray8"](data, 32, mode, True)
            assert CS["encode_gray8"](data, 32, mode, True) == blob
            assert C["decode"](blob) == _gray_rgb(data, 32)
            assert CS["decode"](blob) == _gray_rgb(data, 32)


def test_static_codes_default_off_and_blob_differs():
    """Default stays adaptive (existing corpora/tests unchanged); the
    static blob is a different bitstream over the same pixels."""
    data = CASES[2]
    adaptive = C["encode_gray8"](data, 32, "lz77")
    static = C["encode_gray8"](data, 32, "lz77", True)
    assert adaptive == webp_encode_gray8(data, 32, "lz77")
    assert adaptive != static
    assert C["decode"](adaptive) == C["decode"](static)


def test_desc_cache_interleaved_corpora():
    """The description-parse memo must never cross-contaminate: decode
    static, adaptive, and per-doc-unique blobs interleaved, repeatedly,
    against fresh-build reference decodes."""
    fresh = _build_webp_codec()  # cold cache for reference decodes
    rng = random.Random(8)
    blobs = []
    for i in range(30):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 700)))
        mode = MODES[i % 3]
        blobs.append(C["encode_gray8"](data, 32, mode, i % 2 == 0))
    expect = [fresh["decode"](b) for b in blobs]
    for _ in range(3):  # repeated passes hit the warm cache
        assert [C["decode"](b) for b in blobs] == expect


def test_emit_tokens_np_matches_scalar_mixed_kinds():
    """Direct emitter parity on a hand-built mixed token stream
    (lit/copy/cache) through the SAME buffered writer."""
    import numpy as np

    toks = (
        [("lit", 0, v, 0, 255) for v in (9, 9, 4, 200)]
        + [("copy", 7, 121), ("cache", 3), ("lit", 0, 9, 0, 255)]
    )
    dist_hist = {13: 1}
    w1 = C["_W"]()
    C["_emit_tokens"](w1, toks, 6, dist_hist)
    ref = w1.done()
    kind = np.array([0, 0, 0, 0, 1, 2, 0], np.uint8)
    g = np.array([9, 9, 4, 200, 256 + 5, 280 + 3, 9], np.int64)
    z = np.zeros(7, np.int64)
    w2 = C["_W"]()
    C["_emit_tokens_np"](
        w2, g, 6, dist_hist, kind=kind, r=z, b=z, a=z + 255,
        lev=np.array([0, 0, 0, 0, 0, 0, 0], np.int64),
        leb=np.array([0, 0, 0, 0, 1, 0, 0], np.int64),
        ds=np.full(7, 13, np.int64), dev=np.full(7, 24, np.int64),
        deb=np.full(7, 5, np.int64),
    )
    assert w2.done() == ref


def test_decode_batch_matches_scalar():
    """Wave-pooled lane decode must be byte-identical to per-blob
    ``decode`` across modes, static/adaptive codes, junk, truncation,
    and bit flips (corrupt streams re-walk through the scalar path)."""
    rng = random.Random(11)
    blobs = []
    for i, data in enumerate(CASES):
        for m in MODES + ("meta", "cross"):
            st = m in MODES and i % 2 == 0
            blobs.append(C["encode_gray8"](data, 32, m, st))
    blobs += [b"junk", b"", blobs[0][:15], blobs[1][:40]]
    for k in range(40):
        bb = bytearray(blobs[k % 10])
        if len(bb) > 13:
            bb[rng.randrange(12, len(bb))] ^= 0xFF
            blobs.append(bytes(bb))
    assert C["decode_batch"](blobs) == [C["decode"](b) for b in blobs]
