"""TIFF codec: LZW (TIFF early-change variant) and PackBits primitives,
container round-trips over all compressions/predictor/strip layouts,
hand-built big-endian and RGB fixtures, junk immunity, and the
distributed stats pass."""

import random
import struct

from monster_etl_spark.operators.tiff import (
    _build_tiff_codec,
    tiff_decode,
    tiff_encode_gray8,
)

C = _build_tiff_codec()


def test_lzw_roundtrip_crosses_width_boundaries():
    random.seed(3)
    for d in (
        b"",
        b"a",
        b"aaaaaaaa",
        bytes(range(256)) * 40,  # forces 9->10->11->12 and a table reset
        bytes(random.randint(0, 255) for _ in range(30000)),
        bytes(random.randint(0, 3) for _ in range(5000)),  # KwKwK-heavy
    ):
        assert C["_lzw_decode"](C["_lzw_encode"](d)) == d


def test_packbits_apple_spec_vector():
    enc = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    dec = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22" + "AA" * 10)
    assert C["_packbits_decode"](enc) == dec
    assert C["_packbits_decode"](C["_packbits_encode"](dec)) == dec


def test_container_roundtrips_all_compressions():
    data = bytes("The quick brown fox jumps over the lazy dog. " * 30, "ascii")
    exp_h = -(-len(data) // 32)
    for comp, pred in ((1, 1), (5, 1), (5, 2), (32773, 1)):
        t = tiff_encode_gray8(data, 32, rows_per_strip=7, compression=comp, predictor=pred)
        assert tiff_decode(t) == (32, exp_h, 1, data.ljust(32 * exp_h, b"\x00"))
    # LZW actually compresses text
    assert len(tiff_encode_gray8(data, 32)) < len(data)


def test_single_strip_and_empty():
    data = b"hello world"
    t = tiff_encode_gray8(data, 8, rows_per_strip=64)  # one strip
    assert tiff_decode(t) == (8, 2, 1, data.ljust(16, b"\x00"))
    assert tiff_decode(tiff_encode_gray8(b"", 32))[:3] == (32, 1, 1)


def _be_tiff_gray(pixels, w, h):
    """Minimal hand-built BIG-endian uncompressed gray8 TIFF."""
    e = b""
    def ent(tag, typ, cnt, val4):
        return struct.pack(">HHI", tag, typ, cnt) + val4
    data_off = 8 + 2 + 12 * 8 + 4
    e += ent(256, 4, 1, struct.pack(">I", w))
    e += ent(257, 4, 1, struct.pack(">I", h))
    e += ent(258, 3, 1, struct.pack(">H", 8) + b"\x00\x00")
    e += ent(259, 3, 1, struct.pack(">H", 1) + b"\x00\x00")
    e += ent(262, 3, 1, struct.pack(">H", 1) + b"\x00\x00")
    e += ent(273, 4, 1, struct.pack(">I", data_off))
    e += ent(278, 4, 1, struct.pack(">I", h))
    e += ent(279, 4, 1, struct.pack(">I", w * h))
    ifd = struct.pack(">H", 8) + e + struct.pack(">I", 0)
    return b"MM\x00*" + struct.pack(">I", 8) + ifd + bytes(pixels)


def test_big_endian_decode():
    px = bytes(range(12))
    assert tiff_decode(_be_tiff_gray(px, 4, 3)) == (4, 3, 1, px)


def test_rgb_chunky_decode():
    # little-endian RGB, spp=3, uncompressed, built by hand
    w, h = 3, 2
    px = bytes(range(w * h * 3))
    def ent(tag, typ, cnt, val4):
        return struct.pack("<HHI", tag, typ, cnt) + val4
    data_off = 8 + 2 + 12 * 9 + 4
    e = b"".join([
        ent(256, 4, 1, struct.pack("<I", w)),
        ent(257, 4, 1, struct.pack("<I", h)),
        ent(258, 3, 3, struct.pack("<I", data_off + w * h * 3)),  # offset array
        ent(259, 3, 1, struct.pack("<H", 1) + b"\x00\x00"),
        ent(262, 3, 1, struct.pack("<H", 2) + b"\x00\x00"),
        ent(273, 4, 1, struct.pack("<I", data_off)),
        ent(277, 3, 1, struct.pack("<H", 3) + b"\x00\x00"),
        ent(278, 4, 1, struct.pack("<I", h)),
        ent(279, 4, 1, struct.pack("<I", w * h * 3)),
    ])
    ifd = struct.pack("<H", 9) + e + struct.pack("<I", 0)
    blob = (b"II*\x00" + struct.pack("<I", 8) + ifd + px
            + struct.pack("<3H", 8, 8, 8))
    assert tiff_decode(blob) == (w, h, 3, px)


def test_junk_and_out_of_scope_return_none():
    assert tiff_decode(b"") is None
    assert tiff_decode(b"nope") is None
    assert tiff_decode(b"II*\x00\x08\x00\x00\x00") is None
    # 16-bit samples are out of scope
    t = bytearray(tiff_encode_gray8(b"abc", 4))
    # corrupt a strip byte: LZW raises inside -> None
    t[-1] ^= 0xFF
    assert tiff_decode(bytes(t)) is None or tiff_decode(bytes(t))[3] != b"abc\x00"


def test_extract_pixel_stats_tiff(spark):
    from monster_etl_spark.operators.multimodal import (
        documents_as_tiff_media,
        extract_pixel_stats,
    )

    docs = spark.createDataFrame(
        [(1, "abcdefgh" * 9), (2, "")], "doc_id long, text string"
    )
    rows = {r["media_id"]: r for r in extract_pixel_stats(
        documents_as_tiff_media(docs, width=32)
    ).collect()}
    b = ("abcdefgh" * 9).encode()
    total = 32 * 3  # 72 bytes -> 3 rows of 32
    assert rows[1]["width"] == 32 and rows[1]["height"] == 3 and rows[1]["decoded"]
    assert rows[1]["min_intensity"] == 0  # zero padding
    assert rows[1]["max_intensity"] == max(b)
    assert abs(rows[1]["mean_intensity"] - sum(b) / total) < 1e-9
    assert rows[2]["height"] == 1 and rows[2]["mean_intensity"] == 0.0


def test_decode_batch_equals_per_blob():
    """Round-8 lockstep-lane TIFF-LZW: decode_batch must return exactly
    [decode(b) for b in blobs] across multi-strip LZW blobs, adversarial
    members (junk/empty/truncated), long same-byte runs (KwKwK + width
    bumps), random bytes, and degenerate sizes; the force_scalar twin
    delegates per blob."""
    import random

    from monster_etl_spark.operators.tiff import _build_tiff_codec

    C = _build_tiff_codec()
    CS = _build_tiff_codec(force_scalar=True)
    enc, dec, decb = C["encode_gray8"], C["decode"], C["decode_batch"]
    rng = random.Random(5)
    blobs = [
        enc(bytes("the quick brown fox " * rng.randrange(1, 30), "utf-8"), 32)
        for _ in range(40)
    ]
    blobs += [
        b"junk", b"", blobs[0][:40],
        enc(b"a" * 4000, 16),                     # long runs -> width bumps
        enc(bytes(rng.randrange(256) for _ in range(3000)), 32),  # incompressible
        enc(b"", 8), enc(b"x", 1),
        enc(b"hello world", 32, compression=1),   # uncompressed passthrough
        enc(b"hello world" * 30, 32, compression=32773),  # packbits
    ]
    ref = [dec(b) for b in blobs]
    got = decb(blobs)
    assert got == ref
    assert any(r is None for r in ref) and any(r is not None for r in ref)
    # the scalar twin's batch is the per-blob loop
    got_s = CS["decode_batch"](blobs)
    assert got_s == ref
    # raw lane decoder parity against the scalar LZW on its own chunks
    lz_enc, lz_dec = C["_lzw_encode"], CS["_lzw_decode"]
    chunks = [lz_enc(bytes("abcabcabc" * i, "utf-8")) for i in range(1, 8)]
    chunks.append(b"\x00")  # truncated stream -> None lane
    lanes = C["_lzw_decode_lanes"](chunks)
    for ch, got_l in zip(chunks, lanes):
        try:
            want = lz_dec(ch)
        except Exception:
            want = None
        assert got_l == want


def test_lzw_width_bump_on_final_code():
    """The 9->10-bit early-change boundary landing exactly on a strip's
    FINAL data code: the width schedule must follow the DECODER's table
    growth (which the final code feeds even though the encoder adds no
    entry for it), else EOI is written one bit narrow and the stream
    dies with "code out of range". Regression for a latent bug text
    corpora never hit; found by random-strip fuzz."""
    import random

    rng = random.Random(5)
    data = bytes(rng.randrange(256) for _ in range(9000))
    n = len(data)
    h = -(-n // 32)
    vals = data + b"\x00" * (32 * h - n)
    for pred in (1, 2):
        blob = C["encode_gray8"](data, 32, compression=5, predictor=pred)
        assert C["decode"](blob) == (32, h, 1, vals)
        assert _build_tiff_codec(force_scalar=True)["decode"](blob) == (
            32, h, 1, vals
        )
    # dense sweep across strip sizes that land the bump on the tail
    rng2 = random.Random(99)
    for L in range(240, 280):
        d2 = bytes(rng2.randrange(256) for _ in range(L))
        blob = C["encode_gray8"](d2, 32, compression=5, predictor=2)
        h2 = -(-L // 32)
        v2 = d2 + b"\x00" * (32 * h2 - L)
        assert C["decode"](blob) == (32, h2, 1, v2), L
