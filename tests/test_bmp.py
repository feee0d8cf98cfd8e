"""BMP codec: gray8 raw/RLE8/top-down round-trips, hand-built fixtures
for the 1/4/16/24/32-bit, BI_BITFIELDS, BI_RLE4, absolute-mode and
delta-escape paths, OS/2 core header, junk immunity, and the
distributed stats pass."""

import struct

from monster_etl_spark.operators.bmp import (
    _build_bmp_codec,
    bmp_decode,
    bmp_encode_gray8,
    bmp_encode_rgb24,
)

C = _build_bmp_codec()


def _gray_rgb(data, w):
    h = max(1, -(-len(data) // w))
    return w, h, 3, b"".join(bytes((v, v, v)) for v in data.ljust(w * h, b"\x00"))


def test_gray8_roundtrips_raw_rle_topdown():
    data = bytes("Sphinx of black quartz, judge my vow. " * 40, "ascii")
    for kw in ({}, {"rle": True}, {"topdown": True}):
        assert bmp_decode(bmp_encode_gray8(data, 32, **kw)) == _gray_rgb(data, 32)
    # RLE actually compresses runs
    assert len(bmp_encode_gray8(b"\x55" * 4096, 32, rle=True)) < 4096


def test_gray8_empty_and_nonmultiple_width():
    assert bmp_decode(bmp_encode_gray8(b"", 32))[:3] == (32, 1, 3)
    # width 30 -> stride pads to 32; padding must not leak into pixels
    data = bytes(range(61))
    assert bmp_decode(bmp_encode_gray8(data, 30)) == _gray_rgb(data, 30)
    assert bmp_decode(bmp_encode_gray8(data, 30, rle=True)) == _gray_rgb(data, 30)


def test_rgb24_roundtrip():
    rgb = bytes(range(256)) * 3
    w, h = 16, -(-len(rgb) // 48)
    out = bmp_decode(bmp_encode_rgb24(rgb, w))
    assert out == (w, h, 3, rgb.ljust(w * h * 3, b"\x00"))


def _bmp(w, h, bpp, comp, data, palette=b"", extra_hdr=b"", topdown=False):
    pal_off = 14 + 40 + len(extra_hdr)
    data_off = pal_off + len(palette)
    fh = b"BM" + struct.pack("<IHHI", data_off + len(data), 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if topdown else h, 1, bpp, comp, len(data), 0, 0,
        len(palette) // 4, 0,
    )
    return fh + info + extra_hdr + palette + data


def test_1bit_and_4bit_palettized():
    # 1-bit: 10x2, palette [red, blue]; rows bottom-up, MSB-first, 4-byte stride
    pal = bytes((0, 0, 255, 0)) + bytes((255, 0, 0, 0))  # BGRx: red then blue
    row_top = bytes((0b10101010, 0b10000000)) + b"\x00\x00"
    row_bot = bytes((0b01010101, 0b01000000)) + b"\x00\x00"
    out = bmp_decode(_bmp(10, 2, 1, 0, row_bot + row_top, pal))
    assert out[:3] == (10, 2, 3)
    px = out[3]
    # stored order is bottom-up: row_top (last stored) is the visual top
    assert px[0:3] == b"\x00\x00\xff" and px[3:6] == b"\xff\x00\x00"  # top row starts blue
    assert px[30:33] == b"\xff\x00\x00"  # bottom row starts red
    # 4-bit: 3x1 with indices 1,0,2
    pal4 = b"".join(bytes((i, 2 * i, 3 * i, 0)) for i in range(3))
    out = bmp_decode(_bmp(3, 1, 4, 0, bytes((0x10, 0x20)) + b"\x00\x00", pal4))
    assert out == (3, 1, 3, bytes((3, 2, 1)) + bytes((0, 0, 0)) + bytes((6, 4, 2)))


def test_16bit_555_and_bitfields_565():
    # 2x1, X1R5G5B5 default masks: pure red (0x7C00) and pure green (0x03E0)
    out = bmp_decode(_bmp(2, 1, 16, 0, struct.pack("<HH", 0x7C00, 0x03E0)))
    assert out == (2, 1, 3, b"\xff\x00\x00" + b"\x00\xff\x00")
    # BI_BITFIELDS 565 via the 40-byte header + appended masks
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    out = bmp_decode(_bmp(2, 1, 16, 3, struct.pack("<HH", 0xF800, 0x001F), extra_hdr=masks))
    assert out == (2, 1, 3, b"\xff\x00\x00" + b"\x00\x00\xff")


def test_32bit_raw_and_masked():
    # BGRx raw
    out = bmp_decode(_bmp(1, 1, 32, 0, bytes((10, 20, 30, 99))))
    assert out == (1, 1, 3, bytes((30, 20, 10)))
    # masked ARGB layout via BI_BITFIELDS
    masks = struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF)
    out = bmp_decode(_bmp(1, 1, 32, 3, struct.pack("<I", 0x00804020), extra_hdr=masks))
    assert out == (1, 1, 3, bytes((0x80, 0x40, 0x20)))


def test_rle4_runs_absolute_and_delta():
    pal = b"".join(bytes((17 * i, 17 * i, 17 * i, 0)) for i in range(16))
    # 8x2 RLE4: row0(stored, = bottom row): run of 5 alternating 0xA,0xB,
    # absolute mode 3 nibbles (1,2,3), EOL; row1: delta skip (2,0) then
    # run 6 of 0xC, EOL; EOB. Undefined pixels (from the delta) stay 0.
    data = bytes(
        (5, 0xAB, 0, 3, 0x12, 0x30, 0, 0,  # bottom row (absolute pads to word)
         0, 2, 2, 0, 6, 0xCC, 0, 0,        # top row: delta then run
         0, 1)
    )
    out = bmp_decode(_bmp(8, 2, 4, 2, data, pal))
    assert out[:3] == (8, 2, 3)
    g = out[3][::3]  # gray values (palette is gray identity * 17)
    top, bottom = g[:8], g[8:]
    assert bytes(bottom) == bytes(17 * v for v in (10, 11, 10, 11, 10, 1, 2, 3))
    assert bytes(top) == bytes(17 * v for v in (0, 0, 12, 12, 12, 12, 12, 12))


def test_rle8_delta_and_absolute_escapes():
    pal = b"".join(bytes((i, i, i, 0)) for i in range(256))
    # 6x2: bottom row absolute(3: 7,8,9)+pad, run 3 of 5, EOL;
    # top row delta(1,0), run 5 of 2, EOL; EOB
    data = bytes((0, 3, 7, 8, 9, 0, 3, 5, 0, 0,
                  0, 2, 1, 0, 5, 2, 0, 0,
                  0, 1))
    out = bmp_decode(_bmp(6, 2, 8, 1, data, pal))
    g = out[3][::3]
    assert bytes(g[6:]) == bytes((7, 8, 9, 5, 5, 5))
    assert bytes(g[:6]) == bytes((0, 2, 2, 2, 2, 2))


def test_os2_core_header():
    # BITMAPCOREHEADER: 12-byte DIB, BGR palette TRIPLES, 16-bit dims
    pal = bytes((0, 0, 40)) + bytes((0, 0, 200))  # two reds
    data = bytes((0x40,)) + b"\x00\x00\x00"  # 1 row: pixels 0,1 (1-bit, MSB)
    fh = b"BM" + struct.pack("<IHHI", 0, 0, 0, 14 + 12 + len(pal))
    core = struct.pack("<IHHHH", 12, 2, 1, 1, 1)
    out = bmp_decode(fh + core + pal + data)
    assert out == (2, 1, 3, bytes((40, 0, 0)) + bytes((200, 0, 0)))


def test_junk_and_malformed_never_raise():
    good = bmp_encode_gray8(b"abcdef", 4)
    for b in (b"", b"BM", b"BMshort", b"\x89PNG\r\n\x1a\n" + b"\x00" * 40,
              good[:20], good[:2] + b"\xff" * 60,
              # truncated pixel data
              good[:-3],
              # bogus bpp
              good[:28] + b"\x07" + good[29:]):
        assert bmp_decode(b) is None
    # RLE pointing past the palette is caught, not raised
    pal = b"\x00" * 8  # 2 entries
    assert bmp_decode(_bmp(4, 1, 8, 1, bytes((2, 200, 0, 1)), pal)) is None


def test_distributed_stats_pass(spark):
    from pyspark.sql import functions as F

    from monster_etl_spark.operators.multimodal import (
        documents_as_bmp_media,
        extract_pixel_stats,
    )

    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "a" * 100), (2, "")], "doc_id long, text string"
    )
    out = extract_pixel_stats(documents_as_bmp_media(docs, width=8)).orderBy("media_id")
    rows = out.collect()
    assert [r["decoded"] for r in rows] == [True, True, True]
    assert rows[0]["width"] == 8 and rows[0]["height"] == 2
    # engine-exact integer HALF_UP 6dp mean (round-10)
    s, npx = ord("a") * 100, 8 * 13
    assert rows[1]["mean_intensity"] == ((2_000_000 * s + npx) // (2 * npx)) / 1e6
    assert rows[2]["height"] == 1 and rows[2]["mean_intensity"] == 0.0
