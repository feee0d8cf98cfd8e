"""Full PNG codec (operators/png.py): Adam7 pass geometry over odd
dimensions, palette expansion, sub-byte gray depths, filters inside
interlaced passes, parity with the legacy simple decoder, junk
immunity, and the distributed interlaced stats pass."""

import struct
import zlib

from monster_etl_spark.operators.png import (
    _build_png_codec,
    png_encode_gray8_full,
    png_full_decode,
)

C = _build_png_codec()


def _chunk(tag, body):
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", zlib.crc32(tag + body))


def _png(ihdr, chunks):
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr))
        + b"".join(chunks)
        + _chunk(b"IEND", b"")
    )


def test_adam7_roundtrip_many_geometries():
    # every pass-emptiness combination: widths/heights straddling 1..9
    data = bytes(range(1, 200))
    for w in (1, 2, 3, 5, 7, 8, 9, 32):
        for n in (1, 4, 9, 63, 64, 65, 199):
            d = data[:n]
            h = -(-n // w)
            got = png_full_decode(png_encode_gray8_full(d, w, interlace=True))
            assert got == (w, h, 1, d.ljust(w * h, b"\x00")), (w, n)


def test_noninterlaced_parity_with_legacy_decoder():
    from monster_etl_spark.operators import multimodal as mm

    data = bytes("How vexingly quick daft zebras jump! " * 20, "ascii")
    blob = png_encode_gray8_full(data, 32)
    assert blob == mm.png_encode_gray8(data, 32)  # byte-identical writers
    assert png_full_decode(blob) == mm.png_decode(blob)
    # legacy rejects Adam7; full codec decodes it to the same pixels
    il = png_encode_gray8_full(data, 32, interlace=True)
    assert mm.png_decode(il) is None
    assert png_full_decode(il) == png_full_decode(blob)


def test_palette_and_sub_byte_depths():
    plte = bytes((255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9))
    raw = b"\x00" + bytes((0, 1)) + b"\x00" + bytes((2, 3))
    b = _png((2, 2, 8, 3, 0, 0, 0), [_chunk(b"PLTE", plte), _chunk(b"IDAT", zlib.compress(raw))])
    assert png_full_decode(b) == (2, 2, 3, plte)
    # depth-2 gray: 0,1,2,3 -> scaled 0,85,170,255
    raw = b"\x00" + bytes((0b00011011,))
    b = _png((4, 1, 2, 0, 0, 0, 0), [_chunk(b"IDAT", zlib.compress(raw))])
    assert png_full_decode(b) == (4, 1, 1, bytes((0, 85, 170, 255)))
    # depth-1 palette, 10 wide (crosses a byte boundary)
    plte = bytes((5, 5, 5, 200, 200, 200))
    raw = b"\x00" + bytes((0b10110100, 0b11000000))
    b = _png((10, 1, 1, 3, 0, 0, 0), [_chunk(b"PLTE", plte), _chunk(b"IDAT", zlib.compress(raw))])
    got = png_full_decode(b)
    assert got[:3] == (10, 1, 3)
    assert got[3][:6] == bytes((200, 200, 200, 5, 5, 5))


def test_filters_inside_interlaced_passes():
    # hand-filter pass rows with Sub/Up and verify the unfilter+scatter:
    # 8x2 image => pass1 (1x1), pass2 (1x1), pass4 (2x1), pass6 (4x1),
    # pass7 (8x1). Use filter 1 (Sub) on the pass-7 row.
    px = bytes((10, 20, 30, 40, 50, 60, 70, 80, 1, 2, 3, 4, 5, 6, 7, 8))
    parts = [
        b"\x00" + bytes((px[0],)),            # pass1: x=0,y=0
        b"\x00" + bytes((px[4],)),            # pass2: x=4,y=0
        b"\x00" + bytes((px[2], px[6])),      # pass4: x=2,6
        b"\x00" + bytes((px[1], px[3], px[5], px[7])),  # pass6: x odd
        # pass7 row y=1, Sub filter: deltas against left neighbor
        b"\x01" + bytes((px[8],)) + bytes(((px[8 + i] - px[8 + i - 1]) & 0xFF for i in range(1, 8))),
    ]
    b = _png((8, 2, 8, 0, 0, 0, 1), [_chunk(b"IDAT", zlib.compress(b"".join(parts)))])
    assert png_full_decode(b) == (8, 2, 1, px)


def test_junk_and_malformed_never_raise():
    ok = png_encode_gray8_full(b"abcdef", 4)
    # NB: truncation inside the trailing IEND chunk still decodes — the
    # walker breaks on the IEND tag and (by design) never checks its CRC
    for b in (b"", b"\x89PNG\r\n\x1a\n", ok[:40],
              # interlace byte 2 (invalid)
              ok[:28] + b"\x02" + ok[29:],
              # palette ctype without PLTE
              _png((2, 1, 8, 3, 0, 0, 0), [_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))]),
              # 16-bit depth out of scope
              _png((1, 1, 16, 0, 0, 0, 0), [_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))])):
        assert png_full_decode(b) is None
    # trailing garbage after the last pass -> length check fires
    raw = zlib.compress(b"\x00\x01\x00extra")
    assert png_full_decode(_png((1, 1, 8, 0, 0, 0, 0), [_chunk(b"IDAT", raw)])) is None


def test_distributed_interlaced_stats(spark):
    from monster_etl_spark.operators.multimodal import (
        documents_as_png_media,
        extract_pixel_stats,
    )

    docs = spark.createDataFrame(
        [(0, "interlaced pixels"), (1, "")], "doc_id long, text string"
    )
    media = documents_as_png_media(docs, width=8, interlaced=True)
    rows = sorted(extract_pixel_stats(media).collect(), key=lambda r: r.media_id)
    assert all(r.decoded for r in rows)
    n = len(b"interlaced pixels")
    h = -(-n // 8)
    assert (rows[0].width, rows[0].height) == (8, h)
    # worker emits the engine-exact integer HALF_UP 6dp mean (round-10)
    s, npx = sum(b"interlaced pixels"), 8 * h
    assert rows[0].mean_intensity == ((2_000_000 * s + npx) // (2 * npx)) / 1e6
    assert rows[1].mean_intensity == 0.0
