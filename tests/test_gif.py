"""GIF codec: lossless round-trips, LZW dictionary/width growth against a
reference compressor written here (independent of the encoder's
clear-every-254 construction), interlacing, palettes, junk immunity."""

import struct

from monster_etl_spark.operators.gif import gif_decode, gif_encode_gray8


def test_roundtrip_exact_across_clear_boundary():
    # >254 pixels exercises the encoder's periodic CLEAR codes
    img = bytes((i * 37) % 256 for i in range(600))  # 600 bytes, width 40 -> 15 rows
    w, h, c, rgb = gif_decode(gif_encode_gray8(img, 40))
    assert (w, h, c) == (40, 15, 3)
    assert all(rgb[3 * i] == rgb[3 * i + 1] == rgb[3 * i + 2] == img[i] for i in range(600))


def test_tail_row_zero_padded():
    w, h, c, rgb = gif_decode(gif_encode_gray8(bytes([5, 250, 3]), 2))
    assert (w, h, c) == (2, 2, 3)
    assert [rgb[3 * i] for i in range(4)] == [5, 250, 3, 0]


def _lzw_compress(indices, min_code):
    """Reference GIF-LZW compressor (dictionary growth + width growth),
    deliberately DIFFERENT from the encoder's no-growth construction so
    the decoder's growth path is tested against independent output."""
    CLEAR, END = 1 << min_code, (1 << min_code) + 1
    table = {bytes([k]): k for k in range(CLEAR)}
    next_code = END + 1
    width = min_code + 1
    acc = nbits = 0
    out = bytearray()

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(CLEAR)
    seq = b""
    for v in bytes(indices):
        cand = seq + bytes([v])
        if cand in table:
            seq = cand
            continue
        put(table[seq])
        table[cand] = next_code
        next_code += 1
        # decoder grows width when its table size REACHES 2^width
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        seq = bytes([v])
    if seq:
        put(table[seq])
    put(END)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_decoder_handles_real_lzw_with_dictionary_growth():
    w, h = 32, 24
    img = bytes(((x // 4 + y // 3) * 7) % 64 for y in range(h) for x in range(w))
    stream = _lzw_compress(img, 8)
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HH", w, h) + bytes([0xF7, 0, 0])
    for v in range(256):
        gif += bytes([v, v, v])
    gif += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00" + bytes([8])
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        gif += bytes([len(chunk)]) + chunk
    gif += b"\x00\x3b"
    W, H, C, rgb = gif_decode(bytes(gif))
    assert (W, H, C) == (w, h, 3)
    assert all(rgb[3 * i] == img[i] for i in range(w * h))


def test_interlaced_image_deinterlaces():
    """Build an interlaced variant by hand: rows stored in the 4-pass
    order (0,8,.. / 4,12,.. / 2,6,.. / 1,3,..) with the interlace flag
    set; decode must restore raster order."""
    w, h = 8, 16
    img = b"".join(bytes([y] * w) for y in range(h))
    order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(start, h, step)]
    pass_ordered = b"".join(img[r * w : (r + 1) * w] for r in order)
    stream = _lzw_compress(pass_ordered, 8)
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HH", w, h) + bytes([0xF7, 0, 0])
    for v in range(256):
        gif += bytes([v, v, v])
    gif += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0x40, 8])
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        gif += bytes([len(chunk)]) + chunk
    gif += b"\x00\x3b"
    W, H, C, rgb = gif_decode(bytes(gif))
    assert (W, H, C) == (w, h, 3)
    assert all(rgb[3 * (y * w + x)] == y for y in range(h) for x in range(w))


def test_local_palette_and_extension_skipping():
    """2-color local palette + a graphic-control extension before the
    image descriptor; the global table is absent."""
    w, h = 4, 2
    indices = bytes([0, 1, 1, 0, 1, 0, 0, 1])
    stream = _lzw_compress(indices, 2)
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HH", w, h) + bytes([0x00, 0, 0])  # no GCT
    gif += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE extension
    gif += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0x80])  # LCT flag, size bits 0 -> 2 entries
    gif += bytes([10, 20, 30, 200, 210, 220])  # local palette
    gif += bytes([2])  # LZW minimum code size AFTER the palette
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        gif += bytes([len(chunk)]) + chunk
    gif += b"\x00\x3b"
    out = gif_decode(bytes(gif))
    assert out is not None
    W, H, C, rgb = out
    assert (W, H, C) == (w, h, 3)
    assert rgb[0:3] == bytes([10, 20, 30]) and rgb[3:6] == bytes([200, 210, 220])


def test_junk_and_truncation_return_none():
    assert gif_decode(b"") is None
    assert gif_decode(b"GIF89a") is None
    assert gif_decode(b"GIF89a" + b"\x00" * 20) is None
    good = gif_encode_gray8(bytes(range(64)), 8)
    assert gif_decode(good[:30]) is None  # truncated mid-palette
