"""BMP codec in pure stdlib Python (Windows DIB family).

Rounds out the image tier (PNG / baseline+progressive JPEG / GIF / TIFF)
with the uncompressed-interchange container that screenshots, scanned
forms and legacy Windows tooling emit. Everything here is from the
public Windows BMP / DIB file-format documentation:

- ``bmp_decode``: ``BM`` file header, BITMAPCOREHEADER (12-byte, OS/2)
  and the BITMAPINFOHEADER family (40/52/56/64/108/124 — V2 through V5
  share the leading field layout); bit depths 1/4/8 (palettized,
  MSB-first packed), 16 (X1R5G5B5 default or ``BI_BITFIELDS`` masks),
  24 (BGR) and 32 (BGRx or masked); compressions ``BI_RGB``,
  ``BI_RLE8``, ``BI_RLE4`` (run, end-of-line, end-of-bitmap and delta
  escapes, absolute mode with word padding) and ``BI_BITFIELDS``;
  bottom-up AND top-down (negative height) row order; 4-byte scanline
  padding. Returns ``(width, height, 3, rgb_bytes)`` — the
  ``png_decode`` contract, palette/channel order already resolved to
  RGB — or ``None`` on malformed/out-of-scope input (the never-raise
  media contract).
- ``bmp_encode_gray8``: identity-grayscale-palette 8-bit writer, raw
  (``BI_RGB``) or run-length (``BI_RLE8``), bottom-up or top-down —
  lossless either way, so the registry query reuses the analytic PNG
  oracle verbatim while half the corpus rides the RLE path.
- ``bmp_encode_rgb24``: bottom-up 24-bit BGR writer for fixtures.

Defined inside ``_build_bmp_codec`` for by-value closure shipping
(cloudpickle ships the nested functions wholesale into ``mapInPandas``
workers; no module import on executors is assumed).
"""

from __future__ import annotations


def _build_bmp_codec():
    import struct

    # ---- helpers ---------------------------------------------------------
    def _u16(b, o):
        return struct.unpack_from("<H", b, o)[0]

    def _u32(b, o):
        return struct.unpack_from("<I", b, o)[0]

    def _s32(b, o):
        return struct.unpack_from("<i", b, o)[0]

    def _mask_extract(pix, mask):
        if not mask:
            return 0
        shift = (mask & -mask).bit_length() - 1
        top = mask >> shift
        return ((pix & mask) >> shift) * 255 // top

    # ---- decode ----------------------------------------------------------
    def decode(b):
        try:
            return _decode(bytes(b))
        except Exception:
            return None

    def _decode(b):
        if len(b) < 26 or b[:2] != b"BM":
            return None
        data_off = _u32(b, 10)
        hsz = _u32(b, 14)
        masks = None
        if hsz == 12:  # BITMAPCOREHEADER: 16-bit dims, BGR palette triples
            w, h = _u16(b, 18), _u16(b, 20)
            planes, bpp = _u16(b, 22), _u16(b, 24)
            comp, clr_used, pal_entry, pal_off = 0, 0, 3, 14 + 12
            topdown = False
        elif hsz in (40, 52, 56, 64, 108, 124):
            w, h = _s32(b, 18), _s32(b, 22)
            planes, bpp = _u16(b, 26), _u16(b, 28)
            comp = _u32(b, 30)
            clr_used = _u32(b, 46)
            topdown = h < 0
            h = -h if h < 0 else h
            pal_entry = 4
            # BI_BITFIELDS masks: appended after a 40-byte header, embedded
            # at the same byte offsets in the larger (V2+) headers
            pal_off = 14 + hsz
            if comp == 3:
                if len(b) < 66:
                    return None
                masks = (_u32(b, 54), _u32(b, 58), _u32(b, 62))
                if hsz == 40:
                    pal_off += 12
        else:
            return None
        if (
            planes != 1
            or w <= 0
            or h <= 0
            or bpp not in (1, 4, 8, 16, 24, 32)
            or comp not in (0, 1, 2, 3)
            or (comp == 1 and bpp != 8)
            or (comp == 2 and bpp != 4)
            or (comp == 3 and bpp not in (16, 32))
            or (topdown and comp in (1, 2))
        ):
            return None

        pal = None
        if bpp <= 8:
            n = clr_used or (1 << bpp)
            if n > (1 << bpp) or pal_off + n * pal_entry > len(b):
                return None
            pal = [
                b[pal_off + i * pal_entry : pal_off + i * pal_entry + 3]
                for i in range(n)
            ]  # entries are B,G,R(,X)

        rgb = bytearray(w * h * 3)

        def put(x, y_stored, r, g, bl):
            # y_stored counts in FILE order; bottom-up files flip here
            y = y_stored if topdown else h - 1 - y_stored
            p = 3 * (y * w + x)
            rgb[p] = r
            rgb[p + 1] = g
            rgb[p + 2] = bl

        def put_idx(x, y_stored, v):
            if v >= len(pal):
                raise ValueError("palette index out of range")
            e = pal[v]
            put(x, y_stored, e[2], e[1], e[0])

        if comp in (1, 2):  # RLE8 / RLE4 into palette indices
            i, x, y = data_off, 0, 0
            nib = comp == 2
            while i + 1 < len(b):
                c, v = b[i], b[i + 1]
                i += 2
                if c:  # encoded run (RLE4: two alternating nibbles)
                    for k in range(c):
                        if x >= w or y >= h:
                            break
                        idx = ((v >> 4) if k % 2 == 0 else (v & 0x0F)) if nib else v
                        put_idx(x, y, idx)
                        x += 1
                elif v == 0:  # end of line
                    x, y = 0, y + 1
                elif v == 1:  # end of bitmap
                    break
                elif v == 2:  # delta: unsigned offsets, undefined pixels stay 0
                    if i + 1 >= len(b):
                        return None
                    x += b[i]
                    y += b[i + 1]
                    i += 2
                else:  # absolute mode: v literal pixels, padded to a word
                    nbytes = (v + 1) // 2 if nib else v
                    if i + nbytes > len(b):
                        return None
                    for k in range(v):
                        if x >= w or y >= h:
                            break
                        byte = b[i + (k // 2 if nib else k)]
                        idx = ((byte >> 4) if k % 2 == 0 else (byte & 0x0F)) if nib else byte
                        put_idx(x, y, idx)
                        x += 1
                    i += nbytes + (nbytes & 1)  # word alignment
            return w, h, 3, bytes(rgb)

        stride = ((w * bpp + 31) // 32) * 4
        if data_off + stride * h > len(b):
            return None
        if bpp == 16 and masks is None:
            masks = (0x7C00, 0x03E0, 0x001F)  # X1R5G5B5 default
        for ys in range(h):
            row = data_off + ys * stride
            if bpp <= 8:
                per = 8 // bpp
                m = (1 << bpp) - 1
                for x in range(w):
                    byte = b[row + x // per]
                    shift = (per - 1 - x % per) * bpp
                    put_idx(x, ys, (byte >> shift) & m)
            elif bpp == 16:
                for x in range(w):
                    pix = _u16(b, row + 2 * x)
                    put(
                        x, ys,
                        _mask_extract(pix, masks[0]),
                        _mask_extract(pix, masks[1]),
                        _mask_extract(pix, masks[2]),
                    )
            elif bpp == 24:
                for x in range(w):
                    o = row + 3 * x
                    put(x, ys, b[o + 2], b[o + 1], b[o])
            else:  # 32
                for x in range(w):
                    o = row + 4 * x
                    if masks is None:
                        put(x, ys, b[o + 2], b[o + 1], b[o])
                    else:
                        pix = _u32(b, o)
                        put(
                            x, ys,
                            _mask_extract(pix, masks[0]),
                            _mask_extract(pix, masks[1]),
                            _mask_extract(pix, masks[2]),
                        )
        return w, h, 3, bytes(rgb)

    # ---- encode ----------------------------------------------------------
    def _headers(w, h, bpp, comp, data_len, n_pal, topdown=False):
        pal_bytes = n_pal * 4
        data_off = 14 + 40 + pal_bytes
        file_hdr = b"BM" + struct.pack("<IHHI", data_off + data_len, 0, 0, data_off)
        info = struct.pack(
            "<IiiHHIIiiII",
            40, w, -h if topdown else h, 1, bpp, comp, data_len, 2835, 2835, n_pal, 0,
        )
        return file_hdr + info

    def _gray_palette():
        return b"".join(bytes((i, i, i, 0)) for i in range(256))

    def _rle8(rows):
        out = bytearray()
        for row in rows:
            j = 0
            while j < len(row):
                v = row[j]
                run = 1
                while j + run < len(row) and row[j + run] == v and run < 255:
                    run += 1
                out += bytes((run, v))
                j += run
            out += b"\x00\x00"  # end of line
        out += b"\x00\x01"  # end of bitmap
        return bytes(out)

    def encode_gray8(pixels, width, rle=False, topdown=False):
        pixels = bytes(pixels)
        h = max(1, -(-len(pixels) // width))
        padded = pixels.ljust(width * h, b"\x00")
        rows = [padded[y * width : (y + 1) * width] for y in range(h)]
        if not topdown:
            rows = rows[::-1]  # file stores bottom-up
        if rle:
            data = _rle8(rows)
            return _headers(width, h, 8, 1, len(data), 256) + _gray_palette() + data
        stride = (width + 3) & ~3
        data = b"".join(r.ljust(stride, b"\x00") for r in rows)
        return (
            _headers(width, h, 8, 0, len(data), 256, topdown)
            + _gray_palette()
            + data
        )

    def encode_rgb24(rgb, width):
        rgb = bytes(rgb)
        h = max(1, -(-len(rgb) // (3 * width)))
        padded = rgb.ljust(3 * width * h, b"\x00")
        stride = (3 * width + 3) & ~3
        rows = []
        for y in range(h - 1, -1, -1):  # bottom-up
            row = bytearray()
            for x in range(width):
                o = 3 * (y * width + x)
                row += bytes((padded[o + 2], padded[o + 1], padded[o]))  # BGR
            rows.append(bytes(row).ljust(stride, b"\x00"))
        data = b"".join(rows)
        return _headers(width, h, 24, 0, len(data), 0) + data

    return {
        "decode": decode,
        "encode_gray8": encode_gray8,
        "encode_rgb24": encode_rgb24,
        "_rle8": _rle8,
    }


def _codec():
    global _C
    try:
        return _C
    except NameError:
        _C = _build_bmp_codec()
        return _C


def bmp_decode(b: bytes):
    """Decode a BMP blob to ``(width, height, 3, rgb_bytes)`` or ``None``."""
    return _codec()["decode"](b)


def bmp_encode_gray8(pixels: bytes, width: int, rle: bool = False, topdown: bool = False) -> bytes:
    """Encode gray bytes as an 8-bit identity-palette BMP (raw or RLE8)."""
    return _codec()["encode_gray8"](pixels, width, rle, topdown)


def bmp_encode_rgb24(rgb: bytes, width: int) -> bytes:
    """Encode packed RGB bytes as a bottom-up 24-bit BMP."""
    return _codec()["encode_rgb24"](rgb, width)
