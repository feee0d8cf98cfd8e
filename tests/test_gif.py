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


# ---- animation timeline (round-4 verdict #5)


def _fr(left, top, w, h, pixels, **kw):
    return dict(left=left, top=top, width=w, height=h, pixels=pixels, **kw)


def test_frames_banded_leave_disposal_composes_cumulatively():
    from monster_etl_spark.operators.gif import gif_decode_frames, gif_encode_frames

    frames = [
        _fr(0, k * 8, 16, 8, bytes([((k + 1) * 50 + j) % 256 for j in range(128)]),
            delay_cs=7, disposal=1)
        for k in range(3)
    ]
    w, h, nf, fl = gif_decode_frames(gif_encode_frames(16, 24, frames))
    assert (w, h, nf) == (16, 24, 3)
    assert [d for d, _ in fl] == [7, 7, 7]
    # frame 0: only band 0 drawn; frame 2: all three bands persist
    assert fl[0][1][0:3] == bytes([50] * 3)
    assert fl[0][1][3 * 16 * 8 : 3 * 16 * 8 + 3] == b"\x00\x00\x00"
    assert fl[2][1][0:3] == bytes([50] * 3)
    assert fl[2][1][3 * 16 * 8 : 3 * 16 * 8 + 3] == bytes([100] * 3)
    assert fl[2][1][3 * 16 * 16 : 3 * 16 * 16 + 3] == bytes([150] * 3)


def test_frames_disposal_restore_background():
    from monster_etl_spark.operators.gif import gif_decode_frames, gif_encode_frames

    frames = [
        _fr(0, 0, 16, 24, bytes([200]) * (16 * 24), disposal=2),
        _fr(0, 0, 16, 8, bytes([30]) * 128, disposal=1),
    ]
    _w, _h, _nf, fl = gif_decode_frames(gif_encode_frames(16, 24, frames))
    assert fl[0][1][0:3] == bytes([200] * 3)
    # after disposal-2 the 200-canvas is gone: band 2 area is background
    assert fl[1][1][0:3] == bytes([30] * 3)
    assert fl[1][1][3 * 16 * 8 : 3 * 16 * 8 + 3] == b"\x00\x00\x00"


def test_frames_disposal_restore_previous():
    from monster_etl_spark.operators.gif import gif_decode_frames, gif_encode_frames

    frames = [
        _fr(0, 0, 16, 24, bytes([80]) * (16 * 24), disposal=1),
        _fr(4, 4, 4, 4, bytes([250]) * 16, disposal=3),
        _fr(0, 0, 1, 1, bytes([1]), disposal=1),
    ]
    _w, _h, _nf, fl = gif_decode_frames(gif_encode_frames(16, 24, frames))
    p = 3 * (4 * 16 + 4)
    assert fl[1][1][p : p + 3] == bytes([250] * 3)  # overlay visible in its frame
    assert fl[2][1][p : p + 3] == bytes([80] * 3)  # then restored to previous


def test_frames_transparent_index_leaves_canvas():
    from monster_etl_spark.operators.gif import gif_decode_frames, gif_encode_frames

    frames = [
        _fr(0, 0, 16, 24, bytes([99]) * (16 * 24), disposal=1),
        _fr(0, 0, 16, 24, bytes([0, 123]) * (16 * 12), disposal=1, transparent=0),
    ]
    _w, _h, _nf, fl = gif_decode_frames(gif_encode_frames(16, 24, frames))
    assert fl[1][1][0:3] == bytes([99] * 3)  # transparent pixel: canvas shows
    assert fl[1][1][3:6] == bytes([123] * 3)  # opaque pixel: new value


def test_frames_netscape_extension_skipped_and_never_raises():
    from monster_etl_spark.operators.gif import (
        gif_decode,
        gif_decode_frames,
        gif_encode_frames,
    )

    blob = gif_encode_frames(
        8, 8, [_fr(0, 0, 8, 8, bytes(range(64)))], loop=3
    )
    assert b"NETSCAPE2.0" in blob
    # frame-1 decoder skips the app extension too
    assert gif_decode(blob) is not None
    assert gif_decode_frames(b"junk") is None
    assert gif_decode_frames(b"") is None
    for cut in range(0, len(blob), 9):
        gif_decode_frames(blob[:cut])  # never raises


def test_frames_max_frames_cap():
    from monster_etl_spark.operators.gif import gif_decode_frames, gif_encode_frames

    frames = [_fr(0, 0, 4, 4, bytes([k]) * 16) for k in range(10)]
    r = gif_decode_frames(gif_encode_frames(4, 4, frames), max_frames=4)
    assert r is not None and r[2] == 4


def test_frame_stats_match_snapshot_sums_all_disposals():
    """decode_frame_stats' incremental R-sums must equal sum(rgb[::3])
    over decode_frames' snapshots for every disposal method,
    transparency, and the banded-animation construction — and the
    force_scalar twin must return the identical tuples."""
    from monster_etl_spark.operators.gif import _build_gif_codec

    C = _build_gif_codec()
    CS = _build_gif_codec(force_scalar=True)
    cases = [
        # banded leave-disposal animation (the registry construction)
        [
            _fr(0, k * 8, 16, 8,
                bytes([((k + 1) * 50 + j) % 256 for j in range(128)]),
                disposal=1, transparent=0 if k else None)
            for k in range(5)
        ],
        # restore-background then restore-previous
        [
            _fr(0, 0, 16, 24, bytes([200]) * (16 * 24), disposal=2),
            _fr(4, 4, 8, 8, bytes([10]) * 64, disposal=3),
            _fr(0, 0, 16, 8, bytes(range(128)), disposal=0),
        ],
        # transparency over a painted canvas
        [
            _fr(0, 0, 8, 8, bytes([99]) * 64),
            _fr(0, 0, 8, 8, bytes([0, 123] * 32), transparent=0),
        ],
    ]
    from monster_etl_spark.operators.gif import gif_encode_frames

    for frames in cases:
        sw = max(f["left"] + f["width"] for f in frames)
        sh = max(f["top"] + f["height"] for f in frames)
        blob = gif_encode_frames(sw, sh, frames)
        got = C["decode_frame_stats"](blob)
        ref = C["decode_frames"](blob)
        assert got is not None and ref is not None
        assert got[:3] == ref[:3]
        for (d1, r_sum), (d2, rgb) in zip(got[3], ref[3]):
            assert d1 == d2
            assert r_sum == sum(rgb[::3])
        assert CS["decode_frame_stats"](blob) == got
    assert C["decode_frame_stats"](b"junk") is None
    assert C["decode_frame_stats"](b"") is None


def test_lzw_lazy_table_and_speculative_path_parity():
    """The lazy-dictionary + speculative whole-stream fast paths must be
    byte-identical to the scalar decoder on: literal/CLEAR streams at
    every run length around the width-bump threshold (including runs
    that DO grow the width), streams with valid back-references (forcing
    materialization of deferred entries), and degenerate min_code < 2
    streams where the base table already exceeds 1 << width."""
    import random

    from monster_etl_spark.operators.gif import _build_gif_codec

    lz = _build_gif_codec()["_lzw"]
    lzs = _build_gif_codec(force_scalar=True)["_lzw"]
    rng = random.Random(20260815)

    def pack(codes, mc):
        acc = nb = 0
        buf = bytearray()
        w, tl, prev = mc + 1, (1 << mc) + 2, False
        CLEAR = 1 << mc
        for c in codes:
            acc |= c << nb
            nb += w
            while nb >= 8:
                buf.append(acc & 0xFF)
                acc >>= 8
                nb -= 8
            if c == CLEAR:
                tl, prev, w = CLEAR + 2, False, mc + 1
            elif c != CLEAR + 1:
                if prev:
                    tl += 1
                prev = True
                if tl == (1 << w) and w < 12:
                    w += 1
        if nb:
            buf.append(acc & 0xFF)
        return bytes(buf)

    for mc in (2, 4, 8):
        CLEAR = 1 << mc
        bound = (1 << (mc + 1)) - CLEAR - 2
        for L in (1, bound, bound + 1, 300):
            vals = [rng.randrange(CLEAR) for _ in range(900)]
            codes, run = [CLEAR], 0
            for v in vals:
                if run == L:
                    codes.append(CLEAR)
                    run = 0
                codes.append(v)
                run += 1
            codes.append(CLEAR + 1)
            data = pack(codes, mc)
            for lim in (1, 50, 10**6):
                assert lz(data, mc, lim) == lzs(data, mc, lim), (mc, L, lim)
    # back-reference streams: deferred entries must materialize correctly
    for _ in range(60):
        mc, CLEAR = 8, 256
        codes, tl, w, prev = [CLEAR], 258, 9, False
        for _ in range(rng.randrange(5, 300)):
            r = rng.random()
            if r < 0.6:
                c = rng.randrange(CLEAR)
            elif r < 0.9 and tl > 258:
                c = rng.randrange(258, tl + 1)
            else:
                c = CLEAR
            codes.append(c)
            if c == CLEAR:
                tl, prev, w = 258, False, 9
            else:
                if prev:
                    tl += 1
                prev = True
                if tl == (1 << w) and w < 12:
                    w += 1
        data = pack(codes, mc)
        for lim in (1, 100, 10**6):
            assert lz(data, mc, lim) == lzs(data, mc, lim)
    # random garbage at every min_code, incl. the degenerate ones
    for _ in range(400):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 200)))
        mc = rng.choice([0, 1, 2, 3, 4, 8])
        lim = rng.randrange(1, 3000)
        assert lz(data, mc, lim) == lzs(data, mc, lim)


def test_batch_frame_stats_equals_per_blob():
    """Round-8 pooled timeline decode: ``decode_frame_stats_batch`` must
    return tuples EQUAL to the per-blob ``decode_frame_stats`` for every
    blob, across a mixed batch exercising every pooled code path — all
    disposal methods, transparency, local palettes, mixed frame
    geometries (grouped AND ragged), interlaced single-frame blobs,
    malformed members (None in place), width-bump streams (per-frame
    fallback), and a max_frames cap. The force_scalar twin must agree."""
    import random

    from monster_etl_spark.operators.gif import _build_gif_codec, gif_encode_frames

    C = _build_gif_codec()
    CS = _build_gif_codec(force_scalar=True)
    rng = random.Random(8)

    blobs = []
    # banded leave-disposal animations with varying frame counts/widths
    for n in (1, 3, 7):
        fbw = rng.choice((8, 16))
        frames = [
            _fr(0, k * 8, fbw, 8,
                bytes(rng.randrange(256) for _ in range(fbw * 8)),
                disposal=1, transparent=0 if k else None)
            for k in range(n)
        ]
        blobs.append(gif_encode_frames(fbw, 8 * n, frames))
    # all disposals incl restore-background / restore-previous
    blobs.append(gif_encode_frames(16, 24, [
        _fr(0, 0, 16, 24, bytes([200]) * (16 * 24), disposal=2),
        _fr(4, 4, 8, 8, bytes([10]) * 64, disposal=3),
        _fr(0, 0, 16, 8, bytes(range(128)), disposal=0),
        _fr(2, 10, 4, 4, bytes([0, 7] * 8), disposal=1, transparent=0),
    ]))
    # malformed members: junk, empty, truncated
    blobs.append(b"junk")
    blobs.append(b"")
    blobs.append(blobs[0][: len(blobs[0]) // 2])
    # a REAL dictionary-growth stream (repeats compress): forces the
    # per-frame _lzw fallback inside the batch path
    rep = (b"\x05\x06\x07" * 200)[:400]
    import struct as _st

    def _ref_compress(data, mc):
        # reference LZW compressor (same as the dictionary-growth test)
        CLEAR, END = 1 << mc, (1 << mc) + 1
        table = {bytes([k]): k for k in range(CLEAR)}
        nxt, w = CLEAR + 2, mc + 1
        acc = nb = 0
        out = bytearray()

        def put(c, w):
            nonlocal acc, nb
            acc |= c << nb
            nb += w
            while nb >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nb -= 8

        put(CLEAR, w)
        s = b""
        for ch in bytes(data):
            s2 = s + bytes([ch])
            if s2 in table:
                s = s2
                continue
            put(table[s], w)
            table[s2] = nxt
            nxt += 1
            if nxt == (1 << w) + 1 and w < 12:
                w += 1
            s = bytes([ch])
        if s:
            put(table[s], w)
        put(END, w)
        if nb:
            out.append(acc & 0xFF)
        return bytes(out)

    hdr = bytearray(b"GIF89a") + _st.pack("<HH", 20, 20) + bytes([0xF7, 0, 0])
    for v in range(256):
        hdr += bytes([v, v, v])
    body = bytearray(b"\x2c" + _st.pack("<HHHH", 0, 0, 20, 20) + b"\x00\x08")
    stream = _ref_compress(rep, 8)
    for i in range(0, len(stream), 255):
        ch = stream[i : i + 255]
        body += bytes([len(ch)]) + ch
    body += b"\x00\x3b"
    blobs.append(bytes(hdr) + bytes(body))

    batch = C["decode_frame_stats_batch"](blobs)
    per = [C["decode_frame_stats"](b) for b in blobs]
    assert len(batch) == len(per)
    for g, r in zip(batch, per):
        assert (g is None) == (r is None)
        if r is not None:
            assert g[:3] == r[:3]
            assert list(map(tuple, g[3])) == list(map(tuple, r[3]))
    # at least one real success and one real None in the fixture
    assert any(r is not None for r in per) and any(r is None for r in per)
    # the dictionary-growth blob decoded (fallback path exercised)
    assert per[-1] is not None and batch[-1] is not None

    # max_frames cap flows through the batch path
    b7 = blobs[2]  # the 7-frame animation
    capped = C["decode_frame_stats_batch"]([b7], max_frames=3)[0]
    assert capped == C["decode_frame_stats"](b7, 3)
    assert capped[2] == 3

    # force_scalar twin: same tuples via the per-blob delegation
    scalar = CS["decode_frame_stats_batch"](blobs)
    for g, r in zip(scalar, per):
        assert (g is None) == (r is None)
        if r is not None:
            assert g[:3] == r[:3]
            assert list(map(tuple, g[3])) == list(map(tuple, r[3]))


def test_batch_frame_stats_interlaced_and_local_palette():
    """Interlaced frames and frames with a LOCAL color table must decode
    identically through the pooled path (row-permutation + per-frame
    palette pools)."""
    import struct as _st

    from monster_etl_spark.operators.gif import _build_gif_codec

    C = _build_gif_codec()
    # hand-built: global palette, one interlaced image using a local
    # 4-entry palette (min_code 2 -> real width-3 codes via fallback)
    hdr = bytearray(b"GIF89a") + _st.pack("<HH", 4, 4) + bytes([0xF0, 0, 0])
    hdr += bytes([10, 10, 10, 20, 20, 20])  # global palette (2 entries)
    img = bytearray(b"\x2c" + _st.pack("<HHHH", 0, 0, 4, 4))
    img += bytes([0xC1])  # local palette (4 entries), interlaced
    img += bytes([1, 2, 3, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    # pixel indices 0..3 row-major, fed through the reference packer
    pix = bytes([0, 1, 2, 3] * 4)
    mc = 2
    CLEAR, END = 4, 5
    acc = nb = 0
    out = bytearray()
    w = 3
    tl = 6

    def put(c):
        nonlocal acc, nb, w, tl
        acc |= c << nb
        nb += w
        while nb >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nb -= 8

    put(CLEAR)
    prev = False
    for v in pix:
        put(v)
        if prev:
            tl += 1
        prev = True
        if tl == (1 << w) and w < 12:
            w += 1
    put(END)
    if nb:
        out.append(acc & 0xFF)
    img += bytes([mc, len(out)]) + bytes(out) + b"\x00"
    blob = bytes(hdr) + bytes(img) + b"\x3b"
    per = C["decode_frame_stats"](blob)
    got = C["decode_frame_stats_batch"]([blob])[0]
    assert per is not None and got is not None
    assert got[:3] == per[:3]
    assert list(map(tuple, got[3])) == list(map(tuple, per[3]))
