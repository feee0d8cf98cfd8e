"""Baseline JPEG codec: decoder spec-compliance (hand-assembled stream),
encode->decode round-trips (exactness contract for constant blocks, error
bound for general content), color subsampling, restart markers, and the
never-raise contract on junk/out-of-scope streams."""

import struct

from monster_etl_spark.operators.jpeg import (
    jpeg_decode,
    jpeg_encode_gray8,
    jpeg_encode_rgb8,
)


def _hand_assembled_gray128():
    """Minimal 8x8 all-128 grayscale baseline JPEG assembled BY HAND from
    the T.81 spec (not via our encoder): 128 level-shifts to 0, so the
    block is DC category 0 + EOB. With the Annex K luma tables: DC cat-0
    code = '00' (2 bits), AC EOB = '1010' (4 bits) -> entropy byte
    0b00101011 = 0x2B (padded with 1s). Decoding this correctly proves
    the decoder against the spec independent of our own encoder."""

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    bits_dc = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    vals_dc = list(range(12))
    bits_ac = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
    # only the first few AC symbols matter for EOB, but tables must be complete
    vals_ac = [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]
    dht = seg(0xC4, bytes([0x00]) + bytes(bits_dc) + bytes(vals_dc)) + seg(
        0xC4, bytes([0x10]) + bytes(bits_ac) + bytes(vals_ac)
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes([0x2B]) + b"\xff\xd9"


def test_decoder_against_hand_assembled_spec_stream():
    out = jpeg_decode(_hand_assembled_gray128())
    assert out is not None
    w, h, c, px = out
    assert (w, h, c) == (8, 8, 1)
    assert px == bytes([128]) * 64


def test_constant_blocks_roundtrip_exactly():
    """quant=1 constant blocks have a lone integer DC coefficient — the
    lossless property the analytic registry oracle relies on."""
    img = b"".join(bytes([7] * 8 + [200] * 8) for _ in range(8))  # 16x8, 2 blocks
    w, h, c, px = jpeg_decode(jpeg_encode_gray8(img, 16))
    assert (w, h, c) == (16, 8, 1)
    assert px == img


def test_general_gray_roundtrip_error_bound():
    """Arbitrary content at quant=1: DCT round-half rounding bounds the
    reconstruction error to a couple of intensity levels. A zigzag or
    huffman defect would produce garbage, not +-2."""
    w, h = 24, 16
    img = bytes(((x * 7 + y * 11) % 256) for y in range(h) for x in range(w))
    W, H, c, px = jpeg_decode(jpeg_encode_gray8(img, w))
    assert (W, H, c) == (w, h, 1)
    assert max(abs(a - b) for a, b in zip(img, px)) <= 2


def test_non_multiple_of_8_dims_cropped():
    img = bytes(range(50))  # 10x5
    W, H, c, px = jpeg_decode(jpeg_encode_gray8(img, 10))
    assert (W, H, c) == (10, 5, 1)
    assert max(abs(a - b) for a, b in zip(img, px)) <= 2


def test_color_subsampling_roundtrip():
    """Constant-color image through 4:4:4 / 4:2:2 / 4:2:0: YCbCr constants
    round-trip their blocks exactly; the only loss is the two color-space
    roundings, so each RGB channel is within 2."""
    rgb = bytes([180, 60, 30] * (16 * 16))
    for sub in ((1, 1), (2, 1), (2, 2)):
        W, H, c, px = jpeg_decode(jpeg_encode_rgb8(rgb, 16, subsample=sub))
        assert (W, H, c) == (16, 16, 3)
        assert all(abs(px[i] - rgb[i]) <= 2 for i in range(len(rgb))), sub


def test_restart_markers_reset_dc_prediction():
    w, h = 32, 16
    img = bytes(((x * 5 + y * 3) % 256) for y in range(h) for x in range(w))
    plain = jpeg_decode(jpeg_encode_gray8(img, w))[3]
    for ri in (1, 2, 3):
        enc = jpeg_encode_gray8(img, w, restart_interval=ri)
        assert b"\xff\xdd" in enc and b"\xff\xd0" in enc  # DRI + RST0 present
        assert jpeg_decode(enc)[3] == plain


def test_out_of_scope_and_junk_return_none():
    assert jpeg_decode(b"") is None
    assert jpeg_decode(b"\xff\xd8\xff\xd9") is None  # no frame
    assert jpeg_decode(b"not a jpeg at all") is None
    # SOF2 stamped onto a BASELINE stream is malformed progressive (a DC
    # scan must have Se=0; this one says Ss=0,Se=63) -> None, not a raise
    prog = bytearray(_hand_assembled_gray128())
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    assert jpeg_decode(bytes(prog)) is None
    # truncated entropy stream must not raise
    good = _hand_assembled_gray128()
    assert jpeg_decode(good[:-3]) in (None, (8, 8, 1, bytes([128]) * 64))


# ---- progressive (SOF2): spectral selection + successive approximation


def test_progressive_gray_matches_baseline_exactly():
    """The progressive scan script reconstructs the SAME quantized
    coefficients as the baseline encoding, so decode output must be
    bit-identical — across quants (AC density), non-aligned dims
    (pad blocks), and the flat fixture shape (pure EOBRUN scans)."""
    from monster_etl_spark.operators.jpeg import jpeg_encode_gray8_progressive

    import random

    rng = random.Random(1234)
    cases = [
        (8, 64, 1), (8, 64, 8), (16, 16 * 24, 4), (32, 32 * 32, 16),
        (13, 13 * 21, 8),  # width not a multiple of 8: pad columns
        (8, 3, 1),         # sub-block payload
        (8, 0, 1),         # empty -> minimum one-block image
    ]
    for w, npx, quant in cases:
        px = bytes(rng.randrange(256) for _ in range(npx))
        base = jpeg_decode(jpeg_encode_gray8(px, w, quant=quant))
        prog = jpeg_decode(jpeg_encode_gray8_progressive(px, w, quant=quant))
        assert prog is not None, (w, npx, quant)
        assert prog == base, (w, npx, quant)
    flat = bytes([77]) * 256
    assert jpeg_decode(jpeg_encode_gray8_progressive(flat, 16)) == jpeg_decode(
        jpeg_encode_gray8(flat, 16)
    )


def test_progressive_gray_smooth_eobrun_and_zrl_paths():
    """Smooth/sparse images produce multi-block EOB runs and long zero
    runs (ZRL) in both first and refinement AC scans."""
    import math

    from monster_etl_spark.operators.jpeg import jpeg_encode_gray8_progressive

    w, h = 64, 48
    smooth = bytes(
        int(128 + 100 * math.sin(x / 9.0) * math.cos(y / 7.0))
        for y in range(h) for x in range(w)
    )
    sparse = bytes(
        (200 if (x // 8 + y // 8) % 5 == 0 else 0) for y in range(h) for x in range(w)
    )
    for px, q in ((smooth, 2), (sparse, 3), (smooth, 16)):
        assert jpeg_decode(jpeg_encode_gray8_progressive(px, w, quant=q)) == jpeg_decode(
            jpeg_encode_gray8(px, w, quant=q)
        )


def test_progressive_rgb_all_subsamplings():
    """Interleaved DC scans + per-component AC scans over subsampled
    chroma grids: 4:4:4, 4:2:2, 4:2:0 all bit-match baseline."""
    import random

    from monster_etl_spark.operators.jpeg import (
        jpeg_encode_rgb8,
        jpeg_encode_rgb8_progressive,
    )

    rng = random.Random(99)
    for w, h, sub, q in [
        (16, 16, (1, 1), 2), (32, 16, (2, 1), 4), (16, 16, (2, 2), 8), (32, 32, (2, 2), 16),
    ]:
        rgb = bytes(rng.randrange(256) for _ in range(3 * w * h))
        base = jpeg_decode(jpeg_encode_rgb8(rgb, w, subsample=sub, quant=q))
        prog = jpeg_decode(jpeg_encode_rgb8_progressive(rgb, w, subsample=sub, quant=q))
        assert prog is not None and prog == base, (w, h, sub, q)


def test_progressive_malformed_scans_return_none():
    from monster_etl_spark.operators.jpeg import jpeg_encode_gray8_progressive

    good = jpeg_encode_gray8_progressive(bytes(range(64)), 8)
    # corrupt the first SOS's successive-approximation byte: Ah=5 with
    # Al=1 is not a legal refinement step
    i = good.index(b"\xff\xda")
    ln = int.from_bytes(good[i + 2 : i + 4], "big")
    bad = bytearray(good)
    bad[i + 2 + ln - 1] = 0x51
    assert jpeg_decode(bytes(bad)) is None
    # truncation anywhere must not raise (partial reconstruction or None
    # are both acceptable under the never-raise contract)
    for cut in range(2, len(good), 7):
        jpeg_decode(good[:cut])


def test_extract_pixel_stats_mixed_formats(spark):
    """PNG rows decode via the PNG path, JPEG rows via the fallback,
    junk rows yield decoded=false — one media table, one pass."""
    from monster_etl_spark.operators.multimodal import (
        extract_pixel_stats,
        png_encode_gray8,
    )

    png = png_encode_gray8(bytes([10, 20, 30, 40]), 2)
    jpg = jpeg_encode_gray8(bytes([50] * 64), 8)
    rows = [(1, bytearray(png)), (2, bytearray(jpg)), (3, bytearray(b"junk"))]
    media = spark.createDataFrame(rows, "media_id: long, content: binary")
    got = {r.media_id: r for r in extract_pixel_stats(media).collect()}
    assert got[1].decoded and (got[1].width, got[1].height) == (2, 2)
    assert got[1].mean_intensity == 25.0
    assert got[2].decoded and (got[2].width, got[2].height, got[2].channels) == (8, 8, 1)
    assert got[2].mean_intensity == 50.0
    assert got[2].min_intensity == got[2].max_intensity == 50
    assert not got[3].decoded and got[3].width is None


def test_lane_decoder_parity_and_fuzz():
    """The vectorized restart-lane decoder (single build) must be
    byte-identical to the force_scalar build on pristine, truncated,
    bit-flipped and byte-inserted restart-segmented streams — both via
    per-blob decode() and the pooled decode_gray8_batch()."""
    import random

    from monster_etl_spark.operators.jpeg import _build_jpeg_codec

    fast = _build_jpeg_codec()
    slow = _build_jpeg_codec(force_scalar=True)
    random.seed(1234)
    blobs = []
    for trial in range(240):
        w = random.choice([16, 32, 64])
        h = random.choice([8, 16, 40, 104])
        px = bytes(random.randrange(256) for _ in range(w * h))
        blob = bytearray(
            fast["encode_gray8"](
                px, w, random.choice([1, 2, 8]),
                restart_interval=random.choice([0, 1, 2, 4, 8, 13]),
            )
        )
        mode = trial % 6
        if mode == 0:
            blob = blob[: random.randrange(2, len(blob))]
        elif mode == 1:
            for _ in range(3):
                blob[random.randrange(len(blob))] = random.randrange(256)
        elif mode == 2:
            i = random.randrange(len(blob) // 2, len(blob))
            blob[i:i] = bytes([random.randrange(256)])
        blobs.append(bytes(blob))
    ref = [slow["decode"](b) for b in blobs]
    assert [fast["decode"](b) for b in blobs] == ref
    assert fast["decode_gray8_batch"](blobs) == ref


def test_lane_decoder_restart_interval_pixel_invariance():
    """Re-encoding the same pixels with any restart interval decodes to
    the identical result (DRI only changes entropy segmentation), and
    the batch API equals per-blob decode on a mixed-geometry batch."""
    import random

    from monster_etl_spark.operators.jpeg import _build_jpeg_codec

    fast = _build_jpeg_codec()
    random.seed(99)
    for _ in range(10):
        w = random.choice([16, 64])
        h = random.choice([8, 72])
        px = bytes(random.randrange(256) for _ in range(w * h))
        base = fast["decode"](fast["encode_gray8"](px, w, 1))
        for ri in (1, 4, 8):
            blob = fast["encode_gray8"](px, w, 1, restart_interval=ri)
            assert fast["decode"](blob) == base


def test_pooled_progressive_decode_parity_and_fuzz():
    """The pooled progressive path in decode_gray8_batch (lockstep
    DC-first/DC-refine/AC-EOB lane scans, whole-blob scalar fallback on
    AC content or damage) must be byte-identical to per-blob decode()
    and the force_scalar build on pristine, AC-bearing, truncated and
    corrupted SOF2 streams mixed with baseline blobs and junk."""
    import random

    from monster_etl_spark.operators.jpeg import _build_jpeg_codec

    fast = _build_jpeg_codec()
    slow = _build_jpeg_codec(force_scalar=True)
    random.seed(4321)
    blobs = []
    for trial in range(120):
        w = random.choice([16, 32, 64])
        if trial % 3 == 0:
            # constant 8x8 blocks: the DC-only pooled fast path
            nb = random.randrange(1, 30)
            row = [random.randrange(256) for _ in range(w // 8)]
            px = bytes(
                v for _r in range(8 * nb) for v in row for _x in range(8)
            )
        else:
            px = bytes(
                random.randrange(256)
                for _ in range(w * random.choice([8, 24, 80]))
            )
        blob = bytearray(
            fast["encode_gray8_progressive"](px, w, random.choice([1, 2]))
        )
        mode = trial % 5
        if mode == 1:
            blob = blob[: random.randrange(2, len(blob))]
        elif mode == 2:
            for _ in range(3):
                blob[random.randrange(len(blob))] = random.randrange(256)
        blobs.append(bytes(blob))
    blobs.append(b"\xff\xd8\xff\xc2")
    blobs.append(fast["encode_gray8"](bytes(range(64)), 8, 1))
    ref = [slow["decode"](b) for b in blobs]
    assert [fast["decode"](b) for b in blobs] == ref
    assert fast["decode_gray8_batch"](blobs) == ref


def test_batch_encoder_parity():
    """encode_gray8_batch must emit byte-identical blobs to per-frame
    encode_gray8 across constant-block frames (vectorized path), random
    frames (scalar fallback), ragged tails, quants and restart
    intervals."""
    import random

    from monster_etl_spark.operators.jpeg import _build_jpeg_codec

    codec = _build_jpeg_codec()
    enc, encb = codec["encode_gray8"], codec["encode_gray8_batch"]
    random.seed(77)
    for quant in (1, 2, 5):
        for ri in (0, 3, 8):
            frames = []
            for t in range(40):
                w = random.choice([16, 32, 61])
                if t % 2:
                    nb = random.randrange(1, 12)
                    row = [random.randrange(256) for _ in range(-(-w // 8))]
                    px = bytes(
                        v
                        for _r in range(8 * nb)
                        for v in row
                        for _x in range(8)
                    )[: w * 8 * nb]
                else:
                    px = bytes(
                        random.randrange(256)
                        for _ in range(random.randrange(1, 700))
                    )
                frames.append((px, w))
            for w in {wf for _p, wf in frames}:
                sub = [p for p, wf in frames if wf == w]
                assert encb(sub, w, quant, ri) == [
                    enc(p, w, quant, ri) for p in sub
                ]


def test_header_profile_fields_and_quality_map():
    """The marker-walk profiler (round-9): DQT/SOF/DRI fields and the
    all-integer libjpeg inverse quality map, against encoder ground
    truth across quant values and both SOF kinds; junk and truncated
    streams profile to None instead of raising."""
    from monster_etl_spark.operators.jpeg import (
        jpeg_encode_gray8,
        jpeg_encode_gray8_progressive,
        jpeg_header_profile,
    )

    px = bytes(range(64)) * 16  # 64x16 gray
    for q in (1, 2, 5, 8, 60):
        b = jpeg_encode_gray8(px, 64, quant=q, restart_interval=8)
        p = jpeg_header_profile(b)
        assert p["sof_marker"] == 0xC0
        assert (p["width"], p["height"]) == (64, 16)
        assert p["precision"] == 8 and p["n_components"] == 1
        assert p["n_quant_tables"] == 1 and p["table_sum"] == 64 * q
        assert p["restart_interval"] == 8
        s = max(1, (100 * 64 * q) // 3688)
        assert p["scaled_percent"] == s
        assert p["quality_estimate"] == (
            5000 // s if s > 100 else (200 - s) // 2
        )

    prog = jpeg_header_profile(jpeg_encode_gray8_progressive(px, 64, quant=3))
    assert prog["sof_marker"] == 0xC2 and prog["restart_interval"] == 0
    assert prog["table_sum"] == 192

    assert jpeg_header_profile(b"") is None
    assert jpeg_header_profile(b"\xff\xd8\xff") is None
    whole = jpeg_encode_gray8(px, 64, quant=2)
    assert jpeg_header_profile(whole[:20]) is None  # truncated mid-segment
    assert jpeg_header_profile(b"RIFF" + whole) is None  # wrong container

    # T.81 B.1.1.2: 0xFF fill bytes before a marker are legal padding —
    # a padded real-corpus file must profile identically, not None
    # (round-9 advice). Inject fill runs after SOI and before the first
    # segment marker's 0xFF.
    base = jpeg_header_profile(whole)
    padded = whole[:2] + b"\xff" * 5 + whole[2:]
    assert jpeg_header_profile(padded) == base
    # padding immediately before a LATER segment: splice after the
    # first segment ends (SOI + first marker + its length + payload)
    seg_len = (whole[4] << 8) | whole[5]
    cut = 2 + 2 + seg_len
    padded2 = whole[:cut] + b"\xff" * 3 + whole[cut:]
    assert jpeg_header_profile(padded2) == base
