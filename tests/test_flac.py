"""FLAC codec: lossless round-trips, hand-crafted bitstreams for the
decoder paths the fixture encoder does not emit (LPC, stereo
decorrelation, partitioned + escaped Rice, wasted bits, rate/blocksize
code tables), CRC/MD5 corruption detection, and the distributed stats
pass."""

import random
import struct

from monster_etl_spark.operators.flac import (
    _build_flac_codec,
    flac_decode,
    flac_encode_pcm16,
)

C = _build_flac_codec()
W = C["_W"]
crc8, crc16 = C["_crc8"], C["_crc16"]


def test_lossless_roundtrip_shapes():
    random.seed(5)
    for xs in (
        [],
        [0],
        [-32768, 32767],
        [7] * 4097,  # constant spanning a block boundary
        [random.randint(-32768, 32767) for _ in range(4096)],  # exact block
        [random.randint(-32768, 32767) for _ in range(4095)],
        [min(32767, 3 * k - 6000) for k in range(9000)],  # ramp, FIXED-2
    ):
        assert flac_decode(flac_encode_pcm16(xs, 16000)) == (16000, 1, 16, xs)


def test_lossless_roundtrip_stereo_interleaved():
    random.seed(6)
    xs = [random.randint(-2000, 2000) for _ in range(2 * 5000)]
    assert flac_decode(flac_encode_pcm16(xs, 44100, n_channels=2)) == (
        44100, 2, 16, xs,
    )


def test_compression_actually_happens():
    ramp = [k % 1000 for k in range(8192)]
    enc = flac_encode_pcm16(ramp, 16000)
    assert len(enc) < 2 * len(ramp) * 0.5  # FIXED+rice beats raw PCM 2x+


# ---- hand-crafted streams ------------------------------------------------

def _streaminfo(rate, n_ch, bps, total, md5=b"\x00" * 16):
    si = W()
    si.w(4096, 16), si.w(4096, 16), si.w(0, 24), si.w(0, 24)
    si.w(rate, 20), si.w(n_ch - 1, 3), si.w(bps - 1, 5), si.w(total, 36)
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si.bytes() + md5


def _frame(head, bs, chan_code, size_code, body_fn):
    w = W()
    w.w(0b11111111111110, 14), w.w(0, 1), w.w(0, 1)
    w.w(0b0111, 4)  # 16-bit blocksize-1 follows
    w.w(0b0000, 4)  # rate from streaminfo
    w.w(chan_code, 4), w.w(size_code, 3), w.w(0, 1)
    w.w(0, 8)  # frame number 0 (utf8)
    w.w(bs - 1, 16)
    w.w(crc8(w.bytes()), 8)
    body_fn(w)
    w.align()
    fr = w.bytes()
    return head + fr + struct.pack(">H", crc16(fr))


def test_lpc_subframe_decodes():
    # LPC order 2, coefs [2,-1], shift 1: pred = (2a-b)>>1
    xs = [100, 102]
    res = []
    for k in range(2, 16):
        pred = (2 * xs[-1] - xs[-2]) >> 1
        xs.append(pred + (k % 3 - 1))
        res.append(k % 3 - 1)

    def body(w):
        w.w(0, 1)
        w.w(32 + 1, 6)  # LPC order 2 (t-31 = order)
        w.w(0, 1)
        w.w(xs[0], 16), w.w(xs[1], 16)  # warm-up
        w.w(3, 4)  # precision-1 -> 4-bit coefs
        w.w(1, 5)  # shift
        w.w(2, 4), w.w(-1, 4)  # coefficients
        w.w(0b00, 2), w.w(0, 4)  # rice, 1 partition
        w.w(2, 4)  # param
        for r in res:
            u = (r << 1) ^ (r >> 63)
            w.w(0, u >> 2) if u >> 2 else None
            w.w(1, 1)
            w.w(u, 2)

    blob = _frame(_streaminfo(8000, 1, 16, 16), 16, 0, 0b100, body)
    assert flac_decode(blob) == (8000, 1, 16, xs)


def _verbatim(w, vals, bits):
    w.w(0, 1), w.w(0b000001, 6), w.w(0, 1)
    for v in vals:
        w.w(v, bits)


def test_stereo_decorrelation_modes():
    left = [10, -20, 300, -4000, 5, 6, 7, 8]
    right = [3, -7, 150, 4000, -5, 0, 2, 1]
    side = [l - r for l, r in zip(left, right)]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    inter = [v for pair in zip(left, right) for v in pair]
    head = _streaminfo(8000, 2, 16, 8)
    # left/side (code 8): side channel carries bps+1 bits
    ls = _frame(head, 8, 8, 0b100,
                lambda w: (_verbatim(w, left, 16), _verbatim(w, side, 17)))
    assert flac_decode(ls) == (8000, 2, 16, inter)
    # right/side (code 9): side FIRST, then right
    rs = _frame(head, 8, 9, 0b100,
                lambda w: (_verbatim(w, side, 17), _verbatim(w, right, 16)))
    assert flac_decode(rs) == (8000, 2, 16, inter)
    # mid/side (code 10)
    ms = _frame(head, 8, 10, 0b100,
                lambda w: (_verbatim(w, mid, 16), _verbatim(w, side, 17)))
    assert flac_decode(ms) == (8000, 2, 16, inter)


def test_partitioned_and_escaped_rice():
    # FIXED order 1, blocksize 16, partition order 2 -> 4 partitions of 4
    # (first has 3 residuals); partition 2 escaped with 6-bit raw, partition
    # 3 escaped with 0-bit (all-zero) residuals
    xs = [50]
    res = [1, -2, 3, 0, 7, -8, 2, -25, 30, -17, 9, 0, 0, 0, 0]
    for r in res:
        xs.append(xs[-1] + r)

    def body(w):
        w.w(0, 1), w.w(0b001000 | 1, 6), w.w(0, 1)
        w.w(xs[0], 16)
        w.w(0b00, 2), w.w(2, 4)  # rice 4-bit params, 4 partitions
        groups = [res[0:3], res[3:7], res[7:11], res[11:15]]
        for gi, grp in enumerate(groups):
            if gi == 2:
                w.w(0b1111, 4), w.w(6, 5)  # escape: 6-bit raw
                for r in grp:
                    w.w(r, 6)
            elif gi == 3:
                w.w(0b1111, 4), w.w(0, 5)  # escape: 0-bit (all zero)
            else:
                w.w(3, 4)
                for r in grp:
                    u = (r << 1) ^ (r >> 63)
                    w.w(0, u >> 3) if u >> 3 else None
                    w.w(1, 1), w.w(u, 3)

    blob = _frame(_streaminfo(8000, 1, 16, 16), 16, 0, 0b100, body)
    assert flac_decode(blob) == (8000, 1, 16, xs)


def test_rice2_method_and_wasted_bits():
    # method 01 (5-bit rice params) + a CONSTANT subframe with 2 wasted bits
    xs = [40] * 8  # 40 = 10 << 2

    def body(w):
        w.w(0, 1), w.w(0b000000, 6)
        w.w(1, 1)  # wasted-bits flag
        # k-1 unary coded: one 0 bit then the terminating 1 -> k = 2
        w.w(0, 1)
        w.w(1, 1)
        w.w(10, 14)  # constant in bps-2 bits

    blob = _frame(_streaminfo(8000, 1, 16, 8), 8, 0, 0b100, body)
    assert flac_decode(blob) == (8000, 1, 16, xs)

    # rice2: FIXED order 0 with 5-bit parameter field
    ys = [5, -6, 7, -8]

    def body2(w):
        w.w(0, 1), w.w(0b001000, 6), w.w(0, 1)
        w.w(0b01, 2), w.w(0, 4)  # method 1, 1 partition
        w.w(4, 5)  # 5-bit param
        for r in ys:
            u = (r << 1) ^ (r >> 63)
            w.w(0, u >> 4) if u >> 4 else None
            w.w(1, 1), w.w(u, 4)

    blob2 = _frame(_streaminfo(8000, 1, 16, 4), 4, 0, 0b100, body2)
    assert flac_decode(blob2) == (8000, 1, 16, ys)


def test_blocksize_and_rate_code_tables():
    xs = [1, 2, 3, 4] * 48  # 192 samples -> blocksize code 0b0001
    w = W()
    w.w(0b11111111111110, 14), w.w(0, 1), w.w(0, 1)
    w.w(0b0001, 4)  # 192
    w.w(0b0101, 4)  # 16 kHz from the code table
    w.w(0, 4), w.w(0b100, 3), w.w(0, 1)
    w.w(0, 8)
    w.w(crc8(w.bytes()), 8)
    _verbatim(w, xs, 16)
    w.align()
    fr = w.bytes()
    blob = _streaminfo(8000, 1, 16, 192) + fr + struct.pack(">H", crc16(fr))
    # frame-level rate code overrides STREAMINFO in the decoded metadata?
    # No: STREAMINFO is authoritative for the stream; the decoder returns
    # the stream rate but must still PARSE the coded form correctly.
    assert flac_decode(blob) == (8000, 1, 16, xs)


def test_corruption_detected():
    xs = list(range(-500, 500))
    enc = bytearray(flac_encode_pcm16(xs, 16000))
    # flip a bit in the frame payload: CRC-16 (or MD5) must catch it
    enc[len(enc) // 2] ^= 0x10
    assert flac_decode(bytes(enc)) is None
    # truncated stream
    assert flac_decode(bytes(enc[: len(enc) // 2])) is None
    # bad marker
    assert flac_decode(b"fLaX" + bytes(enc[4:])) is None
    assert flac_decode(b"") is None


def test_md5_verification_guards_losslessness():
    xs = [1000, -1000] * 100
    enc = flac_encode_pcm16(xs, 8000)
    assert flac_decode(enc) == (8000, 1, 16, xs)
    # corrupt ONLY the STREAMINFO MD5: frames are intact, MD5 must fail
    idx = enc.index(b"fLaC") + 4 + 4 + 18  # metadata hdr + 18 bytes into SI
    bad = enc[:idx] + bytes([enc[idx] ^ 0xFF]) + enc[idx + 1 :]
    assert flac_decode(bad) is None


def test_extract_audio_stats_flac(spark):
    import math

    from monster_etl_spark.operators.multimodal import (
        documents_as_flac_media,
        extract_audio_stats,
    )

    docs = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, "hello world")], "doc_id long, text string"
    )
    rows = {
        r["media_id"]: r
        for r in extract_audio_stats(
            documents_as_flac_media(docs, 16000), codec="flac"
        ).collect()
    }
    assert rows[1]["n_samples"] == 3 and rows[1]["decoded"]
    s = [(v - 128) * 256 for v in b"abc"]
    assert rows[1]["peak_abs"] == max(abs(v) for v in s)
    assert abs(rows[1]["rms"] - math.sqrt(sum(v * v for v in s) / 3)) < 1e-9
    assert rows[2]["n_samples"] == 0 and rows[2]["decoded"]
    assert rows[3]["n_samples"] == 11
