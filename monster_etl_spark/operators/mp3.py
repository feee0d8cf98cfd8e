"""MPEG-audio (MP3) frame tools: a minimal CBR synthesizer and a
frame-walk profiler.

Fourth profiler in the curation-primitive pattern (JPEG quality, audio
header, MP4 box walk): MP3 is the dominant lossy audio format in a web
crawl, and the first curation pass reads frame HEADERS only — version,
layer, bitrate, sample rate, channel mode, frame count, duration —
never a single MDCT. The profiler hops frame-to-frame by the computed
frame length (4 header bytes read per frame, body skipped), so cost is
O(frames), and an ID3v2 tag is skipped by its syncsafe size as any
real decoder must.

Header layout per the public ISO/IEC 11172-3 specification (and the
13818-3 / "2.5" extensions for completeness of the version field):
11-bit sync, 2-bit version, 2-bit layer, protection, 4-bit bitrate
index, 2-bit sample-rate index, padding, private, 2-bit channel mode,
remainder. Layer III frame length = 144 * bitrate / sample_rate +
padding (MPEG1; the synthesizer emits MPEG1 Layer III CBR streams).

Both callables are factory-built nested closures (ship-by-value inside
``mapInPandas``; see ``mp4.py``).

Reference parity note: the reference engine has no media tier; this
extends the brief's curation surface beyond the reference's operators.
"""

from __future__ import annotations

# MPEG1 Layer III tables (public spec): bitrate index 1..14 (kbps),
# sample-rate index 0..2
MPEG1_L3_BITRATES = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
MPEG1_RATES = (44100, 48000, 32000)
SAMPLES_PER_FRAME_L3_V1 = 1152


def mp3_encode_fn():
    """Factory for the minimal MPEG1 Layer III CBR synthesizer. Returns
    ``encode(n_frames, *, bitrate_idx, rate_idx, mono, id3) -> bytes``:
    ``n_frames`` valid frame headers each followed by a zero body of
    the exact computed frame length, optionally preceded by a 64-byte
    ID3v2 tag (10-byte header + 54 bytes of padding, syncsafe size) so
    the profiler's tag-skip path is exercised by the corpus itself."""

    def encode(n_frames, *, bitrate_idx=9, rate_idx=0, mono=False, id3=False,
               xing=None):
        br = MPEG1_L3_BITRATES[bitrate_idx - 1] * 1000
        rate = MPEG1_RATES[rate_idx]
        flen = (144 * br) // rate  # padding bit 0 always
        # sync=0x7FF, version=11 (MPEG1), layer=01 (III), no-CRC=1
        b0 = 0xFF
        b1 = 0xFB
        b2 = (bitrate_idx << 4) | (rate_idx << 2)  # padding=0, private=0
        b3 = (0b11 if mono else 0b00) << 6
        frame = bytes((b0, b1, b2, b3)) + b"\x00" * (flen - 4)
        out = bytearray()
        if id3:
            # ID3v2.3 header: 'ID3', version, flags, syncsafe size (54)
            out += b"ID3\x03\x00\x00" + bytes((0, 0, 0, 54)) + b"\x00" * 54
        if xing in ("xing", "info"):
            # A first "Xing"/"Info" metadata frame (round-10 verdict #6):
            # the tag sits after the MPEG1 side info (17 bytes mono, 32
            # otherwise), magic + flags 0x3 (frames|bytes present) +
            # frame count (the AUDIO frames that follow, the decoder
            # convention) + byte count from this frame's start to EOS.
            side = 17 if mono else 32
            magic = b"Xing" if xing == "xing" else b"Info"
            tag = magic + (3).to_bytes(4, "big")
            tag += n_frames.to_bytes(4, "big")
            tag += ((n_frames + 1) * flen).to_bytes(4, "big")
            body = b"\x00" * side + tag
            body += b"\x00" * (flen - 4 - len(body))
            out += bytes((b0, b1, b2, b3)) + body
        out += frame * n_frames
        return bytes(out)

    return encode


def mp3_frame_profile_fn():
    """Factory for the MP3 frame-walk profiler.

    Returns ``profile(b) -> dict | None`` with ``version`` ('1', '2',
    '2.5'), ``layer`` (1-3), ``bitrate_kbps`` / ``sample_rate`` /
    ``channel_mode`` ('stereo', 'joint', 'dual', 'mono') from the first
    frame, ``n_frames`` (every header validated, bodies skipped),
    ``cbr`` (all frames at one bitrate), ``duration_ms`` (integer
    FLOOR — the engine-exact tie policy every profiler here uses),
    ``id3_bytes`` (skipped tag size incl. header) and ``stream_bytes``
    (total bytes walked). ``None`` for anything that is not an MPEG
    audio stream or whose frame chain is malformed/truncated — a
    corrupt blob must never raise mid-batch.

    Xing/Info fast path (round-10 verdict #6): real VBR files carry a
    first-frame "Xing" (or CBR-written "Info") tag after the side info
    with frame/byte totals. When BOTH totals are present and the byte
    total lands exactly on end-of-stream, the profiler trusts them and
    returns at O(1) frames read — ``n_frames`` = the tag's count (the
    audio frames following the tag frame, the decoder convention),
    ``cbr`` False for Xing / True for Info, ``vbr_header`` naming the
    tag. Any inconsistency (missing field, byte total not matching the
    buffer) falls back to the full walk, which then counts the tag
    frame like any other and leaves ``cbr`` to the per-frame bitrates
    — trust-but-verify at O(1), never a wrong answer at O(1).
    ``vbr_header`` is None for plain streams.

    Strictness: the walk must land exactly on end-of-stream; trailing
    garbage or a mid-frame truncation profiles as None rather than a
    best-effort count (a crawl-curation filter wants a clean CBR/VBR
    verdict, not a guess)."""
    bitrates_v1 = {
        1: (None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
        2: (None, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
        3: (None,) + MPEG1_L3_BITRATES,
    }
    # MPEG2/2.5 share one table for layers II+III
    bitrates_v2_l1 = (None, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
    bitrates_v2_l23 = (None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    rates = {"1": (44100, 48000, 32000), "2": (22050, 24000, 16000),
             "2.5": (11025, 12000, 8000)}
    modes = ("stereo", "joint", "dual", "mono")

    def profile(b):
        b = bytes(b)
        i = 0
        id3_bytes = 0
        if len(b) >= 10 and b[:3] == b"ID3":
            size = (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
            id3_bytes = 10 + size
            i = id3_bytes
            if i > len(b):
                return None
        first = None
        n_frames = 0
        cbr = True
        vbr_header = None
        total_sample_num = 0  # samples accumulate per-frame (VBR-safe)
        while i < len(b):
            if i + 4 > len(b) or b[i] != 0xFF or (b[i + 1] & 0xE0) != 0xE0:
                return None
            ver_bits = (b[i + 1] >> 3) & 0x3
            layer_bits = (b[i + 1] >> 1) & 0x3
            if ver_bits == 1 or layer_bits == 0:
                return None  # reserved
            version = {0: "2.5", 2: "2", 3: "1"}[ver_bits]
            layer = {3: 1, 2: 2, 1: 3}[layer_bits]
            br_idx = (b[i + 2] >> 4) & 0xF
            sr_idx = (b[i + 2] >> 2) & 0x3
            padding = (b[i + 2] >> 1) & 0x1
            mode = (b[i + 3] >> 6) & 0x3
            if br_idx in (0, 15) or sr_idx == 3:
                return None  # free-format / reserved: not walkable
            if version == "1":
                br = bitrates_v1[layer][br_idx]
            else:
                br = (bitrates_v2_l1 if layer == 1 else bitrates_v2_l23)[br_idx]
            rate = rates[version][sr_idx]
            if layer == 1:
                flen = (12 * br * 1000 // rate + padding) * 4
                spf = 384
            else:
                factor = 144 if (layer == 2 or version == "1") else 72
                flen = factor * br * 1000 // rate + padding
                spf = 1152 if (layer == 2 or version == "1") else 576
            if flen < 4 or i + flen > len(b):
                return None  # truncated mid-frame
            if first is None:
                first = {
                    "version": version, "layer": layer, "bitrate_kbps": br,
                    "sample_rate": rate, "channel_mode": modes[mode],
                }
                # Xing/Info tag sits after the side info of the FIRST
                # frame (MPEG1: 17 bytes mono / 32 otherwise; MPEG2/2.5:
                # 9 / 17). Fast path only when frames+bytes are both
                # present AND the byte total lands exactly on
                # end-of-stream — else fall through to the full walk.
                side = (
                    (17 if mode == 3 else 32) if version == "1"
                    else (9 if mode == 3 else 17)
                )
                t = i + 4 + side
                if t + 8 <= len(b) and b[t : t + 4] in (b"Xing", b"Info"):
                    vbr_header = "xing" if b[t : t + 4] == b"Xing" else "info"
                    flags = int.from_bytes(b[t + 4 : t + 8], "big")
                    if flags & 0x3 == 0x3 and t + 16 <= len(b):
                        frames_f = int.from_bytes(b[t + 8 : t + 12], "big")
                        bytes_f = int.from_bytes(b[t + 12 : t + 16], "big")
                        if i + bytes_f == len(b):
                            out = dict(first)
                            out["n_frames"] = frames_f
                            out["cbr"] = vbr_header == "info"
                            out["duration_ms"] = (
                                frames_f * spf * 1000 // rate
                            )
                            out["id3_bytes"] = id3_bytes
                            out["stream_bytes"] = len(b)
                            out["vbr_header"] = vbr_header
                            return out
            else:
                if br != first["bitrate_kbps"]:
                    cbr = False
                if (rate != first["sample_rate"] or layer != first["layer"]
                        or version != first["version"]):
                    return None  # mixed stream parameters: not one stream
            total_sample_num += spf
            n_frames += 1
            i += flen
        if first is None:
            return None
        out = dict(first)
        out["n_frames"] = n_frames
        out["cbr"] = cbr
        out["duration_ms"] = total_sample_num * 1000 // first["sample_rate"]
        out["id3_bytes"] = id3_bytes
        out["stream_bytes"] = len(b)
        out["vbr_header"] = vbr_header
        return out

    return profile


def mp3_encode(n_frames: int, **kw) -> bytes:
    """Driver-side convenience wrapper of :func:`mp3_encode_fn`."""
    return mp3_encode_fn()(n_frames, **kw)


def mp3_frame_profile(b: bytes):
    """Driver-side convenience wrapper of :func:`mp3_frame_profile_fn`."""
    return mp3_frame_profile_fn()(b)
