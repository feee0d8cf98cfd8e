"""Matroska/WebM (EBML) tools: a minimal synthesizer and an
element-walk profiler.

Seventh profiler in the curation-primitive pattern (JPEG quality,
audio header, MP4 box walk, MP3 frame walk, Ogg page walk): WebM is
the other dominant crawl-video container next to MP4 (round-10
verdict #4), and curation's first pass is an ELEMENT walk — doc type,
duration, track codecs, dimensions, cluster count — never a block
decode. The profiler reads each EBML element's vint ID + vint size and
skips payloads it doesn't summarize (SimpleBlock data above all), so
cost is O(elements), not O(bytes).

Layouts per the public RFC 8794 (EBML: variable-length element IDs
retaining their marker bit, sizes with the marker stripped, all-ones
size = unknown/streaming) and the Matroska element registry
(Segment/Info/TimestampScale/Duration, Tracks/TrackEntry/TrackType/
CodecID/Video/Audio, Cluster/Timestamp/SimpleBlock). Duration is a
float element counting TimestampScale-nanosecond ticks; the profiler
truncates it to an integer tick count (the synthesizer writes
integer-valued doubles — exact in IEEE 754) and derives floor-integer
milliseconds, the engine-exact tie policy every profiler here shares.

Both callables are factory-built nested closures (ship-by-value in
``mapInPandas``; see ``mp4.py``).

Reference parity note: the reference engine has no media tier; this
extends the brief's curation surface beyond the reference's operators.
"""

from __future__ import annotations


def webm_encode_fn():
    """Factory for the minimal Matroska/WebM synthesizer. Returns
    ``encode(n_clusters, *, doc_type, video, audio, timestamp_scale,
    cluster_ticks, block_data, unknown_segment_size) -> bytes``: an
    EBML header + one Segment holding Info (TimestampScale, Duration =
    n_clusters * cluster_ticks), Tracks (a video TrackEntry, plus an
    audio one when ``audio``), and ``n_clusters`` Clusters each with a
    Timestamp and one SimpleBlock of ``block_data`` payload bytes.
    ``video`` = (codec_id, width, height); ``audio`` = (codec_id,
    channels, sample_rate) or None. ``unknown_segment_size`` writes the
    Segment with the all-ones (streaming/live) size — in the wild for
    live-muxed WebM, and the profiler must treat it as to-end-of-file.
    """
    import struct

    def _esize(n, unknown=False):
        if unknown:
            return b"\xff"  # 1-byte all-ones: unknown size
        for length in range(1, 9):
            if n < (1 << (7 * length)) - 1:
                marker = 0x80 >> (length - 1)
                raw = n | (marker << (8 * (length - 1)))
                return raw.to_bytes(length, "big")
        raise ValueError("size too large")

    def _el(eid, payload, unknown=False):
        return eid + _esize(len(payload), unknown) + payload

    def _uint(eid, v):
        nbytes = max(1, (v.bit_length() + 7) // 8)
        return _el(eid, v.to_bytes(nbytes, "big"))

    def _float(eid, v):
        return _el(eid, struct.pack(">d", float(v)))

    def _str(eid, s):
        return _el(eid, s.encode("ascii"))

    def encode(
        n_clusters,
        *,
        doc_type="webm",
        video=("V_VP9", 640, 360),
        audio=("A_OPUS", 2, 48000),
        timestamp_scale=1_000_000,
        cluster_ticks=40,
        block_data=80,
        unknown_segment_size=False,
    ):
        header = _el(
            b"\x1a\x45\xdf\xa3",
            _uint(b"\x42\x86", 1)           # EBMLVersion
            + _uint(b"\x42\xf7", 1)         # EBMLReadVersion
            + _uint(b"\x42\xf2", 4)         # EBMLMaxIDLength
            + _uint(b"\x42\xf3", 8)         # EBMLMaxSizeLength
            + _str(b"\x42\x82", doc_type)   # DocType
            + _uint(b"\x42\x87", 4)         # DocTypeVersion
            + _uint(b"\x42\x85", 2),        # DocTypeReadVersion
        )
        info = _el(
            b"\x15\x49\xa9\x66",
            _uint(b"\x2a\xd7\xb1", timestamp_scale)
            + _float(b"\x44\x89", n_clusters * cluster_ticks)  # Duration
            + _str(b"\x4d\x80", "monster-etl-spark")           # MuxingApp
            + _str(b"\x57\x41", "webm_encode"),                # WritingApp
        )
        vcodec, w, h = video
        entries = _el(
            b"\xae",
            _uint(b"\xd7", 1)               # TrackNumber
            + _uint(b"\x73\xc5", 1)         # TrackUID
            + _uint(b"\x83", 1)             # TrackType: video
            + _str(b"\x86", vcodec)         # CodecID
            + _el(
                b"\xe0",                     # Video
                _uint(b"\xb0", w) + _uint(b"\xba", h),
            ),
        )
        if audio is not None:
            acodec, chans, rate = audio
            entries += _el(
                b"\xae",
                _uint(b"\xd7", 2)
                + _uint(b"\x73\xc5", 2)
                + _uint(b"\x83", 2)         # TrackType: audio
                + _str(b"\x86", acodec)
                + _el(
                    b"\xe1",                 # Audio
                    _float(b"\xb5", rate) + _uint(b"\x9f", chans),
                ),
            )
        tracks = _el(b"\x16\x54\xae\x6b", entries)
        clusters = b""
        for ci in range(n_clusters):
            # SimpleBlock: track vint (0x80|1), s16 relative timestamp,
            # flags (0x80 keyframe), then opaque frame bytes
            blk = b"\x81" + struct.pack(">hB", 0, 0x80) + b"\x00" * block_data
            clusters += _el(
                b"\x1f\x43\xb6\x73",
                _uint(b"\xe7", ci * cluster_ticks) + _el(b"\xa3", blk),
            )
        return header + _el(
            b"\x18\x53\x80\x67", info + tracks + clusters,
            unknown=unknown_segment_size,
        )

    return encode


def webm_profile_fn():
    """Factory for the Matroska/WebM element-walk profiler.

    Returns ``profile(b) -> dict | None`` with ``doc_type`` /
    ``doc_type_version`` (EBML header), ``timestamp_scale`` (ns/tick),
    ``duration_ms`` (floor of Duration ticks x scale in ms; None when
    the Info carries no Duration), ``n_tracks``, first-track-per-kind
    summaries ``video_codec`` / ``video_width`` / ``video_height`` and
    ``audio_codec`` / ``audio_channels`` / ``audio_sample_rate``,
    ``n_clusters``, and ``block_bytes`` (summed SimpleBlock/Block
    element payload sizes — blocks are skipped by size, never read).
    ``None`` for anything that is not EBML or whose element structure
    is malformed/truncated; an unknown-size (all-ones) Segment extends
    to end-of-buffer per RFC 8794."""
    import struct

    def _vint(b, i, keep_marker):
        """(value, next_index) or None — EBML variable-length integer.
        IDs keep the marker bit (the registry lists them that way);
        sizes strip it. All-value-bits-ones sizes return -1 (unknown).
        """
        if i >= len(b) or b[i] == 0:
            return None
        length = 9 - b[i].bit_length()
        if i + length > len(b):
            return None
        if keep_marker:
            v = int.from_bytes(b[i : i + length], "big")
            return v, i + length
        v = b[i] & (0xFF >> length)
        ones = v == (0xFF >> length)
        for j in range(1, length):
            v = (v << 8) | b[i + j]
            ones = ones and b[i + j] == 0xFF
        return (-1 if ones else v), i + length

    def _walk(b, start, end):
        """(id, body_start, body_end) list for [start, end), or None on
        malformed structure. Unknown-size elements extend to ``end``
        (and are necessarily last)."""
        out = []
        i = start
        while i < end:
            rid = _vint(b, i, keep_marker=True)
            if rid is None:
                return None
            eid, j = rid
            rsz = _vint(b, j, keep_marker=False)
            if rsz is None:
                return None
            size, k = rsz
            stop = end if size == -1 else k + size
            if stop > end:
                return None
            out.append((eid, k, stop))
            if size == -1:
                break
            i = stop
        return out

    def _uint(b, s, e):
        return int.from_bytes(b[s:e], "big") if e > s else 0

    def _floatv(b, s, e):
        if e - s == 4:
            return struct.unpack(">f", b[s:e])[0]
        if e - s == 8:
            return struct.unpack(">d", b[s:e])[0]
        return None

    def profile(b):
        b = bytes(b)
        if len(b) < 8 or b[:4] != b"\x1a\x45\xdf\xa3":
            return None
        top = _walk(b, 0, len(b))
        if not top:
            return None
        out = {
            "doc_type": None, "doc_type_version": None,
            "timestamp_scale": 1_000_000, "duration_ms": None,
            "n_tracks": 0, "video_codec": None, "video_width": None,
            "video_height": None, "audio_codec": None,
            "audio_channels": None, "audio_sample_rate": None,
            "n_clusters": 0, "block_bytes": 0,
        }
        dur_ticks = None
        for eid, s, e in top:
            if eid == 0x1A45DFA3:
                for kid, ks, ke in _walk(b, s, e) or ():
                    if kid == 0x4282:
                        out["doc_type"] = b[ks:ke].decode("ascii", "replace")
                    elif kid == 0x4287:
                        out["doc_type_version"] = _uint(b, ks, ke)
            elif eid == 0x18538067:  # Segment
                kids = _walk(b, s, e)
                if kids is None:
                    return None
                for kid, ks, ke in kids:
                    if kid == 0x1549A966:  # Info
                        for t, ts_, te in _walk(b, ks, ke) or ():
                            if t == 0x2AD7B1:
                                sc = _uint(b, ts_, te)
                                if sc == 0:
                                    return None
                                out["timestamp_scale"] = sc
                            elif t == 0x4489:
                                f = _floatv(b, ts_, te)
                                if f is None or f < 0:
                                    return None
                                dur_ticks = int(f)
                    elif kid == 0x1654AE6B:  # Tracks
                        entries = _walk(b, ks, ke)
                        if entries is None:
                            return None
                        for t, ts_, te in entries:
                            if t != 0xAE:
                                continue
                            out["n_tracks"] += 1
                            kind = None
                            codec = None
                            sub = _walk(b, ts_, te)
                            if sub is None:
                                return None
                            fields: dict = {}
                            for u, us, ue in sub:
                                if u == 0x83:
                                    kind = _uint(b, us, ue)
                                elif u == 0x86:
                                    codec = b[us:ue].decode("ascii", "replace")
                                elif u == 0xE0:  # Video
                                    for v, vs, ve in _walk(b, us, ue) or ():
                                        if v == 0xB0:
                                            fields["w"] = _uint(b, vs, ve)
                                        elif v == 0xBA:
                                            fields["h"] = _uint(b, vs, ve)
                                elif u == 0xE1:  # Audio
                                    for v, vs, ve in _walk(b, us, ue) or ():
                                        if v == 0xB5:
                                            f = _floatv(b, vs, ve)
                                            if f is not None:
                                                fields["rate"] = int(f)
                                        elif v == 0x9F:
                                            fields["ch"] = _uint(b, vs, ve)
                            if kind == 1 and out["video_codec"] is None:
                                out["video_codec"] = codec
                                out["video_width"] = fields.get("w")
                                out["video_height"] = fields.get("h")
                            elif kind == 2 and out["audio_codec"] is None:
                                out["audio_codec"] = codec
                                out["audio_channels"] = fields.get("ch")
                                out["audio_sample_rate"] = fields.get("rate")
                    elif kid == 0x1F43B673:  # Cluster
                        out["n_clusters"] += 1
                        for t, ts_, te in _walk(b, ks, ke) or ():
                            if t in (0xA3, 0xA1):  # SimpleBlock / Block
                                out["block_bytes"] += te - ts_
        if out["doc_type"] is None:
            return None
        if dur_ticks is not None:
            # ticks x (scale ns) -> floor integer ms, exact int math
            out["duration_ms"] = dur_ticks * out["timestamp_scale"] // 1_000_000
        return out

    return profile


def webm_encode(n_clusters: int, **kw) -> bytes:
    """Driver-side convenience wrapper of :func:`webm_encode_fn`."""
    return webm_encode_fn()(n_clusters, **kw)


def webm_profile(b: bytes):
    """Driver-side convenience wrapper of :func:`webm_profile_fn`."""
    return webm_profile_fn()(b)
