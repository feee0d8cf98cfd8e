"""ISO-BMFF (MP4) box tools: a minimal synthesizer and a box-walk
profiler.

The third profiler in the round-9 curation-primitive pattern (after the
JPEG quality profiler in ``jpeg.py`` and the audio header profiler in
``multimodal.py``): MP4 is the dominant video container in a web crawl,
and curation's FIRST pass over 100 TB of it is a header walk — brand,
duration, track codecs, dimensions — never a sample decode. The
profiler reads only box headers plus the tiny ``mvhd``/``tkhd``/
``hdlr``/``stsd`` payloads (a few hundred bytes regardless of file
size); ``mdat`` is skipped by its size field, so cost is O(boxes), not
O(bytes).

Layouts follow the public ISO/IEC 14496-12 specification (box = u32
size + fourcc, size==1 -> u64 largesize, size==0 -> to end-of-file;
FullBox = version + 24-bit flags; VisualSampleEntry / AudioSampleEntry
field offsets per §12.1.3 / §12.2.3). No sample decode is attempted —
codec payloads (avcC etc.) are opaque here, exactly as in a real
curation pass.

Both public callables are factory-built NESTED closures (the repo's
media convention, see ``wav._build_wav_codec``): cloudpickle ships
them by value inside ``mapInPandas`` workers, so executors need
neither this module nor any import.

Reference parity note: the reference engine (broadinstitute/monster-etl)
has no media tier; this extends the curation surface the build brief
asks for beyond the reference's own operators.
"""

from __future__ import annotations


def mp4_encode_fn():
    """Factory for the minimal ISO-BMFF synthesizer. Returns
    ``encode(payload, *, major_brand, timescale, duration, video,
    audio, mvhd_version, mdat_largesize) -> bytes`` writing
    ``ftyp`` + ``moov`` (``mvhd`` + one ``trak`` per configured track)
    + ``mdat``.

    ``video`` = (fourcc, width, height) or None; ``audio`` = (fourcc,
    channels, sample_rate) or None. ``mvhd_version`` 0/1 selects the
    32- or 64-bit duration form — both are in the wild and the
    profiler must parse both; ``mdat_largesize`` uses the 64-bit box
    size form (size field == 1 + u64 largesize) to exercise the
    profiler's largesize path on small files.

    Fragmented (DASH/fMP4) form, round-10 verdict #4: ``fragments>0``
    writes the movie-fragment shape instead of a single mdat — mvhd
    duration 0, ``mvex`` (``mehd`` total duration when ``write_mehd``,
    one ``trex`` per track carrying ``default_sample_duration``) inside
    ``moov``, then per fragment a ``moof`` (``mfhd`` sequence number +
    ``traf`` with ``tfhd``/``trun`` for track 1) followed by its own
    ``mdat`` slice of the payload. ``samples_per_frag`` samples per
    fragment at ``sample_duration`` movie ticks each;
    ``trun_durations`` selects per-sample durations in the trun
    (flag 0x000100) vs leaning on the trex default — both shapes are
    in real DASH segments and the profiler must sum either."""
    import struct

    def _box(fourcc, payload, largesize=False):
        if largesize:
            return (
                struct.pack(">I", 1) + fourcc
                + struct.pack(">Q", 16 + len(payload)) + payload
            )
        return struct.pack(">I", 8 + len(payload)) + fourcc + payload

    def _full(version, flags=0):
        return struct.pack(">B", version) + struct.pack(">I", flags)[1:]

    def _sample_entry(fourcc, body):
        # a sample entry is itself box-shaped: u32 size + format + body
        return struct.pack(">I", 8 + len(body)) + fourcc + body

    def encode(
        payload,
        *,
        major_brand=b"isom",
        timescale=600,
        duration=0,
        video=(b"avc1", 64, 48),
        audio=None,
        mvhd_version=0,
        mdat_largesize=False,
        fragments=0,
        samples_per_frag=4,
        sample_duration=25,
        trun_durations=True,
        write_mehd=True,
    ):
        ftyp = _box(
            b"ftyp", major_brand + struct.pack(">I", 0) + major_brand + b"mp41"
        )
        # fragmented movies carry duration in mvex/moof, not mvhd —
        # real muxers write 0 there (the shape the profiler must see)
        hdr_dur = 0 if fragments else duration
        if mvhd_version == 1:
            mvhd = _full(1) + struct.pack(">QQIQ", 0, 0, timescale, hdr_dur)
        else:
            mvhd = _full(0) + struct.pack(">IIII", 0, 0, timescale, hdr_dur)
        # rate, volume, reserved(10), unity matrix, predefined(24), next id
        mvhd += struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        mvhd += b"\x00" * 10
        mvhd += struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        mvhd += b"\x00" * 24 + struct.pack(">I", 99)
        kids = [_box(b"mvhd", mvhd)]

        def _trak(track_id, handler, entry, w, h):
            tkhd = _full(0, 7) + struct.pack(">IIII", 0, 0, track_id, 0)
            tkhd += struct.pack(">I", hdr_dur) + b"\x00" * 8
            tkhd += struct.pack(
                ">HHHH", 0, 0, 0x0100 if handler == b"soun" else 0, 0
            )
            tkhd += struct.pack(
                ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
            )
            tkhd += struct.pack(">II", w << 16, h << 16)  # 16.16 fixed
            mdhd = _full(0) + struct.pack(">IIII", 0, 0, timescale, hdr_dur)
            mdhd += struct.pack(">HH", 0x55C4, 0)  # language 'und'
            hdlr = (
                _full(0) + struct.pack(">I", 0) + handler
                + b"\x00" * 12 + b"\x00"
            )
            stsd = _full(0) + struct.pack(">I", 1) + entry
            minf = _box(b"minf", _box(b"stbl", _box(b"stsd", stsd)))
            mdia = _box(
                b"mdia", _box(b"mdhd", mdhd) + _box(b"hdlr", hdlr) + minf
            )
            return _box(b"trak", _box(b"tkhd", tkhd) + mdia)

        tid = 1
        if video is not None:
            fourcc, w, h = video
            # VisualSampleEntry: SampleEntry(reserved 6 + dri 2), then
            # predefined/reserved(16), width/height(u16), resolutions,
            # reserved, frame_count, compressorname(32), depth, predefined
            ve = b"\x00" * 6 + struct.pack(">H", 1)
            ve += b"\x00" * 16
            ve += struct.pack(">HH", w, h)
            ve += struct.pack(">II", 0x00480000, 0x00480000)
            ve += struct.pack(">I", 0) + struct.pack(">H", 1)
            ve += b"\x00" * 32 + struct.pack(">Hh", 24, -1)
            kids.append(_trak(tid, b"vide", _sample_entry(fourcc, ve), w, h))
            tid += 1
        if audio is not None:
            fourcc, chans, rate = audio
            # AudioSampleEntry: SampleEntry(8), reserved(8), channelcount,
            # samplesize, predefined, reserved, samplerate (16.16)
            ae = b"\x00" * 6 + struct.pack(">H", 1)
            ae += b"\x00" * 8
            ae += struct.pack(">HHHH", chans, 16, 0, 0)
            ae += struct.pack(">I", rate << 16)
            kids.append(_trak(tid, b"soun", _sample_entry(fourcc, ae), 0, 0))
            tid += 1

        if fragments:
            # mvex: signals the fragmented shape. mehd carries the total
            # duration in MOVIE timescale; one trex per track carries the
            # per-sample defaults a duration-less trun falls back to.
            total = fragments * samples_per_frag * sample_duration
            mvex = b""
            if write_mehd:
                mvex += _box(b"mehd", _full(0) + struct.pack(">I", total))
            for t in range(1, tid):
                mvex += _box(
                    b"trex",
                    _full(0) + struct.pack(">IIIII", t, 1, sample_duration, 0, 0),
                )
            kids.append(_box(b"mvex", mvex))
        moov = _box(b"moov", b"".join(kids))
        if not fragments:
            return ftyp + moov + _box(b"mdat", payload, largesize=mdat_largesize)
        out = [ftyp, moov]
        chunk = max(1, len(payload) // fragments)
        for fi in range(fragments):
            mfhd = _box(b"mfhd", _full(0) + struct.pack(">I", fi + 1))
            # tfhd: default-base-is-moof (0x020000), no local defaults —
            # the trex fallback path stays live when trun omits durations
            tfhd = _box(b"tfhd", _full(0, 0x020000) + struct.pack(">I", 1))
            if trun_durations:
                trun_body = _full(0, 0x000100) + struct.pack(">I", samples_per_frag)
                trun_body += b"".join(
                    struct.pack(">I", sample_duration)
                    for _ in range(samples_per_frag)
                )
            else:
                trun_body = _full(0, 0) + struct.pack(">I", samples_per_frag)
            moof = _box(
                b"moof", mfhd + _box(b"traf", tfhd + _box(b"trun", trun_body))
            )
            piece = payload[fi * chunk :] if fi == fragments - 1 else (
                payload[fi * chunk : (fi + 1) * chunk]
            )
            out.append(moof)
            out.append(_box(b"mdat", piece, largesize=mdat_largesize))
        return b"".join(out)

    return encode


def mp4_box_profile_fn():
    """Factory for the MP4/ISO-BMFF box-walk profiler.

    Returns ``profile(b) -> dict | None`` with ``major_brand``,
    ``timescale`` / ``duration_ms`` (movie header; integer FLOOR
    milliseconds — engine-exact, same tie rationale as the audio
    profiler), ``n_tracks``, first-track-per-kind summaries
    ``video_codec`` / ``video_width`` / ``video_height`` and
    ``audio_codec`` / ``audio_channels`` / ``audio_sample_rate``, and
    ``mdat_bytes`` (payload size, summed over mdat boxes, read from
    the size field — the payload itself is never touched). ``None``
    for anything that is not ISO-BMFF or whose box structure is
    malformed — a corrupt blob must never raise mid-batch."""

    def walk(b, start, end):
        """(fourcc, body_start, box_end) list for [start, end), or
        None when the box structure is malformed."""
        out = []
        i = start
        while i < end:
            if i + 8 > end:
                return None
            size = int.from_bytes(b[i : i + 4], "big")
            typ = b[i + 4 : i + 8]
            hdr = 8
            if size == 1:
                if i + 16 > end:
                    return None
                size = int.from_bytes(b[i + 8 : i + 16], "big")
                hdr = 16
            elif size == 0:
                size = end - i
            if size < hdr or i + size > end:
                return None
            out.append((typ, i + hdr, i + size))
            i += size
        return out

    def _trak_summary(b, s, e, out, media_ts):
        """Fill the first video/audio summaries from one trak; False on
        malformed structure, True otherwise (tracks without media or
        with foreign handlers still count, no summary). Also records the
        track's MEDIA timescale (mdhd) into ``media_ts`` keyed by the
        tkhd track id — fragment sample durations (trun/trex) count in
        that clock, not the movie's."""
        kids = walk(b, s, e)
        if kids is None:
            return False
        t_id = None
        for kt, ks, ke in kids:
            if kt == b"tkhd" and ke - ks >= 24:
                v = b[ks]
                t_id = int.from_bytes(
                    b[ks + 12 : ks + 16] if v == 0 else b[ks + 20 : ks + 24],
                    "big",
                )
        mdia = next(((ks, ke) for kt, ks, ke in kids if kt == b"mdia"), None)
        if mdia is None:
            return True
        mkids = walk(b, *mdia)
        if mkids is None:
            return False
        handler = None
        stsd = None
        for kt, ks, ke in mkids:
            if kt == b"mdhd" and ke - ks >= 24 and t_id is not None:
                v = b[ks]
                mts = int.from_bytes(
                    b[ks + 12 : ks + 16] if v == 0 else b[ks + 20 : ks + 24],
                    "big",
                )
                if mts:
                    media_ts[t_id] = mts
            elif kt == b"hdlr" and ke - ks >= 12:
                handler = b[ks + 8 : ks + 12]
            elif kt == b"minf":
                for lt, ls, le in (walk(b, ks, ke) or ()):
                    if lt == b"stbl":
                        for st, ss, se in (walk(b, ls, le) or ()):
                            if st == b"stsd":
                                stsd = (ss, se)
        if handler is None or stsd is None:
            return True
        ss, se = stsd
        # FullBox(4) + entry_count(4), then the first sample entry
        # (box-shaped: u32 size + format fourcc + fields)
        es = ss + 8
        if es + 8 > se:
            return False
        fourcc = b[es + 4 : es + 8].decode("ascii", "replace")
        body = es + 8
        if handler == b"vide" and out["video_codec"] is None:
            # VisualSampleEntry: width/height u16 at body offsets 24/26
            if body + 28 > se:
                return False
            out["video_codec"] = fourcc
            out["video_width"] = int.from_bytes(b[body + 24 : body + 26], "big")
            out["video_height"] = int.from_bytes(b[body + 26 : body + 28], "big")
        elif handler == b"soun" and out["audio_codec"] is None:
            # AudioSampleEntry: channelcount u16 at 16, samplerate
            # 16.16 fixed u32 at 24
            if body + 28 > se:
                return False
            out["audio_codec"] = fourcc
            out["audio_channels"] = int.from_bytes(b[body + 16 : body + 18], "big")
            out["audio_sample_rate"] = (
                int.from_bytes(b[body + 24 : body + 28], "big") >> 16
            )
        return True

    def profile(b):
        b = bytes(b)
        # sniff: the first box must be ftyp for a confident MP4 verdict
        if len(b) < 16 or b[4:8] != b"ftyp":
            return None
        top = walk(b, 0, len(b))
        if not top:
            return None
        out = {
            "major_brand": None, "timescale": None, "duration_ms": None,
            "n_tracks": 0, "video_codec": None, "video_width": None,
            "video_height": None, "audio_codec": None,
            "audio_channels": None, "audio_sample_rate": None,
            "mdat_bytes": 0,
            "fragmented": False, "n_fragments": 0, "frag_samples": 0,
        }
        media_ts: dict = {}   # track id -> mdhd media timescale
        trex_dur: dict = {}   # track id -> trex default_sample_duration
        frag_dur: dict = {}   # track id -> summed fragment ticks (media clock)
        mvhd_dur = None
        mehd_dur = None
        for typ, s, e in top:
            if typ == b"ftyp" and e - s >= 4:
                out["major_brand"] = b[s : s + 4].decode("ascii", "replace")
            elif typ == b"mdat":
                out["mdat_bytes"] += e - s
            elif typ == b"moov":
                kids = walk(b, s, e)
                if kids is None:
                    return None
                for kt, ks, ke in kids:
                    if kt == b"mvhd":
                        v = b[ks]
                        if v == 1 and ke - ks >= 32:
                            ts = int.from_bytes(b[ks + 20 : ks + 24], "big")
                            dur = int.from_bytes(b[ks + 24 : ks + 32], "big")
                        elif v == 0 and ke - ks >= 20:
                            ts = int.from_bytes(b[ks + 12 : ks + 16], "big")
                            dur = int.from_bytes(b[ks + 16 : ks + 20], "big")
                        else:
                            return None
                        # timescale 0 is malformed (division-by-zero
                        # clock): profile-as-None like every other
                        # corruption, never substitute a fake clock
                        if ts == 0:
                            return None
                        out["timescale"] = ts
                        mvhd_dur = dur
                        out["duration_ms"] = dur * 1000 // ts
                    elif kt == b"trak":
                        out["n_tracks"] += 1
                        if not _trak_summary(b, ks, ke, out, media_ts):
                            return None
                    elif kt == b"mvex":
                        # the fragmented-movie signal (ISO 14496-12
                        # §8.8.1): duration lives in mehd or in the
                        # moof/trun chain, not mvhd
                        out["fragmented"] = True
                        for xt, xs, xe in walk(b, ks, ke) or ():
                            if xt == b"mehd":
                                v = b[xs]
                                if v == 1 and xe - xs >= 12:
                                    mehd_dur = int.from_bytes(
                                        b[xs + 4 : xs + 12], "big"
                                    )
                                elif v == 0 and xe - xs >= 8:
                                    mehd_dur = int.from_bytes(
                                        b[xs + 4 : xs + 8], "big"
                                    )
                                else:
                                    return None
                            elif xt == b"trex":
                                if xe - xs < 24:
                                    return None
                                t_id = int.from_bytes(b[xs + 4 : xs + 8], "big")
                                trex_dur[t_id] = int.from_bytes(
                                    b[xs + 12 : xs + 16], "big"
                                )
            elif typ == b"moof":
                out["n_fragments"] += 1
                kids = walk(b, s, e)
                if kids is None:
                    return None
                for kt, ks, ke in kids:
                    if kt != b"traf":
                        continue
                    tkids = walk(b, ks, ke)
                    if tkids is None:
                        return None
                    t_id = None
                    tf_default = None
                    for tt, ts_, te in tkids:
                        if tt == b"tfhd":
                            if te - ts_ < 8:
                                return None
                            fl = int.from_bytes(b[ts_ + 1 : ts_ + 4], "big")
                            t_id = int.from_bytes(b[ts_ + 4 : ts_ + 8], "big")
                            off = ts_ + 8
                            if fl & 0x000001:  # base-data-offset (u64)
                                off += 8
                            if fl & 0x000002:  # sample-description-index
                                off += 4
                            if fl & 0x000008:  # default-sample-duration
                                if off + 4 > te:
                                    return None
                                tf_default = int.from_bytes(
                                    b[off : off + 4], "big"
                                )
                        elif tt == b"trun":
                            if te - ts_ < 8:
                                return None
                            fl = int.from_bytes(b[ts_ + 1 : ts_ + 4], "big")
                            cnt = int.from_bytes(b[ts_ + 4 : ts_ + 8], "big")
                            out["frag_samples"] += cnt
                            off = ts_ + 8
                            if fl & 0x000001:  # data-offset
                                off += 4
                            if fl & 0x000004:  # first-sample-flags
                                off += 4
                            stride = 4 * (
                                bool(fl & 0x100) + bool(fl & 0x200)
                                + bool(fl & 0x400) + bool(fl & 0x800)
                            )
                            if fl & 0x000100:  # per-sample durations
                                if off + cnt * stride > te:
                                    return None
                                tot = 0
                                for i2 in range(cnt):
                                    p = off + i2 * stride
                                    tot += int.from_bytes(b[p : p + 4], "big")
                            else:
                                d = (
                                    tf_default
                                    if tf_default is not None
                                    else trex_dur.get(t_id)
                                )
                                if d is None:
                                    return None
                                tot = cnt * d
                            if t_id is not None:
                                frag_dur[t_id] = frag_dur.get(t_id, 0) + tot
        if out["major_brand"] is None or out["timescale"] is None:
            return None
        # fragmented duration resolution (round-10 verdict #4): a
        # fragmented movie's mvhd duration is typically 0 — prefer the
        # declared mehd total, else sum the fragments' sample durations
        # (per-track, each in its own MEDIA timescale per spec; report
        # the longest track, the movie-duration convention)
        if out["fragmented"] and not mvhd_dur:
            if mehd_dur is not None:
                out["duration_ms"] = mehd_dur * 1000 // out["timescale"]
            elif frag_dur:
                out["duration_ms"] = max(
                    ticks * 1000 // media_ts.get(t, out["timescale"])
                    for t, ticks in frag_dur.items()
                )
        return out

    return profile


def mp4_encode(payload: bytes, **kw) -> bytes:
    """Driver-side convenience wrapper of :func:`mp4_encode_fn`."""
    return mp4_encode_fn()(payload, **kw)


def mp4_box_profile(b: bytes):
    """Driver-side convenience wrapper of :func:`mp4_box_profile_fn`."""
    return mp4_box_profile_fn()(b)
