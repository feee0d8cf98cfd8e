"""Ogg container tools: a minimal Opus-in-Ogg synthesizer and a
page-walk profiler.

Fifth profiler in the curation-primitive pattern (JPEG quality, audio
header, MP4 box walk, MP3 frame walk): Ogg carries most of the web's
Opus/Vorbis audio, and curation's first pass is a PAGE walk — codec,
channels, rate, duration from the last granule position — never a
packet decode. The profiler reads each 27-byte page header plus its
lacing table and skips the body by the summed lacing values, so cost
is O(pages).

Layouts per the public RFC 3533 (Ogg page: "OggS", version 0, header
type flags BOS/EOS/continued, 64-bit LE granule position, serial,
sequence, CRC, segment count, lacing table) and RFC 7845 (OpusHead
identification header: magic, version, channel count, pre-skip,
32-bit LE input sample rate; granule positions count 48 kHz samples
regardless of input rate). CRC is not verified — a curation filter
wants structure + metadata at header cost; checksumming every page
would read every byte for no curation signal.

Both callables are factory-built nested closures (ship-by-value in
``mapInPandas``; see ``mp4.py``).

Reference parity note: the reference engine has no media tier; this
extends the brief's curation surface beyond the reference's operators.
"""

from __future__ import annotations


def ogg_encode_fn():
    """Factory for the minimal Opus-in-Ogg synthesizer. Returns
    ``encode(n_pages, *, channels, input_rate, samples_per_page,
    serial) -> bytes``: a BOS page carrying OpusHead, ``n_pages``
    audio pages (one 100-byte dummy packet each — profilers never
    decode packets), the last flagged EOS with granule = total
    samples. CRCs are written as zero (legal to synthesize for a
    header-walk fixture; real muxers fill them, real demuxers may
    verify — the profiler deliberately does not)."""
    import struct

    def _page(header_type, granule, serial, seq, segments):
        lacing = b"".join(
            bytes([255] * (len(s) // 255) + [len(s) % 255]) for s in segments
        )
        body = b"".join(segments)
        hdr = (
            b"OggS" + bytes((0, header_type))
            + struct.pack("<qIII", granule, serial, seq, 0)
            + bytes((len(lacing),)) + lacing
        )
        return hdr + body

    def encode(n_pages, *, channels=2, input_rate=48000,
               samples_per_page=960, serial=0x1234, pre_skip=312):
        head = (
            b"OpusHead" + bytes((1, channels))
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", input_rate)
            + struct.pack("<h", 0) + bytes((0,))  # gain, mapping family
        )
        out = [_page(0x02, 0, serial, 0, [head])]  # BOS
        for i in range(n_pages):
            flags = 0x04 if i == n_pages - 1 else 0x00  # EOS on last
            granule = (i + 1) * samples_per_page
            out.append(_page(flags, granule, serial, i + 1, [b"\x00" * 100]))
        return b"".join(out)

    return encode


def ogg_page_profile_fn():
    """Factory for the Ogg page-walk profiler.

    Returns ``profile(b) -> dict | None`` with ``codec`` ('opus',
    'vorbis', 'theora', or 'unknown' for a valid Ogg of another
    codec), ``n_pages``, ``n_streams`` (distinct serials), ``channels``
    / ``input_rate`` (OpusHead fields; None for other codecs),
    ``pre_skip`` (OpusHead bytes 10-11 LE), ``last_granule`` (the
    first stream's final granule position), ``duration_ms`` (Opus
    only: granule counts 48 kHz samples per RFC 7845, and playback
    duration subtracts the pre-skip priming samples —
    ``max(0, granule - pre_skip)``, integer FLOOR, the engine-exact
    tie policy all profilers here share), ``eos_seen``, and
    ``body_bytes`` (summed lacing, bodies skipped). ``None`` for
    anything that is not an Ogg stream or whose page chain is
    malformed/truncated."""
    import struct

    def profile(b):
        b = bytes(b)
        i = 0
        n_pages = 0
        serials = set()
        first_serial = None
        codec = None
        channels = None
        pre_skip = None
        input_rate = None
        last_granule = None
        eos = False
        body_bytes = 0
        while i < len(b):
            if i + 27 > len(b) or b[i : i + 4] != b"OggS" or b[i + 4] != 0:
                return None
            header_type = b[i + 5]
            granule, serial, _seq, _crc = struct.unpack_from("<qIII", b, i + 6)
            nseg = b[i + 26]
            lace_end = i + 27 + nseg
            if lace_end > len(b):
                return None
            body_len = sum(b[i + 27 : lace_end])
            if lace_end + body_len > len(b):
                return None
            body = b[lace_end : lace_end + body_len]
            serials.add(serial)
            if first_serial is None:
                first_serial = serial
            if header_type & 0x02 and serial == first_serial:
                if body[:8] == b"OpusHead" and len(body) >= 16:
                    codec = "opus"
                    channels = body[9]
                    pre_skip = struct.unpack_from("<H", body, 10)[0]
                    input_rate = struct.unpack_from("<I", body, 12)[0]
                elif body[1:7] == b"vorbis":
                    codec = "vorbis"
                elif body[1:7] == b"theora":
                    codec = "theora"
                else:
                    codec = "unknown"
            if serial == first_serial and granule >= 0:
                last_granule = granule
            if header_type & 0x04 and serial == first_serial:
                eos = True
            body_bytes += body_len
            n_pages += 1
            i = lace_end + body_len
        if n_pages == 0 or codec is None:
            return None
        return {
            "codec": codec,
            "n_pages": n_pages,
            "n_streams": len(serials),
            "channels": channels,
            "input_rate": input_rate,
            "pre_skip": pre_skip,
            "last_granule": last_granule,
            # RFC 7845 playback duration: the first pre_skip samples at
            # the 48 kHz granule clock are decoder priming and are
            # discarded, so duration = (granule - pre_skip) / 48k
            # (round-10 ADVICE: the un-subtracted form overstated real
            # corpora by ~pre_skip/48 ms per file).
            "duration_ms": (
                max(0, last_granule - (pre_skip or 0)) * 1000 // 48000
                if codec == "opus" and last_granule is not None
                else None
            ),
            "eos_seen": eos,
            "body_bytes": body_bytes,
        }

    return profile


def ogg_encode(n_pages: int, **kw) -> bytes:
    """Driver-side convenience wrapper of :func:`ogg_encode_fn`."""
    return ogg_encode_fn()(n_pages, **kw)


def ogg_page_profile(b: bytes):
    """Driver-side convenience wrapper of :func:`ogg_page_profile_fn`."""
    return ogg_page_profile_fn()(b)
