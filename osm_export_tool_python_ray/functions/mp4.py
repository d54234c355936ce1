"""Pure-Python ISO BMFF (MP4) container parser.

Codec DECODE (H.264/H.265 bitstreams) genuinely needs an external
library and stays a declared slot — but the CONTAINER is plain
structured boxes, so frame counts, sample byte ranges, timescales and
codec fourccs are all readable with stdlib struct. That turns the video
frame-sampling stage (stages/media.py FrameSampleStage) from a
fake-frame-count stub into a real sampling plan over the actual sample
table: (frame_idx, byte_offset, byte_size) rows an external decoder
could seek to directly.

Box grammar (ISO/IEC 14496-12): [size u32][type 4cc][payload]; size==1
→ u64 largesize follows; size==0 → to end of enclosing box. Containers
walked: moov → trak → mdia → minf → stbl; leaves read: mvhd (timescale,
duration), mdhd, hdlr (track kind), stsd (codec fourcc), stsz (sample
sizes), stco/co64 (chunk offsets), stsc (sample→chunk runs).
"""

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _iter_boxes(buf, start, end):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, pos)
        btype = bytes(buf[pos + 4 : pos + 8])
        body = pos + 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", buf, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("malformed MP4 box %r at %d" % (btype, pos))
        yield btype, body, pos + size
        pos += size


def sniff_mp4(buf):
    """True when the payload opens with an ftyp box."""
    return len(buf) >= 8 and bytes(buf[4:8]) == b"ftyp"


def parse_mp4(buf):
    """MP4 bytes → {'duration_s', 'timescale', 'tracks': [{'kind',
    'codec', 'n_samples', 'sample_sizes', 'sample_offsets',
    'timescale', 'duration_s'}]}. Raises ValueError on non-MP4 or
    malformed boxes."""
    buf = bytes(buf)
    if not sniff_mp4(buf):
        raise ValueError("not an MP4 payload (no ftyp)")
    out = {"timescale": None, "duration_s": None, "tracks": []}

    def walk(start, end, depth=0):
        for btype, body, bend in _iter_boxes(buf, start, end):
            if btype in _CONTAINERS:
                walk(body, bend, depth + 1)
            elif btype == b"mvhd":
                ver = buf[body]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", buf, body + 20)
                else:
                    ts, dur = struct.unpack_from(">II", buf, body + 12)
                out["timescale"] = ts
                out["duration_s"] = dur / ts if ts else 0.0
            elif btype == b"trak":
                pass  # container, handled above
        return

    # two-pass: first mvhd, then tracks (so track walk can't race mvhd)
    walk(0, len(buf))

    for btype, body, bend in _iter_boxes(buf, 0, len(buf)):
        if btype != b"moov":
            continue
        for t2, b2, e2 in _iter_boxes(buf, body, bend):
            if t2 != b"trak":
                continue
            out["tracks"].append(_parse_trak(buf, b2, e2))
    return out


def _parse_trak(buf, start, end):
    tr = {
        "kind": "unknown",
        "codec": "",
        "n_samples": 0,
        "sample_sizes": [],
        "sample_offsets": [],
        "timescale": None,
        "duration_s": None,
    }
    stsc_runs = []
    chunk_offsets = []

    def walk(s, e):
        for btype, body, bend in _iter_boxes(buf, s, e):
            if btype in _CONTAINERS:
                walk(body, bend)
            elif btype == b"mdhd":
                ver = buf[body]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", buf, body + 20)
                else:
                    ts, dur = struct.unpack_from(">II", buf, body + 12)
                tr["timescale"] = ts
                tr["duration_s"] = dur / ts if ts else 0.0
            elif btype == b"hdlr":
                handler = bytes(buf[body + 8 : body + 12])
                tr["kind"] = {b"vide": "video", b"soun": "audio"}.get(
                    handler, handler.decode("latin1")
                )
            elif btype == b"stsd":
                (cnt,) = struct.unpack_from(">I", buf, body + 4)
                if cnt:
                    tr["codec"] = bytes(buf[body + 12 : body + 16]).decode(
                        "latin1"
                    )
            elif btype == b"stsz":
                sz, cnt = struct.unpack_from(">II", buf, body + 4)
                tr["n_samples"] = cnt
                if sz:
                    tr["sample_sizes"] = [sz] * cnt
                else:
                    tr["sample_sizes"] = list(
                        struct.unpack_from(">%dI" % cnt, buf, body + 12)
                    )
            elif btype == b"stco":
                (cnt,) = struct.unpack_from(">I", buf, body + 4)
                chunk_offsets.extend(
                    struct.unpack_from(">%dI" % cnt, buf, body + 8)
                )
            elif btype == b"co64":
                (cnt,) = struct.unpack_from(">I", buf, body + 4)
                chunk_offsets.extend(
                    struct.unpack_from(">%dQ" % cnt, buf, body + 8)
                )
            elif btype == b"stsc":
                (cnt,) = struct.unpack_from(">I", buf, body + 4)
                for i in range(cnt):
                    first, spc, _desc = struct.unpack_from(
                        ">III", buf, body + 8 + 12 * i
                    )
                    stsc_runs.append((first, spc))

    walk(start, end)

    # resolve per-sample byte offsets from stsc runs + chunk offsets
    if tr["sample_sizes"] and chunk_offsets and stsc_runs:
        offs = []
        nchunks = len(chunk_offsets)
        si = 0
        for ri, (first, spc) in enumerate(stsc_runs):
            last = (
                stsc_runs[ri + 1][0] - 1 if ri + 1 < len(stsc_runs) else nchunks
            )
            for ci in range(first - 1, last):
                base = chunk_offsets[ci]
                for _ in range(spc):
                    if si >= len(tr["sample_sizes"]):
                        break
                    offs.append(base)
                    base += tr["sample_sizes"][si]
                    si += 1
        tr["sample_offsets"] = offs
    return tr


def build_mp4(video_sample_sizes, timescale=30, codec=b"avc1"):
    """Minimal valid single-video-track MP4 (fixture builder): ftyp +
    moov (mvhd/trak/mdia/minf/stbl with stsd/stsz/stsc/stco) + one mdat
    holding zero bytes per sample. Deterministic."""

    def box(btype, payload):
        return struct.pack(">I", len(payload) + 8) + btype + payload

    n = len(video_sample_sizes)
    total = sum(video_sample_sizes)
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    stsd = box(
        b"stsd",
        struct.pack(">II", 0, 1) + box(codec, b"\x00" * 78),
    )
    stsz = box(
        b"stsz",
        struct.pack(">III", 0, 0, n)
        + struct.pack(">%dI" % n, *video_sample_sizes),
    )
    stsc = box(b"stsc", struct.pack(">II", 0, 1) + struct.pack(">III", 1, n, 1))
    # mdat follows moov; compute its payload offset after sizing moov
    stts = box(b"stts", struct.pack(">II", 0, 1) + struct.pack(">II", n, 1))

    def moov_with(stco_off):
        stco = box(b"stco", struct.pack(">II", 0, 1) + struct.pack(">I", stco_off))
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = box(b"minf", stbl)
        mdhd = box(
            b"mdhd", struct.pack(">BxxxIIIIHH", 0, 0, 0, timescale, n, 0, 0)
        )
        hdlr = box(b"hdlr", struct.pack(">II", 0, 0) + b"vide" + b"\x00" * 13)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        tkhd = box(b"tkhd", b"\x00" * 84)
        trak = box(b"trak", tkhd + mdia)
        mvhd = box(
            b"mvhd",
            struct.pack(">BxxxIIII", 0, 0, 0, timescale, n) + b"\x00" * 80,
        )
        return box(b"moov", mvhd + trak)

    moov_len = len(moov_with(0))
    mdat_off = len(ftyp) + moov_len + 8
    moov = moov_with(mdat_off)
    mdat = box(b"mdat", b"\x00" * total)
    return ftyp + moov + mdat
