"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81 / JFIF).

The last declared opaque-codec slot (stages/media.py): no image library
exists in this container, but baseline sequential JPEG needs only
numpy — huffman tables are small Python dicts, the 8×8 IDCT/FDCT is one
matrix sandwich, and quantization/zigzag are array ops. Supported:

* decode: baseline DCT (SOF0), 8-bit, 1 or 3 components, any sampling
  (4:4:4 / 4:2:2 / 4:2:0 via per-component sampling factors), restart
  markers (DRI/RSTn), multi-chunk DQT/DHT segments. Progressive (SOF2),
  arithmetic coding and 12-bit raise ValueError naming the feature.
* encode: baseline, 4:4:4, Annex K quantization tables scaled by a
  quality factor, Annex K huffman tables — deterministic bytes.

JPEG is lossy: round-trip tests assert bounded error on smooth images,
plus an exact decode of hand-crafted streams (tests/test_containers.py).

Scale posture: a codec is per-payload CPU work inside the media actor
pool (stages/media.py) — no distribution concerns beyond batch sizing.
The per-bit Python huffman loop makes this a correctness/fixture codec,
not a throughput path; the docstring on DecodeStage says which.
"""

import struct

import numpy as np

# ------------------------------------------------------------------ tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K quantization tables (luminance, chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K huffman specs: (bits[1..16], values)
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8×8 DCT basis matrix: C[k, n] = s(k) cos((2n+1)kπ/16)
_N = np.arange(8)
_DCT = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16.0)
_DCT[0, :] *= 1.0 / np.sqrt(2.0)
_DCT *= 0.5  # orthonormal: X = C x C^T, x = C^T X C


def _build_decode_table(bits, values):
    """(bits, values) → dict code_str_len: {code_int: value} flattened as
    {(length, code): value} for the bit-at-a-time reader."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return out


def _build_encode_table(bits, values):
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


# ------------------------------------------------------------------ decode

class _BitReader:
    """Entropy-segment bit reader with 0xFF00 destuffing; stops at any
    marker (0xFF xx, xx != 0) and reports it."""

    def __init__(self, buf, pos):
        self.buf = buf
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        if self.marker is not None:
            raise ValueError("read past marker in entropy data")
        b = self.buf[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.buf[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.pos += 1
                b = 0  # spec: treat as if padded; decoders shouldn't need it
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n):
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        return v

    def read_bit(self):
        return self.read(1)

    def align(self):
        self.nbits = 0
        self.bits = 0

    def at_marker(self):
        return self.marker is not None and self.nbits == 0


def _huff_decode(br, table):
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid huffman code in entropy stream")


def _extend(v, t):
    """Sign-extend a t-bit magnitude per T.81 F.2.2.1."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(buf):
    """Baseline JFIF bytes → uint8 ndarray ((h,w) gray or (h,w,3) RGB)."""
    buf = bytes(buf)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt = {}
    huff_dc, huff_ac = {}, {}
    frame = None
    restart_interval = 0
    n = len(buf)
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise ValueError("marker expected at offset %d" % pos)
        m = buf[pos + 1]
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", buf, pos)
        seg = buf[pos + 2 : pos + seglen]
        if m == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 15
                o += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(
                        seg[o : o + 64], dtype=np.uint8
                    ).astype(np.int64)
                    o += 64
                else:
                    qt[tq] = np.frombuffer(
                        seg[o : o + 128], dtype=">u2"
                    ).astype(np.int64)
                    o += 128
        elif m == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 15
                bits = list(seg[o + 1 : o + 17])
                cnt = sum(bits)
                vals = list(seg[o + 17 : o + 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(
                    bits, vals
                )
                o += 17 + cnt
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * ci)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                   0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG coding process (marker 0xFF%02X); "
                "baseline sequential only" % m
            )
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scomp = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                scomp.append({"cs": cs, "td": tt >> 4, "ta": tt & 15})
            pos += seglen
            return _decode_scan(
                buf, pos, frame, scomp, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(buf, pos, frame, scomp, qt, huff_dc, huff_ac, dri):
    if frame is None:
        raise ValueError("SOS before SOF")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    order = []
    for sc in scomp:
        c = by_id[sc["cs"]]
        order.append((c, sc["td"], sc["ta"]))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    cidx = {c["id"]: i for i, c in enumerate(comps)}
    pred = {c["id"]: 0 for c in comps}
    br = _BitReader(buf, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                br.align()
                if br.marker is None:
                    # marker may not yet be consumed — scan forward
                    while buf[br.pos] != 0xFF or buf[br.pos + 1] == 0x00:
                        br.pos += 1
                    br.pos += 2
                else:
                    br.marker = None
                for c in comps:
                    pred[c["id"]] = 0
            for c, td, ta in order:
                q = qt[c["tq"]]
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        blk = _decode_block(
                            br, huff_dc[td], huff_ac[ta], q, pred, c["id"]
                        )
                        py = (my * c["v"] + vy) * 8
                        px = (mx * c["h"] + vx) * 8
                        planes[cidx[c["id"]]][py : py + 8, px : px + 8] = blk
            mcu_count += 1
    # upsample to full resolution, crop, color-convert
    out_planes = []
    for c, plane in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(np.rint(out_planes[0] + 128.0), 0, 255)
        return y.astype(np.uint8)
    y, cb, cr = (p + (128.0 if i == 0 else 0.0) for i, p in enumerate(out_planes))
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.rint(x), 0, 255) for x in (r, g, b)], axis=2
    )
    return rgb.astype(np.uint8)


def _decode_block(br, tdc, tac, q, pred, cid):
    t = _huff_decode(br, tdc)
    diff = _extend(br.read(t), t) if t else 0
    pred[cid] += diff
    coef = np.zeros(64, dtype=np.int64)
    coef[0] = pred[cid]
    k = 1
    while k < 64:
        rs = _huff_decode(br, tac)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[k] = _extend(br.read(s), s)
        k += 1
    dq = (coef * q).astype(np.float64)
    blk = dq[UNZIGZAG].reshape(8, 8)
    return _DCT.T @ blk @ _DCT  # 2-D IDCT (orthonormal basis)


# ------------------------------------------------------------------ encode

def _scale_qt(base, quality):
    quality = max(1, min(100, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code, length):
        self.acc = (self.acc << length) | code
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _mag_bits(v):
    """value → (size, magnitude code) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


def encode_jpeg(arr, quality=85):
    """uint8 (h,w) gray or (h,w,3) RGB → baseline JFIF bytes (4:4:4,
    Annex K tables scaled by ``quality``). Deterministic."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and not (arr.ndim == 3 and arr.shape[2] == 3):
        raise ValueError("expected (h,w) or (h,w,3) uint8 array")
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64) - 128.0]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
    qts = [_scale_qt(QT_LUMA, quality)]
    if not gray:
        qts.append(_scale_qt(QT_CHROMA, quality))

    enc_dc = [_build_encode_table(*HT_DC_LUMA)]
    enc_ac = [_build_encode_table(*HT_AC_LUMA)]
    if not gray:
        enc_dc.append(_build_encode_table(*HT_DC_CHROMA))
        enc_ac.append(_build_encode_table(*HT_AC_CHROMA))

    bw = _BitWriter()
    pred = [0] * len(planes)
    bh = (h + 7) // 8
    bwid = (w + 7) // 8
    padded = []
    for p in planes:
        pp = np.empty((bh * 8, bwid * 8), dtype=np.float64)
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)
    for by in range(bh):
        for bx in range(bwid):
            for ci, p in enumerate(padded):
                ti = 0 if ci == 0 else 1
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                X = _DCT @ blk @ _DCT.T
                q = qts[ti].astype(np.float64)
                # quantize + zigzag together: q[ZIGZAG] matches the
                # zigzag-ordered DQT payload the decoder dequantizes with
                coefs = np.rint(X.reshape(64)[ZIGZAG] / q[ZIGZAG]).astype(
                    np.int64
                )
                _encode_block(
                    bw, coefs, pred, ci, enc_dc[ti], enc_ac[ti]
                )

    bw.flush()

    def seg(marker, payload):
        return b"\xff" + bytes([marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qts):
        out += seg(0xDB, bytes([ti]) + bytes(int(v) for v in q[ZIGZAG]))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    hts = [(0x00, HT_DC_LUMA), (0x10, HT_AC_LUMA)]
    if not gray:
        hts += [(0x01, HT_DC_CHROMA), (0x11, HT_AC_CHROMA)]
    for tid, (bits, vals) in hts:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _encode_block(bw, coefs, pred, ci, tdc, tac):
    diff = int(coefs[0]) - pred[ci]
    pred[ci] = int(coefs[0])
    t, mag = _mag_bits(diff)
    code, ln = tdc[t]
    bw.write(code, ln)
    if t:
        bw.write(mag, t)
    run = 0
    last_nz = 0
    nz = np.nonzero(coefs[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, 64):
        v = int(coefs[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = tac[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        t, mag = _mag_bits(v)
        code, ln = tac[(run << 4) | t]
        bw.write(code, ln)
        bw.write(mag, t)
        run = 0
    if last_nz < 63:
        code, ln = tac[0x00]  # EOB
        bw.write(code, ln)
