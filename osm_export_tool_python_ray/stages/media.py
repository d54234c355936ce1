"""Multimodal (image/audio/video) column plumbing — actor-pool stages.

Media are opaque ``binary`` payload columns with typed metadata, exactly
the posture the engine needs at 100 TB: the Ray-side plumbing (schemas,
actor-pool signatures, small batch sizes for wide binary rows, output
layout) is real and tested.

Codec status: PPM/PGM images and 16-bit PCM WAV audio decode FOR REAL
(pure numpy, functions/codecs.py) — header parse, pixel/sample extraction,
box resize. Payloads in other containers (JPEG/PNG/MP3/MP4) still hit the
fake-header stub, because no image/audio library exists in this container;
``DecodeStage(strict=True)`` raises NotImplementedError at that exact slot
instead.
"""

import hashlib

import numpy as np
import pyarrow as pa

from osm_export_tool_python_ray.functions import codecs

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_type", pa.string()),  # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
    ]
)


def make_fake_media_table(refs, media_type="image"):
    """Deterministic synthetic payloads: 16-byte md5 header + size bytes.
    Header encodes fake (width, height) / (sample_rate, n_samples)."""
    payloads = []
    for r in refs:
        h = hashlib.md5(r.encode()).digest()
        body = (h * 8)[: 64 + (h[0] % 64)]
        payloads.append(h + body)
    return pa.table(
        {
            "media_ref": pa.array(list(refs), type=pa.string()),
            "media_type": pa.array([media_type] * len(refs), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


def make_real_media_table(refs, media_type="image"):
    """Deterministic REAL payloads: PPM images (gradient + ref-seeded noise)
    or WAV tones — decodable by the real codec path, no stub involved."""
    payloads = []
    for r in refs:
        seed = int.from_bytes(hashlib.md5(r.encode()).digest()[:4], "little")
        rng = np.random.RandomState(seed)
        if media_type == "image":
            h, w = 16 + seed % 17, 16 + (seed >> 8) % 23
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [
                    (xx * 255 // max(w - 1, 1)).astype(np.uint8),
                    (yy * 255 // max(h - 1, 1)).astype(np.uint8),
                    rng.randint(0, 256, (h, w)).astype(np.uint8),
                ],
                axis=2,
            )
            payloads.append(codecs.encode_ppm(img))
        else:
            nsec = 0.01 + (seed % 5) * 0.01
            tt = np.arange(int(16000 * nsec))
            tone = (np.sin(2 * np.pi * (200 + seed % 800) * tt / 16000.0) * 20000).astype(np.int16)
            payloads.append(codecs.encode_wav(tone, 16000))
    return pa.table(
        {
            "media_ref": pa.array(list(refs), type=pa.string()),
            "media_type": pa.array([media_type] * len(refs), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


class DecodeStage:
    """Actor-pool decode: ``map_batches(DecodeStage, concurrency=N,
    batch_size=small, num_cpus=1)``. Codec dispatch by payload magic:
    PPM/PGM, PNG, baseline JPEG (pure-numpy codecs) and WAV decode for
    real (functions/codecs.py, functions/jpeg.py); remaining opaque
    payloads (MP4/progressive-JPEG) fall back to the fake-header stub
    (or raise under strict=True)."""

    def __init__(self, strict=False):
        self.strict = strict
        self.codec = codecs  # bound once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        n = len(payloads)
        w = np.zeros(n, dtype=np.int32)
        h = np.zeros(n, dtype=np.int32)
        rate = np.zeros(n, dtype=np.int32)
        nsamp = np.zeros(n, dtype=np.int64)
        nb = np.empty(n, dtype=np.int64)
        fmt = []
        for i, p in enumerate(payloads):
            nb[i] = len(p)
            kind = self.codec.sniff_media(p)
            if kind == "ppm":
                img = self.codec.decode_ppm(p)
                h[i], w[i] = img.shape[:2]
                fmt.append("ppm")
            elif kind == "png":
                img = self.codec.decode_png(p)
                h[i], w[i] = img.shape[:2]
                fmt.append("png")
            elif kind == "jpeg":
                img = self.codec.decode_jpeg(p)
                h[i], w[i] = img.shape[:2]
                fmt.append("jpeg")
            elif kind == "wav":
                r, _ch, samples = self.codec.decode_wav(p)
                rate[i] = r
                nsamp[i] = len(samples)
                fmt.append("wav")
            elif self.strict:
                raise NotImplementedError(
                    "payload container not decodable without an external codec"
                )
            else:
                # fake-header stub for opaque containers
                w[i] = 16 + (p[0] % 64) * 16
                h[i] = 16 + (p[1] % 64) * 16
                fmt.append("opaque")
        return pa.table(
            {
                "media_ref": t.column("media_ref"),
                "media_type": t.column("media_type"),
                "format": pa.array(fmt, type=pa.string()),
                "width": pa.array(w),
                "height": pa.array(h),
                "sample_rate": pa.array(rate),
                "n_samples": pa.array(nsamp),
                "n_bytes": pa.array(nb),
                "payload": t.column("payload"),
            }
        )


class FeatureExtractStage:
    """Actor-pool feature extraction stub: per-payload deterministic
    pseudo-embedding (md5-seeded), the slot where batched model inference
    would run (model loaded once per actor in ``__init__``)."""

    def __init__(self, dim=16):
        self.dim = dim
        self.model = None  # real impl: load model weights here, once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        out = np.empty((len(payloads), self.dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            kind = codecs.sniff_media(p)
            if kind == "ppm":
                # real image features: 8-bin luminance histogram + moments
                img = codecs.decode_ppm(p).astype(np.float32)
                lum = img.mean(axis=2) if img.ndim == 3 else img
                hist, _ = np.histogram(lum, bins=8, range=(0, 256))
                feats = np.concatenate(
                    [
                        hist / max(lum.size, 1),
                        [lum.mean() / 255.0, lum.std() / 255.0,
                         img.shape[0] / 4096.0, img.shape[1] / 4096.0],
                    ]
                )
                v = np.zeros(self.dim, dtype=np.float32)
                v[: min(self.dim, len(feats))] = feats[: self.dim]
                out[i] = v
            elif kind == "wav":
                # real audio features: RMS + zero-crossing + 6-bucket energy
                _r, _ch, s = codecs.decode_wav(p)
                x = s.astype(np.float32) / 32768.0
                zc = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
                parts = np.array_split(x, 6) if len(x) >= 6 else [x] * 6
                energy = [float(np.sqrt(np.mean(q * q))) if len(q) else 0.0 for q in parts]
                feats = np.array(
                    [float(np.sqrt(np.mean(x * x))) if len(x) else 0.0, zc] + energy,
                    dtype=np.float32,
                )
                v = np.zeros(self.dim, dtype=np.float32)
                v[: min(self.dim, len(feats))] = feats[: self.dim]
                out[i] = v
            else:
                # opaque container: deterministic pseudo-embedding (model slot)
                seed = int.from_bytes(hashlib.md5(p).digest()[:4], "little")
                out[i] = np.random.RandomState(seed).randn(self.dim).astype(np.float32)
        offsets = pa.array(np.arange(0, (len(payloads) + 1) * self.dim, self.dim, dtype=np.int32))
        emb = pa.ListArray.from_arrays(offsets, pa.array(out.reshape(-1)))
        return pa.table(
            {"media_ref": t.column("media_ref"), "embedding": emb}
        )


class ResizeStage:
    """Real thumbnail stage for PPM payloads: decode → box resize →
    re-encode. Opaque payloads pass through untouched (resized=False), or
    raise under strict=True (the external-codec slot)."""

    def __init__(self, target=64, strict=False):
        self.target = target
        self.strict = strict

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        out = []
        resized = []
        for p in payloads:
            kind = codecs.sniff_media(p)
            if kind in ("ppm", "png", "jpeg"):
                dec = {
                    "ppm": codecs.decode_ppm,
                    "png": codecs.decode_png,
                    "jpeg": codecs.decode_jpeg,
                }[kind]
                enc = {
                    "ppm": codecs.encode_ppm,
                    "png": codecs.encode_png,
                    "jpeg": codecs.encode_jpeg,
                }[kind]
                img = dec(p)
                th = min(self.target, img.shape[0])
                tw = min(self.target, img.shape[1])
                out.append(enc(codecs.resize_box(img, tw, th)))
                resized.append(True)
            elif self.strict:
                raise NotImplementedError("resize of this container needs an external codec")
            else:
                out.append(p)
                resized.append(False)
        return pa.table(
            {
                "media_ref": t.column("media_ref"),
                "payload": pa.array(out, type=pa.binary()),
                "resized": pa.array(resized),
            }
        )


class FrameSampleStage:
    """Video frame-sampling plan: (media_ref, frame_idx, byte_offset,
    byte_size) rows. For real MP4 payloads the plan comes from the ACTUAL
    sample table (functions/mp4.py ISO BMFF parser: stsz/stsc/stco →
    per-frame byte ranges an external H.264 decoder could seek to);
    opaque payloads keep the deterministic fake-frame-count stub with
    byte_offset/byte_size = -1. Frame pixel DECODE stays the declared
    external-codec slot."""

    def __init__(self, every_n=30):
        self.every_n = every_n

    def __call__(self, t: pa.Table) -> pa.Table:
        from osm_export_tool_python_ray.functions import mp4 as mp4mod

        refs = t.column("media_ref").to_pylist()
        payloads = t.column("payload").to_pylist()
        out_ref, out_idx, out_off, out_sz = [], [], [], []
        for r, p in zip(refs, payloads):
            if mp4mod.sniff_mp4(p):
                info = mp4mod.parse_mp4(p)
                vid = next(
                    (tr for tr in info["tracks"] if tr["kind"] == "video"),
                    None,
                )
                if vid is not None and vid["n_samples"]:
                    idxs = list(range(0, vid["n_samples"], self.every_n)) or [0]
                    offs = vid["sample_offsets"]
                    szs = vid["sample_sizes"]
                    for i in idxs:
                        out_ref.append(r)
                        out_idx.append(i)
                        out_off.append(offs[i] if i < len(offs) else -1)
                        out_sz.append(szs[i] if i < len(szs) else -1)
                    continue
            frames = max(1, len(p) // 4)  # fake frame count (opaque stub)
            idxs = list(range(0, frames, self.every_n)) or [0]
            out_ref.extend([r] * len(idxs))
            out_idx.extend(idxs)
            out_off.extend([-1] * len(idxs))
            out_sz.extend([-1] * len(idxs))
        return pa.table(
            {
                "media_ref": pa.array(out_ref, type=pa.string()),
                "frame_idx": pa.array(np.array(out_idx, dtype=np.int32)),
                "byte_offset": pa.array(np.array(out_off, dtype=np.int64)),
                "byte_size": pa.array(np.array(out_sz, dtype=np.int64)),
            }
        )


def media_pipeline(media_ds, concurrency=2, batch_size=256):
    """Decode → feature-extract as an actor-pool chain (small batches for
    wide binary rows; concurrency×num_cpus sized to leave CPUs for
    scan/sink stages)."""
    decoded = media_ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"strict": False},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return decoded.map_batches(
        FeatureExtractStage,
        fn_constructor_kwargs={"dim": 16},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def make_patterned_media_table(doc_ids, families=97):
    """Near-dup PPM family payloads for the perceptual-hash operator:
    doc d renders its FAMILY's deterministic grayscale pattern
    pix(i, j) = c + (d % 32) + i + 2·j + amp·[i % P < P//2]
    (uint8-safe: ≤ 230) — a ramp plus horizontal stripes whose block
    sums stay CLOSED-FORM (stripe count over [i0,i1) is
    f(i1) − f(i0) with f(x) = (x//P)·(P//2) + min(x%P, P//2), so the
    SQL oracle re-derives every bit without enumerating pixels). The
    family is d % families, seed = LE32(md5('img:<fam>')), c = seed %
    64, h = 16 + seed % 17, w = 16 + (seed >> 8) % 23, amp = 16 +
    (seed >> 16) % 16, P = 4 + (seed >> 12) % 5. Same family ⇒ same
    pattern up to a per-doc BRIGHTNESS SHIFT (c + d%32) — exactly the
    transform an average-hash must be invariant to."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    payloads = []
    refs = []
    for d in ids.tolist():
        fam = d % families
        ref = "img:%d" % fam
        seed = int.from_bytes(hashlib.md5(ref.encode()).digest()[:4], "little")
        h, w = 16 + seed % 17, 16 + (seed >> 8) % 23
        c = seed % 64
        amp = 16 + (seed >> 16) % 16
        p = 4 + (seed >> 12) % 5
        yy, xx = np.mgrid[0:h, 0:w]
        img = (
            c + d % 32 + yy + 2 * xx + amp * ((yy % p) < p // 2)
        ).astype(np.uint8)
        payloads.append(codecs.encode_ppm(img))
        refs.append(ref)
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "media_ref": pa.array(refs, type=pa.string()),
            "media_type": pa.array(["image"] * len(ids), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


def ahash64(img):
    """64-bit average hash with EXACT integer comparisons: 8×8 block
    sums via two reduceats, bit(bi,bj) = blocksum·N > totalsum·blockcnt
    (cross-multiplied — no float means, so constant brightness shifts
    cancel exactly). Returns a Python int in [0, 2^64)."""
    a = img.astype(np.int64)
    h, w = a.shape[:2]
    if a.ndim == 3:
        a = a.sum(axis=2)
    ib = (np.arange(8) * h) // 8
    jb = (np.arange(8) * w) // 8
    blocks = np.add.reduceat(np.add.reduceat(a, ib, axis=0), jb, axis=1)
    cnt = np.diff(np.append(ib, h)).reshape(-1, 1) * np.diff(np.append(jb, w))
    total = int(a.sum())
    bits = blocks * (h * w) > total * cnt
    k = (np.arange(8).reshape(-1, 1) * 8 + np.arange(8)).astype(np.uint64)
    return int((bits.astype(np.uint64) << k).sum(dtype=np.uint64))


class PerceptualHashStage:
    """Actor-pool stage: strict PPM decode → 64-bit average hash per
    payload, emitted as a SIGNED int64 (two's-complement view) so the
    downstream groupby and the SQL oracle share one integer domain."""

    def __init__(self):
        self.codec = codecs

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = np.empty(len(t), dtype=np.uint64)
        for i, p in enumerate(t.column("payload").to_pylist()):
            sigs[i] = ahash64(self.codec.decode_ppm(p))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "sig": pa.array(sigs.view(np.int64)),
            }
        )


def media_near_dup(docs_ds, families=97, concurrency=2, batch_size=256):
    """Perceptual near-dup clusters over rendered media: payload build →
    actor-pool decode+hash → per-batch partials → ONE groupby over
    (signature) aggregate rows: (sig, n_docs, min_doc, id_sum)."""
    from ray.data.aggregate import Min, Sum

    def build(t: pa.Table) -> pa.Table:
        return make_patterned_media_table(
            t.column("doc_id").to_numpy(zero_copy_only=False), families
        )

    def partial(t: pa.Table) -> pa.Table:
        sig = t.column("sig").to_numpy(zero_copy_only=False)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        uq, inv, cnt = np.unique(sig, return_inverse=True, return_counts=True)
        sums = np.zeros(len(uq), dtype=np.int64)
        np.add.at(sums, inv, d)
        mins = np.full(len(uq), np.iinfo(np.int64).max)
        np.minimum.at(mins, inv, d)
        return pa.table(
            {
                "sig": pa.array(uq),
                "n_partial": pa.array(cnt.astype(np.int64)),
                "min_partial": pa.array(mins),
                "sum_partial": pa.array(sums),
            }
        )

    hashed = docs_ds.map_batches(build, batch_format="pyarrow").map_batches(
        PerceptualHashStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return (
        hashed.map_batches(partial, batch_format="pyarrow")
        .groupby("sig")
        .aggregate(
            Sum("n_partial", alias_name="n_docs"),
            Min("min_partial", alias_name="min_doc"),
            Sum("sum_partial", alias_name="id_sum"),
        )
    )
