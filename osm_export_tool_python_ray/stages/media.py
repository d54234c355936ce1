"""Multimodal (image/audio/video) column plumbing — actor-pool stages.

Media are opaque ``binary`` payload columns with typed metadata, exactly
the posture the engine needs at 100 TB: the Ray-side plumbing (schemas,
actor-pool signatures, small batch sizes for wide binary rows, output
layout) is real and tested; the codec kernels are STUBS because no
image/audio library exists in this container. ``DecodeStage(strict=True)``
raises NotImplementedError at the exact call site a real decoder would
occupy; the default deterministic fake parses a synthetic header so the
pipeline shape can be exercised end-to-end.
"""

import hashlib

import numpy as np
import pyarrow as pa

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


class DecodeStage:
    """Actor-pool decode: ``map_batches(DecodeStage, concurrency=N,
    batch_size=small, num_cpus=1)``. Real codecs load in ``__init__`` once
    per actor; here the stub "codec" parses the fake header.

    strict=True marks where a real decoder belongs (no image/audio libs in
    this container): raises NotImplementedError."""

    def __init__(self, strict=False):
        self.strict = strict
        # real implementation would do e.g.:  import PIL.Image / soundfile
        self.codec = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "media decode requires an image/audio codec not present in this environment"
            )
        payloads = t.column("payload").to_pylist()
        w = np.empty(len(payloads), dtype=np.int32)
        h = np.empty(len(payloads), dtype=np.int32)
        nb = np.empty(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            w[i] = 16 + (p[0] % 64) * 16
            h[i] = 16 + (p[1] % 64) * 16
            nb[i] = len(p)
        return pa.table(
            {
                "media_ref": t.column("media_ref"),
                "media_type": t.column("media_type"),
                "width": pa.array(w),
                "height": pa.array(h),
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
            seed = int.from_bytes(hashlib.md5(p).digest()[:4], "little")
            out[i] = np.random.RandomState(seed).randn(self.dim).astype(np.float32)
        offsets = pa.array(np.arange(0, (len(payloads) + 1) * self.dim, self.dim, dtype=np.int32))
        emb = pa.ListArray.from_arrays(offsets, pa.array(out.reshape(-1)))
        return pa.table(
            {"media_ref": t.column("media_ref"), "embedding": emb}
        )


class ResizeStage:
    """Resize/thumbnail stub (strict: needs codec). Output layout only."""

    def __init__(self, target=64, strict=True):
        self.target = target
        self.strict = strict

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("resize requires an image codec")
        return t


class FrameSampleStage:
    """Video frame-sampling stub: emits (media_ref, frame_idx) plan rows —
    the deterministic sampling schedule is real, frame extraction is not."""

    def __init__(self, every_n=30):
        self.every_n = every_n

    def __call__(self, t: pa.Table) -> pa.Table:
        refs = t.column("media_ref").to_pylist()
        nb = [len(p) for p in t.column("payload").to_pylist()]
        out_ref, out_idx = [], []
        for r, n in zip(refs, nb):
            frames = max(1, n // 4)  # fake frame count from payload size
            idxs = list(range(0, frames, self.every_n)) or [0]
            out_ref.extend([r] * len(idxs))
            out_idx.extend(idxs)
        return pa.table(
            {
                "media_ref": pa.array(out_ref, type=pa.string()),
                "frame_idx": pa.array(np.array(out_idx, dtype=np.int32)),
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
