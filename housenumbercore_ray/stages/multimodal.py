"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are STUBS behind ``try: import`` — clearly marked — while the
Ray-side plumbing (schema, batch sizing for large payloads, actor-pool
signature, output layout) is real and tested against the ``html: binary``
column of the pages table.

Batch sizing rule for binary payloads: batch_size × avg_payload ×
concurrency must fit the worker heap — callers pass small ``batch_size``
(e.g. 64-256 for images) and the stage never concatenates payloads.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


class BinaryFeatureExtract:
    """Actor-pool stage over a binary column: emits typed metadata + a
    deterministic feature. With a real decoder installed, ``_decode`` would
    return pixels/samples; the deterministic fallback fingerprints bytes."""

    def __init__(self, col: str = "payload", id_col: str = "url"):
        self.col = col
        self.id_col = id_col
        try:  # real decoder unavailable in this container → stub path
            import PIL.Image  # noqa: F401

            self._has_decoder = True
        except ImportError:
            self._has_decoder = False

    def _decode(self, data: bytes):
        if self._has_decoder:
            raise NotImplementedError("real decode path requires PIL; not in container")
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.col].to_pylist()
        n_bytes, md5s = [], []
        for data in payloads:
            b = data if isinstance(data, bytes) else bytes(data)
            n_bytes.append(len(b))
            md5s.append(hashlib.md5(b).hexdigest())
        return pa.table({
            self.id_col: pa.array(ids),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "content_md5": pa.array(md5s, pa.string()),
        })


class FrameSampleStub:
    """Video frame-sampling stage signature: (payload, every_nth) → rows of
    (id, frame_idx). Deterministic fake: frame count = payload bytes // 4096
    (as if fixed-size frames); real implementation would demux."""

    def __init__(self, every_nth: int = 10, frame_bytes: int = 4096,
                 col: str = "payload", id_col: str = "url"):
        self.every_nth = every_nth
        self.frame_bytes = frame_bytes
        self.col = col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, frames = [], []
        for i, data in zip(batch[self.id_col].to_pylist(), batch[self.col].to_pylist()):
            b = data if isinstance(data, bytes) else bytes(data)
            n_frames = max(1, len(b) // self.frame_bytes)
            for f in range(0, n_frames, self.every_nth):
                ids_out.append(i)
                frames.append(f)
        return pa.table({
            self.id_col: pa.array(ids_out),
            "frame_idx": pa.array(frames, pa.int64()),
        })


def resize_stub(batch: pd.DataFrame) -> pd.DataFrame:
    """Image resize stage signature; raises until a codec exists."""
    raise NotImplementedError("image resize requires PIL/opencv; not in this container")


class ResizePlan:
    """Image-resize plumbing with the pixel work stubbed: the 'decode' is a
    deterministic fake (source dims derived from payload length — a real
    build swaps in PIL), the aspect-preserving integer resize arithmetic and
    the typed Arrow output layout are real and oracle-checked
    (``media_resize_plan``): long side → ``target``, short side →
    floor(short · target / long)."""

    def __init__(self, target: int = 256, col: str = "payload", id_col: str = "url"):
        self.target = target
        self.col = col
        self.id_col = id_col

    def _fake_dims(self, n_bytes: int) -> tuple[int, int]:
        # stands in for decode; replace with PIL.Image.open(...).size
        return 640 + n_bytes % 1024, 360 + n_bytes % 768

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.col].to_pylist()
        src_w, src_h, dst_w, dst_h = [], [], [], []
        t = self.target
        for data in payloads:
            n = len(data if isinstance(data, bytes) else bytes(data))
            w, h = self._fake_dims(n)
            if w >= h:
                dw, dh = t, (h * t) // w
            else:
                dw, dh = (w * t) // h, t
            src_w.append(w)
            src_h.append(h)
            dst_w.append(dw)
            dst_h.append(dh)
        return pa.table({
            self.id_col: pa.array(ids),
            "src_w": pa.array(src_w, pa.int64()),
            "src_h": pa.array(src_h, pa.int64()),
            "dst_w": pa.array(dst_w, pa.int64()),
            "dst_h": pa.array(dst_h, pa.int64()),
        })


class TypeSniff:
    """Payload type detection + byte-entropy — the media-ingest triage
    stage (route to image/video/audio decoders, reject junk). Magic-number
    table checked in FIXED order (mirrored by the SQL oracle's CASE);
    entropy is the Shannon bits/byte of the payload's byte histogram,
    computed with ONE bincount over (row·256 + byte) for the whole batch —
    no per-payload Python on the byte axis."""

    MAGIC = (
        (b"\x1f\x8b", "application/gzip"),
        (b"\x89PNG", "image/png"),
        (b"\xff\xd8\xff", "image/jpeg"),
        (b"%PDF", "application/pdf"),
        (b"GIF8", "image/gif"),
        (b"<", "text/html"),
    )

    def __init__(self, col: str = "payload", id_col: str = "url"):
        self.col = col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = [x if isinstance(x, bytes) else bytes(x)
                    for x in batch[self.col].to_pylist()]
        mimes = []
        for b in payloads:
            for magic, t in self.MAGIC:
                if b.startswith(magic):
                    mimes.append(t)
                    break
            else:
                mimes.append("application/octet-stream")
        n = len(payloads)
        lens = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=n)
        if lens.sum():
            u8 = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.int64)
            rows = np.repeat(np.arange(n, dtype=np.int64), lens)
            cnt = np.bincount(rows * 256 + u8,
                              minlength=n * 256).reshape(n, 256)
        else:
            cnt = np.zeros((n, 256), dtype=np.int64)
        safe = np.maximum(lens, 1)[:, None]
        p = cnt / safe
        logp = np.zeros_like(p)
        np.log2(p, out=logp, where=cnt > 0)
        ent = -np.sum(p * logp, axis=1)
        return pa.table({
            self.id_col: pa.array(ids),
            "mime": pa.array(mimes, pa.string()),
            "n_bytes": pa.array(lens, pa.int64()),
            "entropy_bits": pa.array(ent, pa.float64()),
        })
