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
