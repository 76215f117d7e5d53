"""Multimodal column stages (training-data operator set).

Images / audio / video are opaque ``binary`` columns with typed metadata
(mime, width/height or duration). The Ray-side plumbing — schema, actor
signature, small batches for large payloads, output layout — is real and
tested; the decode kernels themselves are STUBBED because no image/audio
libraries exist in this container:

- ``decode="fake"`` (default in tests): a deterministic fake decoder that
  derives features from the payload bytes (so pipelines are testable
  end-to-end).
- ``decode="real"``: raises NotImplementedError with the dependency note.

At 100 TB these stages want small ``batch_size`` (payload rows are
MB-scale) and an actor pool sized to pin decoder state (codec contexts /
models) per worker.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
    ]
)


class DecodeImageFeatures:
    """binary payload -> (media_id, sha256, n_bytes, width, height,
    mean_luma). Real decode is stubbed (no PIL/cv2 in this image)."""

    def __init__(self, decode: str = "fake", payload_col: str = "payload",
                 id_col: str = "media_id"):
        if decode not in ("fake", "real"):
            raise ValueError(decode)
        self.decode = decode
        self.payload_col = payload_col
        self.id_col = id_col

    def _fake_decode(self, payload: bytes) -> tuple[int, int, float]:
        # deterministic pseudo-metadata from the payload digest
        d = hashlib.sha256(payload).digest()
        w = 64 + d[0] % 192
        h = 64 + d[1] % 192
        luma = d[2] / 255.0
        return w, h, luma

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode == "real":
            raise NotImplementedError(
                "real image decode needs PIL/opencv, not present in this "
                "container; run with decode='fake' or install a decoder"
            )
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.payload_col].to_pylist()
        rows = []
        for i, p in zip(ids, payloads):
            p = p or b""
            w, h, luma = self._fake_decode(p)
            rows.append(
                {
                    self.id_col: i,
                    "sha256": hashlib.sha256(p).hexdigest(),
                    "n_bytes": len(p),
                    "width": w,
                    "height": h,
                    "mean_luma": luma,
                }
            )
        return pa.Table.from_pylist(rows)


def decode_image_features(ds, decode: str = "fake", batch_size: int = 16,
                          concurrency=(1, 4)):
    """Small batches: payload rows are large; batch bytes stay bounded
    (SURVEY.md §4.3 memory-pressure rule)."""
    from .fusion import map_stage

    return map_stage(
        ds, lambda: DecodeImageFeatures(decode=decode),
        batch_size=batch_size,
        concurrency=concurrency if isinstance(concurrency, int) else "tasks",
    )


class SampleFrames:
    """Video frame-sampler plumbing: emits (media_id, frame_index,
    frame_sha) rows for every Nth pseudo-frame. Real codec stubbed."""

    def __init__(self, every_n: int = 10, decode: str = "fake"):
        self.every_n = every_n
        self.decode = decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode == "real":
            raise NotImplementedError("video decode needs ffmpeg/pyav")
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_id, out_idx, out_sha = [], [], []
        for i, p in zip(ids, payloads):
            p = p or b""
            n_frames = max(1, len(p) // 1024)  # fake: 1 frame per KiB
            for f in range(0, n_frames, self.every_n):
                out_id.append(i)
                out_idx.append(f)
                out_sha.append(
                    hashlib.sha256(p[f * 1024 : (f + 1) * 1024]).hexdigest()
                )
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_index": pa.array(out_idx, pa.int64()),
                "frame_sha": pa.array(out_sha, pa.string()),
            }
        )


def sample_frames(ds, every_n: int = 10, batch_size: int = 8, concurrency=(1, 4)):
    from .fusion import map_stage

    return map_stage(
        ds, lambda: SampleFrames(every_n=every_n),
        batch_size=batch_size,
        concurrency=concurrency if isinstance(concurrency, int) else "tasks",
    )
