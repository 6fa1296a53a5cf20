"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample as
actor-pool ``map_batches`` stages.

The image/audio codec libraries are NOT in this container, so the codec
call itself is STUBBED: ``_HAVE_PIL`` gates a real decode, otherwise a
clearly-marked deterministic fake parses the tiny header our synthetic
payloads carry. Everything Ray-side — schema, batch size, actor
signature, fixed-size-list feature output, per-actor model "load" — is
real and tested (FIXTURES/mandate: make the plumbing real, stub the
codec).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown pre-decode
        ("height", pa.int32()),
    ]
)

FEATURE_DIM = 32

_MAGIC = b"SYNM"  # synthetic media header: SYNM + u16 width + u16 height


def synth_media_payload(media_id: int, kind: str) -> bytes:
    """Deterministic fake payload with a parseable header."""
    w = 64 + (media_id * 37) % 512
    h = 48 + (media_id * 53) % 384
    body = hashlib.md5(f"{kind}:{media_id}".encode()).digest() * 8
    return _MAGIC + struct.pack(">HH", w, h) + body


def synth_media_table(n: int) -> pa.Table:
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [synth_media_payload(i, kinds[i % 3]) for i in range(n)],
        "mime": [f"application/x-syn-{kinds[i % 3]}" for i in range(n)],
        "width": [-1] * n,
        "height": [-1] * n,
    }
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


class MediaDecoder:
    """Actor-pool stage: decode headers + extract a FEATURE_DIM feature
    vector per item. The per-actor ``__init__`` stands in for loading a
    decode model ONCE per worker (the LSP-pool pattern)."""

    def __init__(self, target_size: tuple[int, int] = (32, 32)):
        self.target = target_size
        if _HAVE_PIL:
            self._decode = self._decode_real
        else:
            self._decode = self._decode_stub

    def _decode_real(self, payload: bytes):  # pragma: no cover
        raise NotImplementedError(
            "real codec path requires PIL/av — not available in this container"
        )

    def _decode_stub(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        """Deterministic fake decode: parse the SYNM header and derive a
        pseudo-pixel feature vector from the payload digest."""
        if len(payload) < 8 or payload[:4] != _MAGIC:
            return -1, -1, np.zeros(FEATURE_DIM, dtype=np.float32)
        w, h = struct.unpack(">HH", payload[4:8])
        d = hashlib.sha256(payload).digest()
        feat = np.frombuffer((d * ((FEATURE_DIM * 4) // len(d) + 1))[: FEATURE_DIM * 4], dtype=np.uint8)
        feat = feat[:FEATURE_DIM].astype(np.float32) / 255.0
        return w, h, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, feats = [], [], []
        for payload in batch["payload"].to_pylist():
            w, h, f = self._decode(payload)
            ws.append(w)
            hs.append(h)
            feats.append(f)
        return pa.Table.from_pydict(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "mime": batch["mime"],
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.concatenate(feats), pa.float32()), FEATURE_DIM
                ),
            }
        )


def decode_media(
    media: ray.data.Dataset, concurrency: int = 2, batch_size: int = 64
) -> ray.data.Dataset:
    """media table → decoded metadata + feature vectors. Small batch
    size on purpose: payload rows are wide binary (memory-aware)."""
    from ..util import pool_size

    return media.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )


def frame_sample(
    media: ray.data.Dataset, every_n: int = 10, concurrency: int = 2
) -> ray.data.Dataset:
    """Video rows → one output row per sampled frame index (flat-map
    semantics inside map_batches). Frame decode itself is the stubbed
    codec; frame indexing/plumbing is real."""

    def f(batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_idx": [], "frame_key": []}
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(), batch["kind"].to_pylist(), batch["payload"].to_pylist()
        ):
            if kind != "video":
                continue
            # fake duration from payload length — each 16 bytes = 1 frame
            n_frames = max(1, len(payload) // 16)
            for idx in range(0, n_frames, every_n):
                out["media_id"].append(mid)
                out["frame_idx"].append(idx)
                out["frame_key"].append(hashlib.md5(f"{mid}:{idx}".encode()).hexdigest())
        return pa.Table.from_pydict(
            out,
            schema=pa.schema(
                [("media_id", pa.int64()), ("frame_idx", pa.int32()), ("frame_key", pa.string())]
            ),
        )

    return media.map_batches(f, batch_format="pyarrow", batch_size=64)
