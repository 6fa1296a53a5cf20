"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample as
actor-pool ``map_batches`` stages.

The decode stage has a REAL codec path (PIL decode → resize →
mean-pooled intensity features) behind an optional import, selected
automatically when pillow is installed; in this container (no media
libs) the clearly-marked deterministic stub parses the tiny header our
synthetic payloads carry instead. Everything Ray-side — schema, batch
size, actor signature, fixed-size-list feature output, per-actor model
"load" — is identical across both paths and tested (the real-codec test
skips when the lib is absent).
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
    decode model ONCE per worker (the LSP-pool pattern).

    ``codec`` selects the decode path: ``"auto"`` uses the real PIL
    decoder when the library is importable and the stub otherwise;
    ``"real"`` / ``"stub"`` force a path (the real path raises
    ImportError without PIL — tests parameterize over both and skip
    real when the lib is absent). The real path also falls back to the
    stub per item for payloads PIL cannot parse (our synthetic SYNM
    headers), so mixed corpora decode cleanly."""

    def __init__(self, target_size: tuple[int, int] = (32, 32), codec: str = "auto"):
        self.target = target_size
        if codec == "auto":
            codec = "real" if _HAVE_PIL else "stub"
        if codec == "real":
            if not _HAVE_PIL:
                raise ImportError("codec='real' requires PIL (pillow)")
            self._decode = self._decode_real
        elif codec == "stub":
            self._decode = self._decode_stub
        else:
            raise ValueError(f"unknown codec: {codec!r}")

    def _decode_real(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        """Real codec path: PIL decode → grayscale → resize to an
        (8 × FEATURE_DIM/8) thumbnail whose pixels ARE the feature
        vector (mean-pooled intensities in [0, 1]). Original width and
        height are reported pre-resize."""
        import io

        from PIL import Image

        try:
            img = Image.open(io.BytesIO(payload))
            w, h = img.size
            thumb = img.convert("L").resize((8, FEATURE_DIM // 8))
            feat = np.asarray(thumb, dtype=np.float32).reshape(-1)[:FEATURE_DIM] / 255.0
            return w, h, feat
        except Exception:
            # not a PIL-parseable payload (e.g. the synthetic SYNM
            # format) — the stub parser handles those
            return self._decode_stub(payload)

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
    media: ray.data.Dataset, concurrency: int = 2, batch_size: int = 64,
    codec: str = "auto",
) -> ray.data.Dataset:
    """media table → decoded metadata + feature vectors. Small batch
    size on purpose: payload rows are wide binary (memory-aware)."""
    from ..util import pool_size

    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"codec": codec},
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


def audio_windows(
    media: ray.data.Dataset, win_bytes: int = 64, hop_bytes: int = 32
) -> ray.data.Dataset:
    """Audio rows → fixed-length overlapping windows (the STFT-frame /
    feature-window plumbing of a speech pipeline): one output row per
    (media_id, win_idx) with byte offset/length and a FEATURE_DIM
    energy-profile vector from the deterministic stub "decode". Real
    audio decode would slot into the same batch signature (the
    ``MediaDecoder`` pattern); windowing, offsets, schema and the
    flat-map fan-out are real and tested. Map-only — windows of a row
    are emitted in its own batch, nothing shuffles."""
    if hop_bytes <= 0 or win_bytes <= 0:
        raise ValueError("win_bytes and hop_bytes must be positive")

    def f(batch: pa.Table) -> pa.Table:
        mids, idxs, offs, lens, feats = [], [], [], [], []
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "audio":
                continue
            body = payload[len(_MAGIC) + 4 :]  # skip SYNM header
            n = len(body)
            start = 0
            widx = 0
            while start < n:
                chunk = body[start : start + win_bytes]
                arr = np.frombuffer(chunk, dtype=np.uint8).astype(np.float64)
                prof = np.zeros(FEATURE_DIM, np.float32)
                if len(arr):
                    bins = np.array_split(arr, FEATURE_DIM)
                    prof = np.array(
                        [b.mean() if len(b) else 0.0 for b in bins], np.float32
                    ) / 255.0
                mids.append(mid)
                idxs.append(widx)
                offs.append(start)
                lens.append(len(chunk))
                feats.append(prof)
                widx += 1
                start += hop_bytes
        feat_arr = (
            np.stack(feats) if feats else np.zeros((0, FEATURE_DIM), np.float32)
        )
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(mids, pa.int64()),
                "win_idx": pa.array(idxs, pa.int32()),
                "offset": pa.array(offs, pa.int64()),
                "n_bytes": pa.array(lens, pa.int32()),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feat_arr.reshape(-1), pa.float32()), FEATURE_DIM
                ),
            }
        )

    # small batches on purpose: payload rows are wide binary
    return media.map_batches(f, batch_format="pyarrow", batch_size=64)
