"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video are treated as ``binary`` columns with metadata
columns, exactly like the reference treats BOC cell payloads
(``body_boc``/``data_boc`` base64→bytes, reference
datalake/converters/account_states.py:19-25). The decode libraries are
not available in this container, so the decode kernel is a clearly
marked stub (deterministic fake features) — but all the Ray-side
plumbing (schema, actor-pool stage, batch sizing for large binary rows,
output layout) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

from .._pickle import ensure_portable

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("payload", pa.binary()),  # opaque encoded bytes
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)

FEATURE_DIM = 16


def synth_media_table(num_rows: int = 256, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus (binary payloads of varied size)."""
    rng = np.random.default_rng(seed)
    ids = [f"m-{i:06d}" for i in range(num_rows)]
    payloads = [rng.bytes(int(rng.integers(100, 4096))) for _ in range(num_rows)]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/png"] * num_rows, pa.string()),
            "width": pa.array(rng.integers(16, 512, num_rows), pa.int32()),
            "height": pa.array(rng.integers(16, 512, num_rows), pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def synth_media_dataset(sf_dir: str) -> "rd.Dataset":
    """Deterministic SF-SCALED media corpus: one media row per document
    (media_id derived from doc_id), so the corpus grows with the scale
    factor like every other table. Payload bytes are a sha256 stream of
    the id — identical at any parallelism — and the generation itself is
    a ``map_batches`` stage over the documents read (no driver-side
    table build, unlike the fixed-size ``synth_media_table``)."""
    from ._util import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def gen(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        media_ids, payloads, ws, hs = [], [], [], []
        for i in ids:
            seed = hashlib.sha256(f"media-{i}".encode()).digest()
            size = 100 + int.from_bytes(seed[:4], "big") % 4000
            payloads.append((seed * (size // 32 + 1))[:size])
            media_ids.append(f"m-{i:09d}")
            ws.append(16 + seed[4] * 2)
            hs.append(16 + seed[5] * 2)
        return pa.table(
            {
                "media_id": pa.array(media_ids, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "mime": pa.array(["image/png"] * len(ids), pa.string()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
            },
            schema=MEDIA_SCHEMA,
        )

    return ds.map_batches(gen, batch_format="pyarrow")


def decode_image(payload: bytes) -> np.ndarray:
    """STUB: real image decode (no imaging libs in this container).

    The production kernel would be e.g. PIL/turbojpeg inside the actor.
    Callers wanting a real kernel inject one via
    ``media_features(..., use_stub=False, decoder=my_decode)`` — the
    injected callable receives the payload bytes and returns an HxWxC
    ndarray; the stage wiring is identical either way. Or pass
    ``use_stub="auto"`` to optional-import one (``real_decoder``).
    """
    raise NotImplementedError("image decode requires an imaging library not present here")


def real_decoder():
    """Optional-import a real image decode kernel: Pillow first, then
    OpenCV. Returns ``(name, payload→HxWxC-ndarray)`` or ``(None,
    None)`` when neither library is installed — callers (the ``"auto"``
    route) fall back to the deterministic stub, so CI stays green in
    containers without imaging libs while a real deployment gets real
    decode with zero configuration."""
    try:
        import io

        from PIL import Image

        def pil_decode(payload: bytes) -> np.ndarray:
            return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))

        return "pillow", pil_decode
    except ImportError:
        pass
    try:
        import cv2

        def cv2_decode(payload: bytes) -> np.ndarray:
            arr = cv2.imdecode(np.frombuffer(payload, np.uint8), cv2.IMREAD_COLOR)
            if arr is None:
                raise ValueError("cv2 could not decode payload")
            return arr[:, :, ::-1]  # BGR → RGB

        return "cv2", cv2_decode
    except ImportError:
        pass
    return None, None


class MediaFeatureStage:
    """Actor-pool stage: binary payload → fixed-dim feature vector.

    ``__init__`` is where a real model would load (once per actor).
    The feature kernel here is a deterministic fake (sha256-seeded), so
    the distributed plumbing is testable without decode libs. Batches
    must stay small for large binary rows (see ``media_features``)."""

    def __init__(self, use_stub: bool | str = True, decoder=None):
        # a real deployment injects ``decoder`` (e.g. PIL/turbojpeg
        # wrapped) — loaded HERE, once per actor, never per batch.
        # use_stub="auto": optional-import a real kernel (Pillow/cv2)
        # per actor, stub when no lib exists — the zero-config route;
        # the oracled queries pin use_stub=True so their sha-derived
        # features stay deterministic in ANY container.
        if use_stub == "auto":
            _name, found = real_decoder()
            self.use_stub = found is None
            self.decoder = found if found is not None else decode_image
        else:
            self.use_stub = use_stub
            self.decoder = decoder if decoder is not None else decode_image

    def _features(self, payload: bytes) -> np.ndarray:
        if not self.use_stub:
            img = self.decoder(payload)  # HxWxC ndarray from the kernel
            feat = np.asarray(img, dtype=np.float32).mean(axis=(0, 1))
            return np.resize(feat, FEATURE_DIM)
        h = hashlib.sha256(payload).digest()
        return np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32) / 65535.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        # zero-copy Arrow in/out: binary payloads never round-trip through
        # pandas object columns (a full copy per stage at 100 TB)
        import pyarrow.compute as pc

        if batch.num_rows == 0:  # np.stack([]) would raise
            return pa.table(
                {
                    "media_id": pa.array([], pa.string()),
                    "n_bytes": pa.array([], pa.int64()),
                    "feature": pa.array([], pa.list_(pa.float32(), FEATURE_DIM)),
                }
            )
        payloads = batch["payload"].combine_chunks() if isinstance(batch["payload"], pa.ChunkedArray) else batch["payload"]
        feats = np.stack([self._features(p.as_py()) for p in payloads])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": pc.binary_length(batch["payload"]).cast(pa.int64()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), FEATURE_DIM
                ),
            }
        )


class ResizeStage:
    """Resize plumbing: recompute typed metadata, pass payload through.

    A real kernel would decode → resample → re-encode inside the actor;
    here the payload is opaque (STUB) but the schema flow, metadata
    arithmetic and batch sizing are the production shape."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False)
        h = batch["height"].to_numpy(zero_copy_only=False)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        out = batch.drop_columns(["width", "height"])
        out = out.append_column("width", pa.array((w * scale).astype(np.int32)))
        out = out.append_column("height", pa.array((h * scale).astype(np.int32)))
        return out.append_column("resized", pa.array(scale < 1.0))


def media_resize(media: "rd.Dataset | pa.Table", *, max_side: int = 256, batch_size: int = 64):
    ensure_portable()
    ds = rd.from_arrow(media) if isinstance(media, pa.Table) else media
    return ds.map_batches(
        ResizeStage, fn_constructor_kwargs={"max_side": max_side},
        batch_format="pyarrow", batch_size=batch_size, concurrency=2,
    )


class FrameSampleStage:
    """Frame sampling plumbing: one input video row → n frame rows
    (flat-map shape, like the reference's one-state→many-nominators
    parser, staking_pools.py:29-63). Frame extraction is a deterministic
    STUB (hash-sliced payload); the row-explosion and schema are real."""

    def __init__(self, fps_every: int = 10):
        self.every = fps_every

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids, frame_idx, frames = [], [], []
        payloads = batch["payload"].combine_chunks() if isinstance(batch["payload"], pa.ChunkedArray) else batch["payload"]
        for mid, payload in zip(batch["media_id"].to_pylist(), payloads):
            pb = payload.as_py()
            n_frames = max(1, len(pb) // 1024)
            for i in range(0, n_frames, self.every):
                media_ids.append(mid)
                frame_idx.append(i)
                frames.append(hashlib.sha256(pb + i.to_bytes(4, "big")).digest()[:8])
        return pa.table({"media_id": pa.array(media_ids, pa.string()),
                         "frame_idx": pa.array(frame_idx, pa.int32()),
                         "frame_sig": pa.array(frames, pa.binary())})


def media_frame_sample(media: "rd.Dataset | pa.Table", *, every: int = 10, batch_size: int = 32):
    ensure_portable()
    ds = rd.from_arrow(media) if isinstance(media, pa.Table) else media
    return ds.map_batches(
        FrameSampleStage, fn_constructor_kwargs={"fps_every": every},
        batch_format="pyarrow", batch_size=batch_size, concurrency=2,
    )


def media_features(media: "rd.Dataset | pa.Table", *, batch_size: int = 64,
                   concurrency: int = 2, use_stub: bool | str = True, decoder=None):
    """Feature-extraction pipeline over a media table.

    batch_size is deliberately small: batch bytes ≈ batch_size × payload
    size must fit the worker heap alongside ``concurrency`` actors.
    ``use_stub=False`` + ``decoder=<callable>`` routes every payload
    through the injected decode kernel (constructed once per actor);
    ``use_stub="auto"`` optional-imports a real kernel (Pillow, then
    cv2) in each actor and falls back to the stub when neither lib is
    installed."""
    ensure_portable()
    ds = rd.from_arrow(media) if isinstance(media, pa.Table) else media
    return ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"use_stub": use_stub, "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
