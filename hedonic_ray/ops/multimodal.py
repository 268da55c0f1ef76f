"""Multimodal column plumbing (image / audio / video as opaque binary).

The container has no image/audio libraries, so DECODE IS STUBBED: the
real-codec branch raises ``NotImplementedError`` and a deterministic
fake codec (a 16-byte header ``HRAY`` + kind + width/height/frames)
exercises the full Ray-side plumbing — schema, actor-pool stages, batch
sizing for wide binary rows, output layout — which is the part that
must be real and tested here.

Stages follow the engine's conventions: small ``batch_size`` (binary
payloads dominate memory — SURVEY §7.5.4), ``batch_format="pyarrow"``
(binary columns don't round-trip pandas cleanly), actor pools with
decode state in ``__init__``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from hedonic_ray.context import actor_pool
from hedonic_ray.functions.hashing import hash_ints

MAGIC = b"HRAY"
KINDS = {0: "image", 1: "audio", 2: "video"}


def fake_payload(doc_id: int, kind: int, *, payload_bytes: int = 256) -> bytes:
    """Deterministic fake media blob: magic + kind + dims + seeded body."""
    w = 16 + (doc_id * 7) % 64
    h = 16 + (doc_id * 13) % 48
    frames = 1 if kind != 2 else 1 + doc_id % 8
    header = MAGIC + struct.pack("<BHHH", kind, w, h, frames)
    rng = np.random.default_rng(doc_id * 3 + kind)
    return header + rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes()


def synth_media_table(n: int) -> pa.Table:
    """Deterministic media fixture: one blob per doc, kind round-robin."""
    ids = np.arange(n, dtype=np.int64)
    kinds = (ids % 3).astype(np.int64)
    payloads = [fake_payload(int(i), int(k)) for i, k in zip(ids, kinds)]
    return pa.table({
        "doc_id": pa.array(ids),
        "kind": pa.array([KINDS[int(k)] for k in kinds], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
    })


class DecodeMedia:
    """Actor-pool decode stage.

    ``fake=True`` parses the deterministic header; ``fake=False`` is the
    real-codec branch — NOT IMPLEMENTED in this container (no
    PIL/ffmpeg), kept as the explicit integration point.
    """

    def __init__(self, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg (absent in this "
                "container); use fake=True for the plumbing path")
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, frames, ok = [], [], [], []
        for blob in batch.column("payload").to_pylist():
            if blob[:4] == MAGIC:
                k, w, h, f = struct.unpack("<BHHH", blob[4:11])
                widths.append(w)
                heights.append(h)
                frames.append(f)
                ok.append(True)
            else:
                widths.append(0)
                heights.append(0)
                frames.append(0)
                ok.append(False)
        out = batch.drop_columns(["payload"])  # wide binary dies here
        for name, vals, typ in [("width", widths, pa.int64()),
                                ("height", heights, pa.int64()),
                                ("frames", frames, pa.int64()),
                                ("decoded", ok, pa.bool_())]:
            out = out.append_column(name, pa.array(vals, typ))
        return out


class ExtractFeatures:
    """Actor-pool feature stage: payload → fixed-dim feature vector.
    Deterministic fake (hash-derived); the real model-inference branch
    would load weights in ``__init__`` and batch through the model."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        feats = np.stack([
            (hash_ints(np.arange(self.dim), seed=int(i)) % 1000) / 1000.0
            for i in ids
        ]).astype(np.float32)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1)), self.dim),
        })


class ResizeMedia:
    """Actor-pool resize stage: fit each decoded image/video frame
    inside a ``target`` × ``target`` box preserving aspect ratio with
    PURE INTEGER arithmetic (``new_w = max(1, w*target // max(w, h))``)
    — bit-equal across engines, so the driver gate can SQL-check the
    output dimensions.  ``fake=True`` re-synthesizes a payload of the
    new geometry; the real branch (PIL/ffmpeg scaling) is the explicit
    integration point, not implemented in this container."""

    def __init__(self, target: int = 32, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real media resize requires PIL/ffmpeg (absent in this "
                "container); use fake=True for the plumbing path")
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.target
        ws, hs, payloads = [], [], []
        for blob in batch.column("payload").to_pylist():
            if blob[:4] == MAGIC:
                k, w, h, f = struct.unpack("<BHHH", blob[4:11])
                m = max(w, h)
                nw = max(1, w * t // m)
                nh = max(1, h * t // m)
                ws.append(nw)
                hs.append(nh)
                payloads.append(MAGIC + struct.pack("<BHHH", k, nw, nh, f)
                                + blob[11:])
            else:
                ws.append(0)
                hs.append(0)
                payloads.append(blob)
        out = batch.drop_columns(["payload"])
        out = out.append_column("width", pa.array(ws, pa.int64()))
        out = out.append_column("height", pa.array(hs, pa.int64()))
        out = out.append_column("payload", pa.array(payloads, pa.binary()))
        return out


def decode_media(media_ds):
    return media_ds.map_batches(DecodeMedia, fn_constructor_args=(True,),
                                batch_format="pyarrow", batch_size=128,
                                concurrency=actor_pool())


def media_features(media_ds, dim: int = 16):
    return media_ds.map_batches(ExtractFeatures, fn_constructor_args=(dim,),
                                batch_format="pyarrow", batch_size=128,
                                concurrency=actor_pool())


def resize_media(media_ds, target: int = 32):
    """Resized media dataset (binary payload column preserved with the
    new geometry header)."""
    return media_ds.map_batches(ResizeMedia, fn_constructor_args=(target, True),
                                batch_format="pyarrow", batch_size=128,
                                concurrency=actor_pool())


def frame_sample(media_ds, every: int = 2):
    """Video frame-sampling plumbing: one output row per sampled frame
    index (flat map over decoded video rows)."""
    decoded = decode_media(media_ds)

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        kinds = batch.column("kind").to_pylist()
        frames = batch.column("frames").to_numpy()
        out_id, out_frame = [], []
        for i, k, fr in zip(ids.tolist(), kinds, frames.tolist()):
            if k == "video":
                sel = list(range(0, fr, every))
                out_id.extend([i] * len(sel))
                out_frame.extend(sel)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "frame": pa.array(out_frame, pa.int64())})

    return decoded.map_batches(f, batch_format="pyarrow")
