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


def fake_payload(doc_id: int, kind: int, *, payload_bytes: int = 256,
                 body: str = "rng") -> bytes:
    """Deterministic fake media blob: magic + kind + dims + body.

    ``body="rng"``: PCG64-seeded noise (the default fixture — content
    opaque to SQL, used where only the geometry is oracled).
    ``body="grid"``: the SQL-REPLICABLE luma plane
    ``b(i) = ((doc_id%20)·31 + i·17 + [i//4 == doc_id%60]·200) % 256``
    over 240 bytes — 20 planted pattern classes, each doc perturbing
    its own 4-byte bucket, so perceptual-hash near-dup pairs exist by
    construction and a DuckDB oracle can recompute every pixel."""
    w = 16 + (doc_id * 7) % 64
    h = 16 + (doc_id * 13) % 48
    frames = 1 if kind != 2 else 1 + doc_id % 8
    header = MAGIC + struct.pack("<BHHH", kind, w, h, frames)
    if body == "grid":
        i = np.arange(240, dtype=np.int64)
        px = ((doc_id % 20) * 31 + i * 17
              + np.where(i // 4 == doc_id % 60, 200, 0)) % 256
        return header + px.astype(np.uint8).tobytes()
    rng = np.random.default_rng(doc_id * 3 + kind)
    return header + rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes()


def synth_media_table(n: int, body: str = "rng") -> pa.Table:
    """Deterministic media fixture: one blob per doc, kind round-robin."""
    ids = np.arange(n, dtype=np.int64)
    kinds = (ids % 3).astype(np.int64)
    payloads = [fake_payload(int(i), int(k), body=body)
                for i, k in zip(ids, kinds)]
    return pa.table({
        "doc_id": pa.array(ids),
        "kind": pa.array([KINDS[int(k)] for k in kinds], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
    })


def _flat_binary(col):
    """Zero-copy ``(offsets, data)`` numpy views of an Arrow binary
    column's flat buffer (offsets are ABSOLUTE positions into
    ``data``, int64-widened)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    odt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    offsets = np.frombuffer(col.buffers()[1], dtype=odt)[
        col.offset: col.offset + len(col) + 1].astype(np.int64)
    data = (np.frombuffer(col.buffers()[2], dtype=np.uint8)
            if col.buffers()[2] is not None else np.empty(0, np.uint8))
    return offsets, data


def _parse_fake_headers(col):
    """Vectorized fake-codec header parse: ONE (N, 11) uint8 gather
    over the flat binary buffer instead of a per-blob ``struct.unpack``
    loop (r4 verdict item 5 — the real-codec branch is per-row by
    nature, the fake path need not be).  Returns
    ``(offsets, data, ok, kind, w, h, f)``; non-HRAY / short blobs get
    ``ok=False`` and zeroed fields."""
    offsets, data = _flat_binary(col)
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    n = len(starts)
    kind = np.zeros(n, np.int64)
    w = np.zeros(n, np.int64)
    h = np.zeros(n, np.int64)
    f = np.zeros(n, np.int64)
    ok = np.zeros(n, bool)
    long_enough = lens >= 11
    if long_enough.any():
        cand = np.flatnonzero(long_enough)
        hdr = data[starts[cand, None] + np.arange(11)].astype(np.int64)
        good = (hdr[:, :4] == np.frombuffer(MAGIC, np.uint8)).all(axis=1)
        oki = cand[good]
        hdr = hdr[good]
        ok[oki] = True
        kind[oki] = hdr[:, 4]
        w[oki] = hdr[:, 5] + (hdr[:, 6] << 8)
        h[oki] = hdr[:, 7] + (hdr[:, 8] << 8)
        f[oki] = hdr[:, 9] + (hdr[:, 10] << 8)
    return offsets, data, ok, kind, w, h, f


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
        _, _, ok, _, w, h, f = _parse_fake_headers(batch.column("payload"))
        out = batch.drop_columns(["payload"])  # wide binary dies here
        for name, vals, typ in [("width", w, pa.int64()),
                                ("height", h, pa.int64()),
                                ("frames", f, pa.int64()),
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
        offsets, data, ok, _, w, h, _ = _parse_fake_headers(
            batch.column("payload"))
        starts = offsets[:-1]
        nw = np.zeros(len(starts), np.int64)
        nh = np.zeros(len(starts), np.int64)
        m = np.maximum(np.maximum(w, h), 1)
        nw[ok] = np.maximum(1, w[ok] * t // m[ok])
        nh[ok] = np.maximum(1, h[ok] * t // m[ok])
        # same-length headers ⇒ the output flat buffer is the input
        # with the four w/h bytes overwritten in place — no per-blob
        # bytes concatenation
        newdata = data.copy()
        s = starts[ok]
        newdata[s + 5] = (nw[ok] & 0xFF).astype(np.uint8)
        newdata[s + 6] = (nw[ok] >> 8).astype(np.uint8)
        newdata[s + 7] = (nh[ok] & 0xFF).astype(np.uint8)
        newdata[s + 8] = (nh[ok] >> 8).astype(np.uint8)
        payload = pa.Array.from_buffers(
            pa.binary(), len(starts),
            [None, pa.py_buffer(offsets.astype(np.int32).tobytes()),
             pa.py_buffer(newdata.tobytes())])
        out = batch.drop_columns(["payload"])
        out = out.append_column("width", pa.array(nw, pa.int64()))
        out = out.append_column("height", pa.array(nh, pa.int64()))
        out = out.append_column("payload", payload)
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


def tile_plan(media_ds, tile: int = 16):
    """ViT-style PATCH-GRID plan per media blob: the non-overlapping
    ``tile``×``tile`` grid over each decoded (width, height) with edge
    remainders — one row per tile ``(doc_id, tile_x, tile_y, tile_w,
    tile_h)``, the unit of work every vision-transformer / OCR / SAM
    preprocessing pipeline fans out over.

    Vectorized fan-out per batch: geometry from the same header parse
    the decode stage uses, tile coordinates by one ``repeat`` + one
    modular ``arange`` (x-major within a blob) — no Python loop.  The
    plan composes BEFORE any pixel decode, so at 100 TB the expensive
    codec stage can be scheduled per tile row instead of per image."""

    def f(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "tile_x": pa.array([], pa.int64()),
                          "tile_y": pa.array([], pa.int64()),
                          "tile_w": pa.array([], pa.int64()),
                          "tile_h": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        _, _, ok, _kind, w, h, _f = _parse_fake_headers(
            batch.column("payload"))
        ids = batch.column("doc_id").to_numpy().astype(np.int64)[ok]
        w, h = w[ok], h[ok]
        nx = -(-w // tile)
        ny = -(-h // tile)
        cnt = nx * ny
        tot = int(cnt.sum())
        if tot == 0:
            return empty
        base = np.repeat(np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        k = np.arange(tot, dtype=np.int64) - base
        rny = np.repeat(ny, cnt)
        tx = k // rny
        ty = k % rny
        rw = np.repeat(w, cnt)
        rh = np.repeat(h, cnt)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, cnt)),
            "tile_x": pa.array(tx),
            "tile_y": pa.array(ty),
            "tile_w": pa.array(np.minimum(tile, rw - tx * tile)),
            "tile_h": pa.array(np.minimum(tile, rh - ty * tile)),
        })

    return media_ds.map_batches(f, batch_format="pyarrow")


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


class PerceptualHash:
    """Actor-pool aHash stage: payload → 60-bit average-hash.

    The average hash (the aHash family behind image-dedup systems like
    PDQ's baseline): split the 240-byte decoded luma plane into 60
    buckets of 4, set bit j iff the bucket's sum beats the global mean
    — as the exact integer comparison ``60·s_j > Σ s`` (no division).
    60 bits keep the packed hash clear of the int64 sign bit, so the
    SQL oracle can build the identical BIGINT with shifts.  Fully
    vectorized: one (N, 240) gather off the flat binary buffer, one
    reshape-sum, one matmul-free threshold.  Real decoders would feed
    the same stage their downsampled grayscale plane."""

    BODY = 240
    BUCKETS = 60

    def __call__(self, batch: pa.Table) -> pa.Table:
        offsets, data, ok, _, _, _, _ = _parse_fake_headers(
            batch.column("payload"))
        starts = offsets[:-1]
        lens = offsets[1:] - starts
        ok = ok & (lens >= 11 + self.BODY)
        ids = batch.column("doc_id").to_numpy().astype(np.int64)[ok]
        h = np.zeros(len(ids), np.int64)
        if len(ids):
            idx = starts[ok][:, None] + 11 + np.arange(self.BODY)
            px = data[idx].astype(np.int64)
            s = px.reshape(len(ids), self.BUCKETS, -1).sum(axis=2)
            bits = (self.BUCKETS * s) > s.sum(axis=1, keepdims=True)
            h = (bits.astype(np.int64)
                 << np.arange(self.BUCKETS, dtype=np.int64)).sum(axis=1)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "simhash": pa.array(h, pa.int64())})


def phash_dup_pairs(media_ds, *, max_hamming: int = 3):
    """Perceptual-hash near-duplicate pairs over a media table:
    aHash signatures (actor pool) → the simhash family's lossless
    4×16-bit banding + bucket groupby + exact popcount verify
    (`dedup.simhash_pairs` — Hamming ≤ 3 always shares a band).
    Returns (a, b, hamming) — the image-dedup pipeline with the text
    machinery reused wholesale."""
    from hedonic_ray.ops.dedup import simhash_pairs

    sigs = media_ds.map_batches(PerceptualHash, batch_format="pyarrow",
                                batch_size=128, concurrency=actor_pool())
    return simhash_pairs(sigs, max_hamming=max_hamming)


def audio_window_energy(media_ds, *, window: int = 60,
                        body_bytes: int = 240):
    """Per-window ENERGY/PEAK profile of the audio-kind blobs — the
    voice-activity-detection / silence-trim building block of a
    speech-data curation pipeline, over the same fake-PCM grid plane
    the phash op decodes (`fake_payload(body="grid")`): each body
    byte is a sample, windows are ``window`` samples, and per window
    the exact integers energy = Σ (b−128)² and peak = max |b−128|.

    One vectorized ``map_batches``: the header parse is the shared
    `_parse_fake_headers` gather, the body a single (k, body_bytes)
    fancy-index into the flat binary buffer — no per-blob Python.
    Real PCM decode plugs in where the fake gather sits (the
    `DecodeMedia` integration-point pattern).  Columns: doc_id, win,
    energy, peak."""
    nw = body_bytes // window

    def f(batch: pa.Table) -> pa.Table:
        offsets, data, ok, kind, _w, _h, _f = _parse_fake_headers(
            batch.column("payload"))
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        starts = offsets[:-1] + 11
        lens = offsets[1:] - starts
        sel = np.flatnonzero(ok & (kind == 1) & (lens >= body_bytes))
        if not len(sel):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "win": pa.array([], pa.int64()),
                             "energy": pa.array([], pa.int64()),
                             "peak": pa.array([], pa.int64())})
        body = data[starts[sel, None] + np.arange(body_bytes)]
        x = body.astype(np.int64) - 128
        xx = x.reshape(len(sel), nw, window)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids[sel], nw)),
            "win": pa.array(np.tile(np.arange(nw, dtype=np.int64),
                                    len(sel))),
            "energy": pa.array((xx * xx).sum(axis=2).ravel()),
            "peak": pa.array(np.abs(xx).max(axis=2).ravel())})

    return media_ds.map_batches(f, batch_format="pyarrow",
                                batch_size=1024)
