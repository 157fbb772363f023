"""Multimodal (image/audio/video) stages — real Ray-side plumbing,
stubbed decoders.

The reference's core business is media decode + model inference
(reference: src/vframe/models/media.py:343-384 frame iteration;
src/vframe/image/processors/base.py:57-83 preprocess+forward;
src/vframe/utils/video_utils.py:42-204 threaded decode).  The media
libraries (OpenCV, PIL, ffmpeg) are NOT in this container, so the
decode kernels here are deterministic fakes behind the same interface —
but everything Ray-visible is real and tested: the binary-column
schema, actor-pool signature, batch sizing for large payloads, and the
output layout.

Schema convention for opaque media columns::

    media_id:string, payload:binary, media_type:string ('image'|...),
    meta:string (JSON: width/height/codec/... — FileMeta analog,
    cvmodels.py:301-341)

Swap ``FakeImageDecoder`` for a cv2/PIL implementation on a cluster
with the libs installed; nothing else changes.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa


class FakeImageDecoder:
    """Deterministic stand-in for cv2.imdecode: payload bytes -> a small
    pseudo-image whose pixels derive from the payload hash.  Raises on
    empty payload like a real decoder would on a corrupt file
    (media.py:357-366 per-file error capture)."""

    def decode(self, payload: bytes) -> np.ndarray:
        if not payload:
            raise ValueError("empty payload (corrupt media)")
        h = hashlib.blake2b(payload, digest_size=16).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
        return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


class ImageFeatureStage:
    """Actor-pool stage: decode → feature-extract each image payload.

    Decoder + 'model' built once per actor (detect.py:73 pattern).
    Output: (media_id, width, height, feature:list<float>(8), error).
    Corrupt payloads are captured per row, not fatal (the reference's
    per-file try/except, media.py:289-307) — the errors side-table
    pattern of media-attrs.py:79-92.
    """

    def __init__(self, real_decoder: bool = False):
        if real_decoder:
            raise NotImplementedError(
                "no image libraries in this environment; install cv2/PIL "
                "and implement decode() — Ray plumbing is unchanged")
        self.decoder = FakeImageDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, feats, errs = [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            ids.append(mid)
            try:
                img = self.decoder.decode(payload)
                ws.append(img.shape[1])
                hs.append(img.shape[0])
                # 'feature' = per-channel mean/std (stands in for the
                # L2-normalized embedding of features.py:50)
                f = np.concatenate([img.mean(axis=(0, 1)),
                                    img.std(axis=(0, 1))])
                n = np.linalg.norm(f)
                feats.append((f / n if n else f).astype(np.float32).tolist())
                errs.append(None)
            except Exception as e:          # poison-row quarantine
                ws.append(0)
                hs.append(0)
                # empty (not null) feature: keeps the column a plain
                # variable-length list — Ray's tensor-extension autocast
                # rejects nulls in uniform-length list columns
                feats.append([])
                errs.append(str(e))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "feature": pa.array(feats, pa.list_(pa.float32())),
            "error": pa.array(errs, pa.string()),
        })


def image_features(ds, *, concurrency=None, batch_size: int = 64):
    """Small batch_size on purpose: binary payloads are wide, so
    batch × concurrency must fit the worker heap (guide: memory-aware
    sizing for large binary rows)."""
    from ..runtime import actor_pool
    return ds.map_batches(ImageFeatureStage, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=concurrency or actor_pool(),
                          fn_constructor_kwargs=dict(real_decoder=False))


class HeaderProbeStage:
    """Actor-pool stage probing media-header attributes from an opaque
    ``payload`` binary column (the reference's `utils media-attrs` —
    media-attrs.py:40-92: per-file width/height/type + errors capture) —
    with a DELIBERATELY SQL-computable fake header rule so the DuckDB
    oracle can validate the full actor-pool + poison-row plumbing
    value-for-value:

        nbytes = len(payload)
        width  = 1 + (nbytes * 7)  % 640
        height = 1 + (nbytes * 13) % 480
        empty payload -> error row (width/height NULL, error set)
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        nbytes = pc.binary_length(payload).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ok = nbytes > 0
        width = np.where(ok, 1 + (nbytes * 7) % 640, 0).astype(np.int32)
        height = np.where(ok, 1 + (nbytes * 13) % 480, 0).astype(np.int32)
        err = pa.array([None if o else "empty payload" for o in ok],
                       pa.string())
        return pa.table({
            "media_id": batch["media_id"],
            "nbytes": pa.array(nbytes),
            "width": pa.Array.from_pandas(width, mask=~ok, type=pa.int32()),
            "height": pa.Array.from_pandas(height, mask=~ok,
                                           type=pa.int32()),
            "error": err,
        })


def media_header_probe(ds, *, concurrency=None, batch_size: int = 256):
    """Actor-pool header probe over (media_id, payload) rows."""
    from ..runtime import actor_pool
    return ds.map_batches(HeaderProbeStage, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=concurrency or actor_pool())


def text_as_payload(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Lift a text table into the opaque-media shape (media_id, payload):
    payload = utf-8 bytes — the deterministic stand-in corpus for the
    binary-column pipeline when no real media exists in the testbed."""
    import pyarrow.compute as pc

    def lift(t: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": pc.cast(t[id_col], pa.string()),
            "payload": pc.cast(t[text_col], pa.binary()),
        })

    return ds.map_batches(lift, batch_format="pyarrow", zero_copy_batch=True)


def frame_sample(ds, every_n: int = 5):
    """Frame decimation on a video-frames table (media_id, frame_idx, …):
    keep every Nth frame — the reference's skip-interval
    (skip-interval.py:21-45), vectorized modulo."""
    def dec(t: pa.Table) -> pa.Table:
        idx = t["frame_idx"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(idx % every_n == 0))

    return ds.map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for tests (binary payloads with a
    couple of planted corrupt rows)."""
    rng = np.random.default_rng(seed)
    ids, payloads, metas = [], [], []
    for i in range(n):
        ids.append(f"img-{i:05d}")
        if i % 17 == 13:
            payloads.append(b"")                    # corrupt
        else:
            payloads.append(rng.bytes(128))
        metas.append(json.dumps({"codec": "fake", "n": i}))
    return pa.table({
        "media_id": pa.array(ids, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(["image"] * n, pa.string()),
        "meta": pa.array(metas, pa.string()),
    })
