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


def bmp_encode(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a REAL 24-bit
    uncompressed Windows BMP (BITMAPINFOHEADER, bottom-up rows, each
    row zero-padded to 4 bytes, BGR byte order) — pure numpy/struct,
    no image libraries.  Round-trips exactly through
    :class:`BmpDecoder` (pytest-asserted)."""
    import struct
    h, w, c = img.shape
    if c != 3 or img.dtype != np.uint8:
        raise ValueError("bmp_encode wants (H, W, 3) uint8")
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    bgr = img[::-1, :, ::-1]                   # bottom-up, RGB->BGR
    rows = np.zeros((h, row_bytes + pad), np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    pixels = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(pixels), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels),
                         0, 0, 14 + 40)
    return header + info + pixels


class BmpDecoder:
    """REAL image decode, no external libraries: 24-bit uncompressed
    BMP (the reference decodes via cv2.imdecode, base.py:57-83; BMP is
    the one mainstream raster format parseable with struct+numpy
    alone, so the decode seam stops being a fake for this format —
    cv2/PIL would extend the same class to JPEG/PNG).  Validates
    magic, header size, bpp=24, compression=0 and pixel-buffer bounds;
    raises on anything malformed (the corrupt-file path,
    media.py:357-366)."""

    def decode(self, payload: bytes) -> np.ndarray:
        import struct
        if not payload:
            raise ValueError("empty payload (corrupt media)")
        if len(payload) < 54 or payload[:2] != b"BM":
            raise ValueError("not a BMP payload")
        offset, = struct.unpack_from("<I", payload, 10)
        hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        comp, = struct.unpack_from("<I", payload, 30)
        if hdr_size < 40 or planes != 1:
            raise ValueError("unsupported BMP header")
        if bpp != 24 or comp != 0:
            raise ValueError(f"unsupported BMP (bpp={bpp}, "
                             f"compression={comp}) — only 24-bit "
                             "uncompressed is implemented")
        if w <= 0 or h == 0:
            raise ValueError("degenerate BMP dimensions")
        flip = h > 0                           # positive = bottom-up
        h = abs(h)
        row_bytes = w * 3
        stride = row_bytes + ((-row_bytes) % 4)
        need = offset + stride * h
        if len(payload) < need:
            raise ValueError("truncated BMP pixel buffer")
        rows = np.frombuffer(payload, np.uint8, count=stride * h,
                             offset=offset).reshape(h, stride)
        bgr = rows[:, :row_bytes].reshape(h, w, 3)
        img = bgr[::-1] if flip else bgr
        return img[:, :, ::-1].copy()          # BGR -> RGB


def wav_encode(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 PCM samples ((n,) mono or (n, ch)) as a REAL RIFF
    WAVE file — pure struct/numpy.  Round-trips exactly through
    :class:`WavDecoder`."""
    import struct
    s = np.asarray(samples, np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.astype("<i2").tobytes()
    block = ch * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate,
                      sample_rate * block, block, 16)
    hdr = struct.pack("<4sI4s", b"RIFF",
                      4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


class WavDecoder:
    """REAL audio decode, no external libraries: RIFF/WAVE PCM16
    (the reference's media-attrs pulls audio headers via mediainfo,
    video_utils.py:207-287; WAV is the struct-parseable format, so the
    audio seam stops being a fake here — ffmpeg would extend the same
    class to compressed codecs).  Walks the chunk list properly (extra
    chunks between fmt and data are legal), validates PCM/16-bit, and
    raises on anything malformed.

    Returns (samples int16 (n, ch), sample_rate)."""

    def decode(self, payload: bytes):
        import struct
        if not payload:
            raise ValueError("empty payload (corrupt media)")
        if len(payload) < 12 or payload[:4] != b"RIFF" \
                or payload[8:12] != b"WAVE":
            raise ValueError("not a WAV payload")
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid, size = struct.unpack_from("<4sI", payload, pos)
            body = payload[pos + 8:pos + 8 + size]
            if len(body) < size:
                raise ValueError("truncated WAV chunk")
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)       # chunks are word-aligned
        if fmt is None or data is None:
            raise ValueError("WAV missing fmt/data chunk")
        audio_format, ch, sr, _br, _ba, bits = fmt
        if audio_format != 1 or bits != 16:
            raise ValueError(f"unsupported WAV (format={audio_format}, "
                             f"bits={bits}) — only PCM16 is implemented")
        if ch < 1:
            raise ValueError("degenerate channel count")
        usable = len(data) - (len(data) % (2 * ch))
        s = np.frombuffer(data, "<i2", count=usable // 2) \
            .reshape(-1, ch).copy()
        return s, sr


class WavFeatureStage:
    """Actor-pool stage over REAL WAV payloads: decode with
    :class:`WavDecoder` (once per actor), emit header facts and exact
    integer-sum statistics (peak = max |sample|, mean_val = Σ/n — one
    float division).  Corrupt payloads become poison rows."""

    def __init__(self):
        self.decoder = WavDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ns, srs, chs, pk, mv, errs = [], [], [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            ids.append(mid)
            try:
                s, sr = self.decoder.decode(payload)
                ns.append(s.shape[0])
                srs.append(sr)
                chs.append(s.shape[1])
                pk.append(int(np.abs(s.astype(np.int64)).max()))
                mv.append(int(s.sum(dtype=np.int64)) / s.size)
                errs.append(None)
            except Exception as e:
                ns.append(0)
                srs.append(0)
                chs.append(0)
                pk.append(0)
                mv.append(np.nan)
                errs.append(str(e))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "n_samples": pa.array(ns, pa.int64()),
            "sample_rate": pa.array(srs, pa.int32()),
            "channels": pa.array(chs, pa.int32()),
            "peak": pa.array(pk, pa.int64()),
            "mean_val": pa.array(mv, pa.float64()),
            "error": pa.array(errs, pa.string()),
        })


def wav_audio_features(ds, *, concurrency=None, batch_size: int = 128):
    """Real-decode audio features over (media_id, payload) WAV rows."""
    from ..runtime import actor_pool
    return ds.map_batches(WavFeatureStage, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=concurrency or actor_pool())


def avi_encode(frames: "list[np.ndarray]", fps: int = 10) -> bytes:
    """Encode (H, W, 3) uint8 RGB frames as a REAL uncompressed AVI
    (RIFF 'AVI ' → hdrl(avih, strl(strh 'vids'/'DIB ', strf
    BITMAPINFOHEADER)) → movi('00db' raw bottom-up BGR frames)) —
    pure struct/numpy.  Plays in standard players; round-trips
    exactly through :class:`AviDecoder`."""
    import struct
    if not frames:
        raise ValueError("avi_encode wants >= 1 frame")
    h, w, c = frames[0].shape
    if c != 3 or any(f.shape != (h, w, 3) or f.dtype != np.uint8
                     for f in frames):
        raise ValueError("avi_encode wants uniform (H, W, 3) uint8")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)

    def dib(f):
        bgr = f[::-1, :, ::-1]
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        return rows.tobytes()

    frame_bytes = [dib(f) for f in frames]
    movi_items = b"".join(
        struct.pack("<4sI", b"00db", len(fb)) + fb for fb in frame_bytes)
    movi = struct.pack("<4sI4s", b"LIST", 4 + len(movi_items), b"movi") \
        + movi_items
    strf = struct.pack("<4sI", b"strf", 40) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0)
    strh = struct.pack("<4sI", b"strh", 56) + struct.pack(
        "<4s4sIHHIIIIIIiI4h", b"vids", b"DIB ",
        0, 0, 0,                     # flags, priority, language
        0, 1, fps,                   # initial_frames, scale, rate
        0, len(frames), stride * h,  # start, length, suggested_buffer
        -1, 0,                       # quality, sample_size
        0, 0, w, h)                  # rcFrame
    strl = struct.pack("<4sI4s", b"LIST",
                       4 + len(strh) + len(strf), b"strl") + strh + strf
    avih = struct.pack("<4sI", b"avih", 56) + struct.pack(
        "<IIIIIIIIII4I", 1_000_000 // fps, 0, 0, 0x10, len(frames),
        0, 1, stride * h, w, h, 0, 0, 0, 0)
    hdrl = struct.pack("<4sI4s", b"LIST",
                       4 + len(avih) + len(strl), b"hdrl") + avih + strl
    body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


class AviDecoder:
    """REAL video decode, no external libraries: uncompressed-DIB AVI
    (the reference iterates video frames via cv2's threaded reader,
    video_utils.py:42-204; RIFF-AVI with BI_RGB frames is the
    struct-parseable container, so frame iteration runs on a real
    format here — ffmpeg would extend the same class to compressed
    codecs).  Walks the RIFF tree, reads dimensions from strf and fps
    from strh (rate/scale), yields bottom-up BGR '00db' frames as
    (H, W, 3) RGB.

    Returns (frames list, fps float)."""

    def decode(self, payload: bytes):
        import struct
        if not payload:
            raise ValueError("empty payload (corrupt media)")
        if len(payload) < 12 or payload[:4] != b"RIFF" \
                or payload[8:12] != b"AVI ":
            raise ValueError("not an AVI payload")
        w = h = None
        rate = scale = None
        frames: list[np.ndarray] = []

        def walk(lo: int, hi: int):
            nonlocal w, h, rate, scale
            pos = lo
            while pos + 8 <= hi:
                cid, size = struct.unpack_from("<4sI", payload, pos)
                body_lo = pos + 8
                if body_lo + size > hi:
                    raise ValueError("truncated AVI chunk")
                if cid in (b"LIST", b"RIFF"):
                    walk(body_lo + 4, body_lo + size)
                elif cid == b"strh":
                    fcc = payload[body_lo:body_lo + 4]
                    if fcc == b"vids":
                        scale, rate = struct.unpack_from(
                            "<II", payload, body_lo + 20)
                elif cid == b"strf":
                    _sz, w_, h_ = struct.unpack_from(
                        "<Iii", payload, body_lo)
                    bpp, = struct.unpack_from("<H", payload, body_lo + 14)
                    comp, = struct.unpack_from("<I", payload, body_lo + 16)
                    if bpp != 24 or comp != 0:
                        raise ValueError(
                            f"unsupported AVI stream (bpp={bpp}, "
                            f"compression={comp}) — only BI_RGB 24-bit")
                    w, h = w_, abs(h_)
                elif cid in (b"00db", b"00dc"):
                    if w is None:
                        raise ValueError("AVI frame before strf header")
                    row_bytes = w * 3
                    stride = row_bytes + ((-row_bytes) % 4)
                    if size < stride * h:
                        raise ValueError("truncated AVI frame")
                    rows = np.frombuffer(payload, np.uint8,
                                         count=stride * h,
                                         offset=body_lo).reshape(h, stride)
                    bgr = rows[:, :row_bytes].reshape(h, w, 3)
                    frames.append(bgr[::-1, :, ::-1].copy())
                pos = body_lo + size + (size & 1)

        walk(12, len(payload))
        if w is None or not frames:
            raise ValueError("AVI missing stream header or frames")
        fps = (rate / scale) if rate and scale else 0.0
        return frames, fps


class VideoFrameStage:
    """Actor-pool FRAME-ITERATION stage over REAL AVI payloads: one
    input row fans out to one output row per decoded frame (the
    reference's file→frame loop, media.py:343-384), each with header
    facts and the exact blue-channel mean.  Corrupt payloads become a
    single poison row with frame_idx −1."""

    def __init__(self):
        self.decoder = AviDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, nf, fpss, ws, hs, mb, errs = ([] for _ in range(8))
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            try:
                frames, fps = self.decoder.decode(payload)
                for i, f in enumerate(frames):
                    ids.append(mid)
                    fidx.append(i)
                    nf.append(len(frames))
                    fpss.append(fps)
                    hs.append(f.shape[0])
                    ws.append(f.shape[1])
                    mb.append(int(f[:, :, 2].sum(dtype=np.int64))
                              / (f.shape[0] * f.shape[1]))
                    errs.append(None)
            except Exception as e:
                ids.append(mid)
                fidx.append(-1)
                nf.append(0)
                fpss.append(0.0)
                ws.append(0)
                hs.append(0)
                mb.append(np.nan)
                errs.append(str(e))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "n_frames": pa.array(nf, pa.int32()),
            "fps": pa.array(fpss, pa.float64()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "mean_b": pa.array(mb, pa.float64()),
            "error": pa.array(errs, pa.string()),
        })


def video_frame_features(ds, *, concurrency=None, batch_size: int = 16):
    """Real-decode frame fan-out over (media_id, payload) AVI rows
    (small batches: a video row is many frames wide)."""
    from ..runtime import actor_pool
    return ds.map_batches(VideoFrameStage, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=concurrency or actor_pool())


class ImageFeatureStage:
    """Actor-pool stage: decode → feature-extract each image payload.

    Decoder + 'model' built once per actor (detect.py:73 pattern).
    Output: (media_id, width, height, feature:list<float>(8), error).
    Corrupt payloads are captured per row, not fatal (the reference's
    per-file try/except, media.py:289-307) — the errors side-table
    pattern of media-attrs.py:79-92.

    ``real_decoder=True`` uses the pure-numpy :class:`BmpDecoder`
    (real 24-bit BMP parsing); False keeps the deterministic fake for
    payloads that aren't real images (e.g. text lifted to bytes).
    """

    def __init__(self, real_decoder: bool = False):
        self.decoder = BmpDecoder() if real_decoder else FakeImageDecoder()

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


class BmpFeatureStage:
    """Actor-pool stage over REAL BMP payloads: decode with
    :class:`BmpDecoder` (built once per actor), emit dimensions from
    the actual header and exact per-channel means (integer pixel sums
    ÷ pixel count — exact in float64 for any image under 2^53 total).
    Corrupt payloads become poison rows (error set, zero dims)."""

    def __init__(self):
        self.decoder = BmpDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, mr, mg, mb, errs = [], [], [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            ids.append(mid)
            try:
                img = self.decoder.decode(payload)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                n = img.shape[0] * img.shape[1]
                mr.append(s[0] / n)
                mg.append(s[1] / n)
                mb.append(s[2] / n)
                errs.append(None)
            except Exception as e:
                ws.append(0)
                hs.append(0)
                mr.append(np.nan)
                mg.append(np.nan)
                mb.append(np.nan)
                errs.append(str(e))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "mean_r": pa.array(mr, pa.float64()),
            "mean_g": pa.array(mg, pa.float64()),
            "mean_b": pa.array(mb, pa.float64()),
            "error": pa.array(errs, pa.string()),
        })


def bmp_image_features(ds, *, concurrency=None, batch_size: int = 64):
    """Real-decode feature extraction over (media_id, payload) BMP
    rows (small batches: binary payloads are wide)."""
    from ..runtime import actor_pool
    return ds.map_batches(BmpFeatureStage, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=concurrency or actor_pool())


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


def image_ahash(img: np.ndarray) -> int:
    """64-bit average hash of an (H, W, 3) image (the perceptual-hash
    family of the reference's skip-phash, im_utils.py:37-47 — aHash
    instead of DCT-pHash, same near-dup contract).  The image block-
    averages to an 8×8 grid (exact integer sums; H and W must be
    multiples of 8) and bit (r, c) = cell_sum·64 > total_sum — an
    INTEGER compare, so the hash is exactly reproducible anywhere."""
    h, w, _ = img.shape
    if h % 8 or w % 8:
        raise ValueError("image_ahash wants H, W multiples of 8")
    g = img.sum(axis=2, dtype=np.int64)           # gray proxy: r+g+b
    cells = g.reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
    total = int(cells.sum())
    bits = (cells.reshape(-1) * 64 > total)
    return int(np.packbits(bits).view(">u8")[0])


class ImageAhashStage:
    """Actor-pool stage: REAL decode (BMP) → average hash + full pixel
    digest per payload; corrupt payloads → poison rows (hash 0, error
    set).  The ahash CO-LOCATES candidates; the md5 of the decoded RGB
    bytes DECIDES equality (the dup_chunk_fraction rule: a 64-bit
    threshold-hash collision can only co-locate two innocent groups,
    never create a false duplicate) — and because the digest is over
    PIXELS, the same image stored as BMP and PNG would still match."""

    def __init__(self):
        self.decoder = BmpDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib
        ids, hashes, digs, errs = [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            ids.append(mid)
            try:
                img = self.decoder.decode(payload)
                hashes.append(image_ahash(img))
                digs.append(hashlib.md5(
                    img.shape[1].to_bytes(4, "big")
                    + img.tobytes()).hexdigest())
                errs.append(None)
            except Exception as e:
                hashes.append(0)
                digs.append("")
                errs.append(str(e))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "ahash": pa.array(np.array(hashes, np.uint64)),
            "pix_digest": pa.array(digs, pa.string()),
            "error": pa.array(errs, pa.string()),
        })


def image_dup_pairs(ds, *, concurrency=None, batch_size: int = 64):
    """Exact-duplicate image pairs by average hash — the skip-phash
    dedup made REAL: decode each payload (actor pool), hash, ONE
    hash(ahash)-bucketed exchange co-locates equal hashes, each bucket
    emits its groups' id pairs (pair count bounded by duplicate-group
    size, never corpus size; a pathological single hash shared by
    millions of images would need the star-fallback guard of
    minhash_candidates — same trade, documented).

    Returns Dataset (id_a, id_b) with id_a < id_b."""
    from ..runtime import actor_pool, arrow_group, int_bucket_of, \
        num_hash_buckets
    import pandas as pd
    nb = num_hash_buckets(None)

    hashed = ds.map_batches(ImageAhashStage, batch_format="pyarrow",
                            batch_size=batch_size,
                            concurrency=concurrency or actor_pool())

    def bucket(t: pa.Table) -> pa.Table:
        ok = pa.compute.is_null(t["error"])
        t = t.filter(ok)
        h = t["ahash"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64).astype(np.int64)
        return pa.table({
            "__b": pa.array(int_bucket_of(h, nb)),
            "media_id": t["media_id"],
            "pix_digest": t["pix_digest"]})

    def pairs(g: pd.DataFrame) -> pa.Table:
        # identical pixels => identical ahash => same bucket; the
        # digest grouping inside the bucket is therefore globally exact
        out_a, out_b = [], []
        for _, grp in g.groupby("pix_digest", sort=False):
            ids = sorted(grp["media_id"])
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return arrow_group(pd.DataFrame({"id_a": out_a, "id_b": out_b}))

    return hashed.map_batches(bucket, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("__b").map_groups(pairs, batch_format="pandas")
