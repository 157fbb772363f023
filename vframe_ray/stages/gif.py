"""Real GIF codec — the COMPRESSED media format, no external libraries.

BMP/WAV/AVI (stages/multimodal.py) cover the uncompressed formats;
GIF's image data is LZW-compressed, so decoding it exercises a real
entropy-coded bitstream: little-endian variable-width codes, CLEAR /
END control codes, dictionary growth with width bumps at 2^w up to 12
bits, and 255-byte sub-block reassembly.  The encoder emits literal
codes with periodic CLEAR resets (the classic always-valid LZW stream
— every decoder accepts it; a compressing encoder would only change
this function), so encode→decode round-trips exactly and the reference
analogs become real:

- ``pipe save-gif`` (save-gif.py:41-142, accumulate frames per group,
  flush an animated GIF on group change) → :func:`write_gifs`, a
  ``groupby(media_id).map_groups`` sink writing REAL animated GIFs.
- frame iteration (media.py:343-384) → :class:`GifFrameStage`, one
  output row per decoded frame.

Scope: GIF87a/89a, global or local color tables, Graphic Control /
Application / Comment extensions, multi-frame animation.  Interlaced
images raise (documented, like the 24-bit-only BMP rule).  Frames
are full-canvas replace (disposal semantics beyond that raise).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Decode a GIF LZW code stream (already de-sub-blocked) into
    palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated LZW stream (no END code)")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    raise AssertionError  # unreachable


def _lzw_encode_literals(indices: np.ndarray, min_code_size: int
                         ) -> bytes:
    """Always-valid LZW stream: CLEAR, then literal codes with a CLEAR
    re-emitted just before the decoder's table would outgrow the
    initial width (so the width never bumps).  ~1 byte overhead per
    2^mcs−2 pixels; correctness over ratio."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    # decoder table: clear+2 entries after reset, +1 per emitted code
    # (the first code after CLEAR adds nothing) — reset while the
    # table still fits the width
    budget = (1 << width) - (clear + 2) - 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    since = 0
    for v in indices:
        if since > budget:
            emit(clear)
            since = 0
        emit(int(v))
        since += 1
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    chunks = []
    for i in range(0, len(data), 255):
        part = data[i:i + 255]
        chunks.append(bytes([len(part)]) + part)
    return b"".join(chunks) + b"\x00"


GIF_PALETTE_BITS = 7                       # 128 grayscale entries


def gif_encode(frames: "list[np.ndarray]", delay_cs: int = 5) -> bytes:
    """Encode (H, W) uint8 palette-index frames (values < 128; the
    color table maps i → gray (i, i, i) scaled ×2) as a REAL animated
    GIF89a with NETSCAPE looping and per-frame Graphic Control delay.
    Round-trips exactly through :class:`GifDecoder`."""
    if not frames:
        raise ValueError("gif_encode wants >= 1 frame")
    h, w = frames[0].shape
    if any(f.shape != (h, w) or f.dtype != np.uint8 or f.max() >= 128
           for f in frames):
        raise ValueError("gif_encode wants uniform (H, W) uint8 < 128")
    mcs = GIF_PALETTE_BITS
    pal = bytes(b for i in range(1 << mcs)
                for b in (min(2 * i, 255),) * 3)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h,
                       0x80 | ((mcs - 1) << 4) | (mcs - 1), 0, 0)
    out += pal
    out += (b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")
    for f in frames:
        # 21 F9 size=4 | flags delay(lo,hi) transparent | terminator
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, delay_cs, 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(mcs)
        out += _sub_blocks(_lzw_encode_literals(f.reshape(-1), mcs))
    out.append(0x3B)
    return bytes(out)


class GifDecoder:
    """Real GIF87a/89a decode: header + color tables + extension walk +
    per-image LZW.  Returns (frames list of (H, W, 3) uint8 RGB,
    delay_cs of the last Graphic Control Extension seen, or 0)."""

    def decode(self, payload: bytes):
        if not payload:
            raise ValueError("empty payload (corrupt media)")
        if len(payload) < 13 or payload[:6] not in (b"GIF87a",
                                                    b"GIF89a"):
            raise ValueError("not a GIF payload")
        w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = np.frombuffer(payload, np.uint8, count=3 * n,
                                offset=pos).reshape(n, 3)
            pos += 3 * n
        frames: list[np.ndarray] = []
        delay = 0
        while pos < len(payload):
            b = payload[pos]
            pos += 1
            if b == 0x3B:                   # trailer
                break
            if b == 0x21:                   # extension
                label = payload[pos]
                pos += 1
                if label == 0xF9:
                    size = payload[pos]
                    if size >= 3:
                        delay, = struct.unpack_from(
                            "<H", payload, pos + 2)
                while True:                 # skip sub-blocks
                    size = payload[pos]
                    pos += 1 + size
                    if size == 0:
                        break
            elif b == 0x2C:                 # image descriptor
                left, top, iw, ih, ipk = struct.unpack_from(
                    "<HHHHB", payload, pos)
                pos += 9
                if ipk & 0x40:
                    raise ValueError("interlaced GIF not supported")
                if (left, top, iw, ih) != (0, 0, w, h):
                    raise ValueError("partial-canvas GIF frame not "
                                     "supported")
                pal = gct
                if ipk & 0x80:
                    n = 2 << (ipk & 0x07)
                    pal = np.frombuffer(payload, np.uint8, count=3 * n,
                                        offset=pos).reshape(n, 3)
                    pos += 3 * n
                if pal is None:
                    raise ValueError("GIF image without a color table")
                mcs = payload[pos]
                pos += 1
                data = bytearray()
                while True:
                    size = payload[pos]
                    pos += 1
                    if size == 0:
                        break
                    data += payload[pos:pos + size]
                    pos += size
                    if pos > len(payload):
                        raise ValueError("truncated GIF data")
                idx = np.frombuffer(_lzw_decode(bytes(data), mcs),
                                    np.uint8)
                if idx.size < iw * ih:
                    raise ValueError("LZW output shorter than frame")
                if int(idx.max()) >= len(pal):
                    raise ValueError("palette index out of range")
                frames.append(pal[idx[:iw * ih]].reshape(ih, iw, 3)
                              .copy())
            else:
                raise ValueError(f"unknown GIF block 0x{b:02x}")
        if not frames:
            raise ValueError("GIF contains no image")
        return frames, delay


class GifFrameStage:
    """Actor-pool frame fan-out over REAL GIF payloads (one output row
    per frame; the save-gif inverse).  Corrupt payloads become a
    single poison row with frame_idx −1."""

    def __init__(self):
        self.decoder = GifDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, nf, dly, ws, hs, mg, errs = ([] for _ in range(8))
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            try:
                frames, delay = self.decoder.decode(payload)
                for i, f in enumerate(frames):
                    ids.append(mid)
                    fidx.append(i)
                    nf.append(len(frames))
                    dly.append(delay)
                    hs.append(f.shape[0])
                    ws.append(f.shape[1])
                    mg.append(int(f[:, :, 1].sum(dtype=np.int64))
                              / (f.shape[0] * f.shape[1]))
                    errs.append(None)
            except Exception as e:
                ids.append(mid)
                fidx.append(-1)
                nf.append(0)
                dly.append(0)
                ws.append(0)
                hs.append(0)
                mg.append(np.nan)
                errs.append(str(e))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "n_frames": pa.array(nf, pa.int32()),
            "delay_cs": pa.array(dly, pa.int32()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "mean_g": pa.array(mg, pa.float64()),
            "error": pa.array(errs, pa.string()),
        })


def gif_frame_features(ds, *, concurrency=None, batch_size: int = 16):
    """Real-decode frame fan-out over (media_id, payload) GIF rows."""
    from ..runtime import actor_pool
    return ds.map_batches(GifFrameStage, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=concurrency or actor_pool())


def write_gifs(ds, out_dir: str, *, delay_cs: int = 5):
    """The ``pipe save-gif`` analog on a REAL format: group frame rows
    (media_id, frame_idx, frame:binary of (H, W) uint8 indices +
    shape columns h, w) per media_id and flush ONE animated GIF per
    group (group-change flush ≡ groupby().map_groups, save-gif.py:
    41-142).  Returns the (media_id, path, n_frames) manifest."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def flush(g) -> pa.Table:
        g = g.sort_values("frame_idx")
        mid = str(g["media_id"].iloc[0])
        frames = [np.frombuffer(buf, np.uint8).reshape(h_, w_)
                  for buf, h_, w_ in zip(g["frame"], g["h"], g["w"])]
        path = os.path.join(out_dir, f"{mid}.gif")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(gif_encode(frames, delay_cs=delay_cs))
        os.replace(tmp, path)
        return pa.table({"media_id": pa.array([mid], pa.string()),
                         "path": pa.array([path], pa.string()),
                         "n_frames": pa.array([len(frames)],
                                              pa.int64())})

    return ds.groupby("media_id").map_groups(flush,
                                             batch_format="pandas")
