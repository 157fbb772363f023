"""Real PNG codec: exact roundtrip, ALL FIVE filter types unfiltered
correctly (hand-built filtered streams), CRC/zlib/structure corruption
rejection, RGBA alpha drop, and the actor-pool feature stage."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from vframe_ray.stages.png import (PngDecoder, png_encode,
                                   png_image_features)


def _chunk(t, d):
    return struct.pack(">I", len(d)) + t + d \
        + struct.pack(">I", zlib.crc32(t + d))


def _build_png(img, ftypes, color=2):
    """Hand-apply the given filter type per row (the encoder only
    emits 0, so this is how Sub/Up/Average/Paeth get exercised)."""
    h, w, ch = img.shape
    raw = bytearray()
    prev = np.zeros(w * ch, np.int64)
    for y, ft in zip(range(h), ftypes):
        cur = img[y].reshape(-1).astype(np.int64)
        raw.append(ft)
        if ft == 0:
            line = cur
        elif ft == 1:
            line = cur.copy()
            line[ch:] = (cur[ch:] - cur[:-ch]) % 256
        elif ft == 2:
            line = (cur - prev) % 256
        elif ft == 3:
            line = np.zeros(w * ch, np.int64)
            for x in range(w * ch):
                a = cur[x - ch] if x >= ch else 0
                line[x] = (cur[x] - ((a + prev[x]) >> 1)) % 256
        else:
            def paeth(a, b, c):
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                if pa_ <= pb and pa_ <= pc_:
                    return a
                return b if pb <= pc_ else c
            line = np.zeros(w * ch, np.int64)
            for x in range(w * ch):
                a = cur[x - ch] if x >= ch else 0
                c = prev[x - ch] if x >= ch else 0
                line[x] = (cur[x] - paeth(a, prev[x], c)) % 256
        raw += bytes(line.astype(np.uint8))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("w,h", [(1, 1), (5, 7), (16, 16), (255, 2)])
def test_png_roundtrip_exact(w, h):
    rng = np.random.default_rng(w + h)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    np.testing.assert_array_equal(PngDecoder().decode(png_encode(img)),
                                  img)


def test_png_all_filter_types():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    out = PngDecoder().decode(_build_png(img, [0, 1, 2, 3, 4]))
    np.testing.assert_array_equal(out, img)


def test_png_rgba_alpha_dropped():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (3, 4, 4), dtype=np.uint8)
    out = PngDecoder().decode(_build_png(img, [0, 0, 0], color=6))
    np.testing.assert_array_equal(out, img[:, :, :3])


def test_png_corrupt_rejected():
    d = PngDecoder()
    good = png_encode(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="empty"):
        d.decode(b"")
    with pytest.raises(ValueError, match="not a PNG"):
        d.decode(b"\x89PNX" + good[4:])
    # flip a byte inside IDAT: the chunk CRC must catch it
    bad = bytearray(good)
    bad[8 + 25 + 8 + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        d.decode(bytes(bad))
    # valid CRC but broken zlib stream
    broken = (good[:8 + 25]
              + _chunk(b"IDAT", b"notzlib") + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="zlib"):
        d.decode(broken)


def test_png_feature_stage(ray_session):
    import ray.data
    t = pa.table({
        "media_id": pa.array(["a", "bad"], pa.string()),
        "payload": pa.array(
            [png_encode(np.full((2, 2, 3), 40, np.uint8)), b"JUNK"],
            pa.binary())})
    out = png_image_features(ray.data.from_arrow(t)).to_pandas() \
        .set_index("media_id")
    assert out.loc["a", "mean_g"] == 40.0
    assert out.loc["a", "width"] == 2
    assert out.loc["bad", "error"] is not None
