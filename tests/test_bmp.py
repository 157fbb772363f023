"""Pure-numpy BMP codec: exact encode→decode roundtrip at hostile
widths (row padding), bottom-up vs top-down row order, corrupt-payload
rejection, and the actor-pool feature stage with poison rows."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from vframe_ray.stages.multimodal import (BmpDecoder, bmp_encode,
                                          bmp_image_features)


@pytest.mark.parametrize("w,h", [(1, 1), (5, 3), (6, 2), (7, 7),
                                 (8, 8), (13, 4), (64, 1)])
def test_roundtrip_exact(w, h):
    rng = np.random.default_rng(w * 100 + h)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = BmpDecoder().decode(bmp_encode(img))
    np.testing.assert_array_equal(out, img)


def test_row_order_and_channels():
    """An asymmetric image proves rows aren't upside down and channels
    aren't swapped after the BGR/bottom-up round trip."""
    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = [255, 0, 0]      # top-left red
    img[1, 1] = [0, 0, 255]      # bottom-right blue
    out = BmpDecoder().decode(bmp_encode(img))
    assert list(out[0, 0]) == [255, 0, 0]
    assert list(out[1, 1]) == [0, 0, 255]


def test_top_down_bmp():
    """Negative height = top-down row order (valid BMP variant)."""
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = bytearray(bmp_encode(img))
    # flip height to negative and reorder rows to top-down
    h = struct.unpack_from("<i", payload, 22)[0]
    struct.pack_into("<i", payload, 22, -h)
    offset = struct.unpack_from("<I", payload, 10)[0]
    stride = (3 * 3 + 3) // 4 * 4
    rows = [bytes(payload[offset + i * stride:
                          offset + (i + 1) * stride])
            for i in range(h)]
    payload[offset:] = b"".join(reversed(rows))
    out = BmpDecoder().decode(bytes(payload))
    np.testing.assert_array_equal(out, img)


def test_corrupt_payloads_rejected():
    d = BmpDecoder()
    good = bmp_encode(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="empty"):
        d.decode(b"")
    with pytest.raises(ValueError, match="not a BMP"):
        d.decode(b"PNG" + good[3:])
    with pytest.raises(ValueError, match="truncated"):
        d.decode(good[:-5])
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 32)
    with pytest.raises(ValueError, match="bpp=32"):
        d.decode(bytes(bad_bpp))


def test_feature_stage_poison_rows(ray_session):
    import ray.data
    imgs = [bmp_encode(np.full((2, 2, 3), v, np.uint8))
            for v in (10, 200)]
    t = pa.table({
        "media_id": pa.array(["a", "b", "bad"], pa.string()),
        "payload": pa.array(imgs + [b"JUNK"], pa.binary())})
    out = bmp_image_features(ray.data.from_arrow(t)).to_pandas() \
        .set_index("media_id")
    assert out.loc["a", "mean_r"] == 10.0
    assert out.loc["b", "mean_b"] == 200.0
    assert out.loc["a", "width"] == 2 and out.loc["a", "height"] == 2
    assert out.loc["bad", "error"] is not None
    assert np.isnan(out.loc["bad", "mean_r"])


# ---- WAV (PCM16) codec ----

from vframe_ray.stages.multimodal import (WavDecoder,  # noqa: E402
                                          wav_audio_features, wav_encode)


@pytest.mark.parametrize("shape", [(16,), (33,), (16, 2), (7, 3)])
def test_wav_roundtrip_exact(shape):
    rng = np.random.default_rng(sum(shape))
    s = rng.integers(-32768, 32768, size=shape).astype(np.int16)
    out, sr = WavDecoder().decode(wav_encode(s, 44100))
    assert sr == 44100
    np.testing.assert_array_equal(out, s.reshape(out.shape))


def test_wav_extra_chunk_between_fmt_and_data():
    """LIST/INFO chunks between fmt and data are legal — the chunk
    walk must skip them (incl. the odd-size word-alignment pad)."""
    s = np.arange(8, dtype=np.int16)
    payload = wav_encode(s)
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # pad
    doctored = payload[:fmt_end] + extra + payload[fmt_end:]
    # fix the RIFF size
    doctored = (doctored[:4]
                + struct.pack("<I", len(doctored) - 8) + doctored[8:])
    out, sr = WavDecoder().decode(doctored)
    np.testing.assert_array_equal(out[:, 0], s)


def test_wav_corrupt_rejected():
    d = WavDecoder()
    good = wav_encode(np.zeros(4, np.int16))
    with pytest.raises(ValueError, match="empty"):
        d.decode(b"")
    with pytest.raises(ValueError, match="not a WAV"):
        d.decode(b"RIFX" + good[4:])
    bad_bits = bytearray(good)
    struct.pack_into("<H", bad_bits, 12 + 8 + 14, 8)
    with pytest.raises(ValueError, match="bits=8"):
        d.decode(bytes(bad_bits))
    with pytest.raises(ValueError, match="truncated"):
        d.decode(good[:-3])


def test_wav_feature_stage(ray_session):
    import ray.data
    t = pa.table({
        "media_id": pa.array(["a", "bad"], pa.string()),
        "payload": pa.array(
            [wav_encode(np.array([-100, 50, 150, -200], np.int16),
                        16000), b"nope"], pa.binary())})
    out = wav_audio_features(ray.data.from_arrow(t)).to_pandas() \
        .set_index("media_id")
    assert out.loc["a", "n_samples"] == 4
    assert out.loc["a", "sample_rate"] == 16000
    assert out.loc["a", "peak"] == 200
    assert out.loc["a", "mean_val"] == (-100 + 50 + 150 - 200) / 4
    assert out.loc["bad", "error"] is not None


# ---- AVI (uncompressed DIB) codec ----

from vframe_ray.stages.multimodal import (AviDecoder,  # noqa: E402
                                          avi_encode, frame_sample,
                                          video_frame_features)


@pytest.mark.parametrize("w,h,n", [(5, 3, 1), (8, 8, 4), (7, 2, 3)])
def test_avi_roundtrip_exact(w, h, n):
    rng = np.random.default_rng(w + h + n)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
              for _ in range(n)]
    out, fps = AviDecoder().decode(avi_encode(frames, fps=24))
    assert fps == 24.0 and len(out) == n
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)


def test_avi_corrupt_rejected():
    d = AviDecoder()
    good = avi_encode([np.zeros((4, 4, 3), np.uint8)])
    with pytest.raises(ValueError, match="not an AVI"):
        d.decode(b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE")
    with pytest.raises(ValueError, match="truncated"):
        d.decode(good[:-7])
    bad = bytearray(good)
    # flip the strf compression dword to BI_RLE8 (=1)
    idx = good.index(b"strf") + 8 + 16
    struct.pack_into("<I", bad, idx, 1)
    with pytest.raises(ValueError, match="compression=1"):
        d.decode(bytes(bad))


def test_video_frame_fanout_and_decimation(ray_session):
    import ray.data
    f0 = np.full((2, 2, 3), 10, np.uint8)
    f1 = np.full((2, 2, 3), 20, np.uint8)
    f2 = np.full((2, 2, 3), 30, np.uint8)
    t = pa.table({
        "media_id": pa.array(["v", "bad"], pa.string()),
        "payload": pa.array([avi_encode([f0, f1, f2], fps=5),
                             b"garbage"], pa.binary())})
    rows = video_frame_features(ray.data.from_arrow(t)).to_pandas()
    v = rows[rows["media_id"] == "v"].sort_values("frame_idx")
    assert list(v["frame_idx"]) == [0, 1, 2]
    assert list(v["mean_b"]) == [10.0, 20.0, 30.0]
    assert (v["fps"] == 5.0).all() and (v["n_frames"] == 3).all()
    bad = rows[rows["media_id"] == "bad"]
    assert list(bad["frame_idx"]) == [-1]
    assert bad["error"].iloc[0] is not None
    # skip-interval decimation drops the middle frame
    kept = frame_sample(
        video_frame_features(ray.data.from_arrow(t)), every_n=2) \
        .to_pandas()
    kv = kept[kept["media_id"] == "v"]
    assert sorted(kv["frame_idx"]) == [0, 2]


# ---- image near-dup (ahash co-locate, pixel digest decide) ----

from vframe_ray.stages.multimodal import (image_ahash,  # noqa: E402
                                          image_dup_pairs)


def test_ahash_block_average_and_laws():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    assert image_ahash(img) == image_ahash(img)
    # upscaling each pixel to a 2x2 block leaves cell averages (and
    # the hash) unchanged
    up = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    assert image_ahash(up) == image_ahash(img)
    with pytest.raises(ValueError, match="multiples of 8"):
        image_ahash(rng.integers(0, 256, (9, 8, 3), dtype=np.uint8))


def test_image_dup_pairs_digest_decides(ray_session):
    """Two identical images pair up; a third with a DIFFERENT pattern
    forced into the same ahash bucket must not (digest rule); corrupt
    rows drop out."""
    import ray.data
    rng = np.random.default_rng(8)
    a = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    b = a.copy()
    c = a.copy()
    c[0, 0, 0] ^= 1          # near-identical: ahash almost surely
    #                          equal, pixels differ -> NOT a pair
    t = pa.table({
        "media_id": pa.array(["a1", "a2", "c", "bad"], pa.string()),
        "payload": pa.array([bmp_encode(a), bmp_encode(b),
                             bmp_encode(c), b"x"], pa.binary())})
    out = image_dup_pairs(ray.data.from_arrow(t)).to_pandas()
    assert [tuple(r) for r in out[["id_a", "id_b"]].to_numpy()] \
        == [("a1", "a2")]
