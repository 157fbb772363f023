"""Real GIF codec (LZW): exact roundtrip incl. multi-sub-block frames
and CLEAR resets, extension/corruption handling, frame fan-out, and
the save-gif-analog group-flush sink."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from vframe_ray.stages.gif import (GifDecoder, gif_encode,
                                   gif_frame_features, write_gifs)


def _gray(idx):
    return np.minimum(2 * idx.astype(np.int64), 255).astype(np.uint8)


@pytest.mark.parametrize("w,h,n", [(1, 1, 1), (8, 8, 3), (50, 40, 2),
                                   (255, 3, 1)])
def test_gif_roundtrip_exact(w, h, n):
    """Large frames force 255-byte sub-block splits AND periodic LZW
    CLEAR resets — the decode must resynchronize through both."""
    rng = np.random.default_rng(w * h + n)
    frames = [rng.integers(0, 128, (h, w), dtype=np.uint8)
              for _ in range(n)]
    out, delay = GifDecoder().decode(gif_encode(frames, delay_cs=9))
    assert delay == 9 and len(out) == n
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(b[:, :, 0], _gray(a))
        np.testing.assert_array_equal(b[:, :, 1], _gray(a))


def test_gif_corrupt_rejected():
    d = GifDecoder()
    good = gif_encode([np.zeros((4, 4), np.uint8)])
    with pytest.raises(ValueError, match="empty"):
        d.decode(b"")
    with pytest.raises(ValueError, match="not a GIF"):
        d.decode(b"JIF89a" + good[6:])
    with pytest.raises(ValueError, match="no image"):
        d.decode(good[:13 + 3 * 128] + b"\x3b")
    # interlace flag set in the image descriptor (structural offset:
    # header 13 + palette 384 + NETSCAPE ext 19 + GCE 8)
    bad = bytearray(good)
    idx = 13 + 3 * 128 + 19 + 8
    assert bad[idx] == 0x2C
    bad[idx + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        d.decode(bytes(bad))


def test_gif_lzw_stream_hostile():
    """A frame of one repeated value compresses to long literal runs;
    a ramp exercises every code; both must survive CLEAR boundaries."""
    d = GifDecoder()
    flat = np.full((31, 33), 77, np.uint8)
    out, _ = d.decode(gif_encode([flat]))
    assert (out[0][:, :, 0] == 154).all()
    ramp = (np.arange(31 * 33, dtype=np.int64) % 128).astype(np.uint8) \
        .reshape(31, 33)
    out2, _ = d.decode(gif_encode([ramp]))
    np.testing.assert_array_equal(out2[0][:, :, 2], _gray(ramp))


def test_gif_frame_fanout(ray_session):
    import ray.data
    f = [np.full((2, 3), v, np.uint8) for v in (10, 20)]
    t = pa.table({
        "media_id": pa.array(["g", "bad"], pa.string()),
        "payload": pa.array([gif_encode(f, delay_cs=4), b"nope"],
                            pa.binary())})
    rows = gif_frame_features(ray.data.from_arrow(t)).to_pandas()
    g = rows[rows["media_id"] == "g"].sort_values("frame_idx")
    assert list(g["frame_idx"]) == [0, 1]
    assert list(g["mean_g"]) == [20.0, 40.0]
    assert (g["delay_cs"] == 4).all()
    assert rows[rows["media_id"] == "bad"]["error"].iloc[0] is not None


def test_write_gifs_group_flush(ray_session, tmp_path):
    """save-gif analog: frame rows grouped per media_id flush one REAL
    animated GIF each; re-decoding recovers the frames in order."""
    import ray.data
    rows = []
    for mid, vals in (("a", [1, 2, 3]), ("b", [9])):
        for i, v in enumerate(vals):
            fr = np.full((3, 4), v, np.uint8)
            rows.append({"media_id": mid, "frame_idx": i,
                         "frame": fr.tobytes(), "h": 3, "w": 4})
    # shuffled input: the sink must restore frame order per group
    manifest = write_gifs(ray.data.from_items(rows[::-1]),
                          str(tmp_path / "gifs")).to_pandas() \
        .set_index("media_id")
    assert manifest.loc["a", "n_frames"] == 3
    frames, _ = GifDecoder().decode(
        open(manifest.loc["a", "path"], "rb").read())
    assert [int(f[0, 0, 0]) for f in frames] == [2, 4, 6]
    frames_b, _ = GifDecoder().decode(
        open(manifest.loc["b", "path"], "rb").read())
    assert len(frames_b) == 1 and frames_b[0][0, 0, 0] == 18
