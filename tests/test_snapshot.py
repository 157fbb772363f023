"""Index snapshots: hardlink clone, point-in-time isolation from later
deletes, existing tombstones carried."""

import ray.data

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index, delete_docs
from vframe_ray.index.merge import snapshot_index
from vframe_ray.index.query import search_index

ROWS = [{"conv_id": f"c{i}", "turn_idx": 0,
         "text": "apple banana " + ("cherry " * (i % 3))}
        for i in range(12)]
Q = [{"query_id": 0, "query_text": "apple cherry", "k": 20}]


def test_snapshot_identical_and_isolated(ray_session, tmp_path):
    src = str(tmp_path / "snap_src")
    build_index(ray.data.from_items(ROWS), src, SMALL_CFG)
    snap = str(tmp_path / "snap_dst")
    stats = snapshot_index(src, snap)
    assert stats["n_docs"] == 12 and stats["n_segments"] >= 1

    before = search_index(src, Q).to_pylist()
    assert search_index(snap, Q).to_pylist() == before

    # later deletes in the source must NOT leak into the snapshot
    delete_docs(src, ["c0", "c1", "c2"])
    after = search_index(src, Q).to_pylist()
    assert len(after) == len(before) - 3
    assert search_index(snap, Q).to_pylist() == before


def test_snapshot_carries_existing_tombstones(ray_session, tmp_path):
    src = str(tmp_path / "snap_src2")
    build_index(ray.data.from_items(ROWS), src, SMALL_CFG)
    delete_docs(src, ["c5"])
    want = search_index(src, Q).to_pylist()
    snap = str(tmp_path / "snap_dst2")
    snapshot_index(src, snap)
    assert search_index(snap, Q).to_pylist() == want


def test_snapshot_refuses_overwrite(ray_session, tmp_path):
    import pytest
    src = str(tmp_path / "snap_src3")
    build_index(ray.data.from_items(ROWS), src, SMALL_CFG)
    snap = str(tmp_path / "snap_dst3")
    snapshot_index(src, snap)
    with pytest.raises(ValueError):
        snapshot_index(src, snap)
