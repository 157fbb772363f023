"""Full index lifecycle integration: build → extend → delete →
snapshot → compact, with ranking checked at every step against fresh
ground-truth builds."""

import ray.data

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index, delete_docs, extend_index
from vframe_ray.index.compact import compact_index
from vframe_ray.index.merge import snapshot_index
from vframe_ray.index.query import search_index

Q = [{"query_id": 0, "query_text": "apple banana", "k": 50},
     {"query_id": 1, "query_text": "cherry", "k": 50}]


def _rows(ids, salt=""):
    out = []
    for i in ids:
        words = ["apple"] * (i % 3 + 1) + ["banana"] * (i % 2) \
            + (["cherry"] if i % 4 == 0 else [])
        out.append({"conv_id": f"c{salt}{i:03d}", "turn_idx": 0,
                    "text": " ".join(words)})
    return out


def test_full_lifecycle(ray_session, tmp_path):
    a = _rows(range(20))
    b = _rows(range(20, 32), salt="x")

    # 1. build on A
    idx = str(tmp_path / "life_idx")
    build_index(ray.data.from_items(a), idx, SMALL_CFG)

    # 2. extend with B == fresh build on A∪B (rank-identical)
    extend_index(ray.data.from_items(b), idx)
    fresh_ab = str(tmp_path / "life_fresh_ab")
    build_index(ray.data.from_items(a + b), fresh_ab, SMALL_CFG)
    assert search_index(idx, Q).to_pylist() == \
        search_index(fresh_ab, Q).to_pylist()

    # 3. snapshot, then tombstone some conversations in the ORIGINAL
    snap = str(tmp_path / "life_snap")
    snapshot_index(idx, snap)
    before = search_index(idx, Q).to_pylist()
    dels = ["c000", "c004", "cx020"]
    delete_docs(idx, dels)
    after = search_index(idx, Q).to_pylist()
    gone = {r["conv_id"] for r in before} - {r["conv_id"] for r in after}
    assert gone == set(dels)                    # all three matched Q
    assert search_index(snap, Q).to_pylist() == before   # isolated

    # 4. compact purges tombstones physically; ranking == a fresh build
    # on the surviving corpus (stats post-purge)
    compacted = str(tmp_path / "life_compact")
    compact_index(idx, compacted, target_segments=2)
    surviving = [r for r in a + b if r["conv_id"] not in dels]
    fresh_surv = str(tmp_path / "life_fresh_surv")
    build_index(ray.data.from_items(surviving), fresh_surv, SMALL_CFG)
    assert search_index(compacted, Q).to_pylist() == \
        search_index(fresh_surv, Q).to_pylist()
