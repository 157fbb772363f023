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


def test_extend_heavy_lifecycle_with_tiered_compaction(ray_session,
                                                       tmp_path):
    """N extends + in-place tiered compactions (VERDICT r3 next #4):
    ranking stays identical to a fresh build over the union after every
    tiered round, segment count is driven down by the cascade, and no
    single merge ever read more than tier_size source segments (the
    bounded-per-compaction-wall claim, checked via each merged
    segment's compacted_from lineage)."""
    import json
    import os

    from vframe_ray.index.compact import tiered_compact_index

    idx = str(tmp_path / "tiered_idx")
    batches = [_rows(range(8), salt="a")]
    build_index(ray.data.from_items(batches[0]), idx, SMALL_CFG)
    for i in range(4):                                    # N extends
        nb = _rows(range(8), salt=f"e{i}")
        batches.append(nb)
        extend_index(ray.data.from_items(nb), idx)

    man = json.load(open(os.path.join(idx, "manifest.json")))
    segs_before = len(man["segments"])
    assert segs_before >= 15                     # extend-heavy: many segs

    tier = 4
    stats = tiered_compact_index(idx, tier_size=tier)
    assert stats["merges"] >= 1
    man2 = json.load(open(os.path.join(idx, "manifest.json")))
    assert len(man2["segments"]) < segs_before
    # bounded merge width: every merged segment's lineage ≤ tier_size
    for s in man2["segments"]:
        m = json.load(open(os.path.join(idx, "segments", s,
                                        "manifest.json")))
        assert len(m.get("compacted_from", [])) <= tier
    # rank- and score-identical to a fresh one-shot build on the union
    union = [r for b in batches for r in b]
    fresh = str(tmp_path / "tiered_fresh")
    build_index(ray.data.from_items(union), fresh, SMALL_CFG)
    assert search_index(idx, Q).to_pylist() == \
        search_index(fresh, Q).to_pylist()

    # a second call is a no-op (no tier overflows) and keeps results
    before = search_index(idx, Q).to_pylist()
    stats2 = tiered_compact_index(idx, tier_size=tier)
    assert stats2["rounds"] == 0 and stats2["merges"] == 0
    assert search_index(idx, Q).to_pylist() == before


def test_tiered_compaction_purges_merged_deletes(ray_session, tmp_path):
    """Tombstones in MERGED segments are physically purged and the
    dictionary rebuilt (Lucene delete semantics): after deleting docs
    and tier-merging ALL segments, ranking equals a fresh build over
    the survivors."""
    from vframe_ray.config import EngineConfig, IndexConfig
    from vframe_ray.index.build import delete_docs
    from vframe_ray.index.compact import tiered_compact_index

    one_seg = EngineConfig(index=IndexConfig(num_segments=1,
                                             block_size=32))
    idx = str(tmp_path / "tiered_del_idx")
    # 5 segments of exactly 8 docs each (same log2 bucket → one tier)
    all_rows = _rows(range(8), salt="s0")
    build_index(ray.data.from_items(all_rows), idx, one_seg)
    for i in range(1, 5):
        nb = _rows(range(8), salt=f"s{i}")
        all_rows += nb
        extend_index(ray.data.from_items(nb), idx, num_new_segments=1)
    dels = ["cs0000", "cs2004"]
    delete_docs(idx, dels)
    stats = tiered_compact_index(idx, tier_size=5)
    assert stats["merges"] == 1
    surviving = [r for r in all_rows if r["conv_id"] not in dels]
    fresh = str(tmp_path / "tiered_del_fresh")
    build_index(ray.data.from_items(surviving), fresh, one_seg)
    assert search_index(idx, Q).to_pylist() == \
        search_index(fresh, Q).to_pylist()
