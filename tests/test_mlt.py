"""More-like-this term selection and seed exclusion."""

import ray.data

from tests.util import SMALL_CFG
from vframe_ray.index.build import build_index
from vframe_ray.index.query import more_like_this_index, search_index


def test_mlt_selects_informative_terms_and_excludes_seed(ray_session,
                                                         tmp_path):
    # 'common' appears everywhere (low idf); 'rare' only in seed+c3
    docs = {
        "c0": "common rare rare topic",
        "c1": "common filler words here",
        "c2": "common other filler",
        "c3": "rare topic common",
        "c4": "topic words",
    }
    ds = ray.data.from_items([
        {"conv_id": c, "turn_idx": 0, "text": t} for c, t in docs.items()])
    idx = str(tmp_path / "mlt_idx")
    build_index(ds, idx, SMALL_CFG)

    # seed = c0's text, keep only the 2 most informative terms:
    # rare (tf=2, df=2) and topic (tf=1, df=3) beat common (df=5)
    res = more_like_this_index(idx, [
        {"query_id": 0, "text": docs["c0"], "k": 3,
         "exclude": ("c0", 0)}], max_query_terms=2)
    rows = res.to_pylist()
    assert all(r["conv_id"] != "c0" for r in rows)       # seed excluded
    # equivalent manual query over the selected terms, minus the seed
    want = [r for r in search_index(
        idx, [{"query_id": 0, "query_text": "rare topic", "k": 4}]
    ).to_pylist() if r["conv_id"] != "c0"]
    assert [(r["conv_id"], r["score"]) for r in rows] == \
        [(r["conv_id"], r["score"]) for r in want]
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
