"""Index merge: two half-corpus indexes merged == oracle on the full
corpus (rank-identical), mirroring the reference's shard-then-merge-json
workflow."""

import pyarrow.compute as pc

from tests.util import SMALL_CFG
from vframe_ray.corpus import generate_queries
from vframe_ray.index.build import build_index, load_index_meta
from vframe_ray.index.merge import merge_indexes
from vframe_ray.index.query import search_index
from vframe_ray.sources.readers import read_transcripts


def test_merged_shards_rank_identical(ray_session, small_corpus_dir,
                                      small_oracle, tmp_path):
    convs = sorted({k[0] for k in small_oracle.doc_keys})
    pivot = convs[len(convs) // 2]

    ds_a = read_transcripts(small_corpus_dir,
                            columns=["conv_id", "turn_idx", "text"]) \
        .map_batches(lambda t: t.filter(pc.less(t["conv_id"], pivot)),
                     batch_format="pyarrow")
    ds_b = read_transcripts(small_corpus_dir,
                            columns=["conv_id", "turn_idx", "text"]) \
        .map_batches(lambda t: t.filter(
            pc.greater_equal(t["conv_id"], pivot)), batch_format="pyarrow")

    dir_a, dir_b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(ds_a, dir_a, SMALL_CFG)
    build_index(ds_b, dir_b, SMALL_CFG)

    out = str(tmp_path / "merged")
    stats = merge_indexes([dir_a, dir_b], out)
    assert stats["n_docs"] == small_oracle.n_docs
    assert stats["total_len"] == small_oracle.total_len
    _, _, segs = load_index_meta(out)
    assert len(segs) == 2 * SMALL_CFG.index.num_segments

    queries = generate_queries(n_terms=800)[:8]
    res = search_index(out, queries)
    got: dict[int, list] = {}
    for r in res.to_pylist():
        got.setdefault(r["query_id"], []).append(
            (r["conv_id"], r["turn_idx"], r["score"]))
    for q in queries:
        exp = [(h.conv_id, h.turn_idx, h.score)
               for h in small_oracle.search(q["query_text"], q["k"])]
        assert got.get(q["query_id"], []) == exp, q["query_text"]


def test_merge_rejects_mismatched_configs(ray_session, small_index_dir,
                                          tmp_path):
    import json
    import os
    import shutil
    import pytest
    other = str(tmp_path / "other")
    shutil.copytree(small_index_dir, other)
    cfg_path = os.path.join(other, "config.json")
    cfg = json.load(open(cfg_path))
    cfg["bm25"]["k1"] = 2.0
    json.dump(cfg, open(cfg_path, "w"))
    with pytest.raises(ValueError, match="bm25"):
        merge_indexes([small_index_dir, other], str(tmp_path / "out"))
