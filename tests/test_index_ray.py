"""Distributed build + query vs the single-process oracle (rank-identity)."""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.util import SMALL_CFG
from vframe_ray.corpus import generate_queries
from vframe_ray.index.build import build_index, load_index_meta
from vframe_ray.index.query import search_index
from vframe_ray.sources.readers import read_transcripts


def test_index_stats_match_oracle(small_index_dir, small_oracle):
    _, stats, seg_dirs = load_index_meta(small_index_dir)
    assert stats["n_docs"] == small_oracle.n_docs
    assert stats["total_len"] == small_oracle.total_len
    assert abs(stats["avgdl"] - small_oracle.avgdl) < 1e-12
    assert len(seg_dirs) == SMALL_CFG.index.num_segments
    # global term stats match oracle df/cf
    gdir = os.path.join(small_index_dir, "global", "terms")
    t = pq.ParquetDataset(gdir).read()
    df_map = dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))
    cf_map = dict(zip(t["term"].to_pylist(), t["cf"].to_pylist()))
    assert len(df_map) == len(small_oracle.postings)
    for term, plist in small_oracle.postings.items():
        assert df_map[term] == len(plist), term
        assert cf_map[term] == sum(tf for _, tf in plist), term


def test_docmaps_cover_corpus_ordered(small_index_dir, small_oracle):
    _, _, seg_dirs = load_index_meta(small_index_dir)
    keys = []
    for d in seg_dirs:
        t = pq.read_table(os.path.join(d, "docs.parquet"))
        seg_keys = list(zip(t["conv_id"].to_pylist(),
                            t["turn_idx"].to_pylist()))
        assert seg_keys == sorted(seg_keys)          # ordered within segment
        assert t["doc_local"].to_pylist() == list(range(len(seg_keys)))
        keys.extend(seg_keys)
    assert sorted(keys) == small_oracle.doc_keys     # exact partition cover


@pytest.mark.parametrize("use_bmw", [False, True])
def test_search_rank_identical_to_oracle(ray_session, small_index_dir,
                                         small_oracle, use_bmw):
    queries = generate_queries(n_terms=800)
    res = search_index(small_index_dir, queries, use_bmw=use_bmw)
    got: dict[int, list] = {}
    for r in res.to_pylist():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["conv_id"], r["turn_idx"], r["score"]))
    for q in queries:
        exp = small_oracle.search(q["query_text"], q["k"])
        g = got.get(q["query_id"], [])
        assert len(g) == len(exp), q["query_text"]
        for (rank, conv, turn, score), h in zip(g, exp):
            assert (conv, turn) == (h.conv_id, h.turn_idx), q["query_text"]
            assert score == h.score, (q["query_text"], score, h.score)


def test_text_equality_roundtrip(ray_session, small_corpus_dir):
    """The minimum end-to-end slice (SURVEY.md §7.1 step 3): read →
    tokenize map_batches → write; per-turn text byte-equal under stable
    (conv_id, turn_idx) ordering."""
    from vframe_ray.stages.tokenize import tokenize
    ds = read_transcripts(small_corpus_dir,
                          columns=["conv_id", "turn_idx", "text"])
    out = tokenize(ds).select_columns(
        ["conv_id", "turn_idx", "text", "doclen"]).to_pandas()
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    src = pq.ParquetDataset(small_corpus_dir).read(
        columns=["conv_id", "turn_idx", "text"]).to_pandas()
    src = src.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (out["conv_id"] == src["conv_id"]).all()
    assert (out["turn_idx"] == src["turn_idx"]).all()
    assert (out["text"] == src["text"]).all()        # byte equality


def test_resume_skips_finished_segments(ray_session, small_corpus_dir,
                                        tmp_path):
    """Checkpoint/resume (FIXTURES.md §6): delete one segment from a
    finished index, rebuild — only the missing segment is rebuilt and the
    final index is identical."""
    import shutil
    d = str(tmp_path / "idx")
    ds = read_transcripts(small_corpus_dir,
                          columns=["conv_id", "turn_idx", "text"])
    build_index(ds, d, SMALL_CFG)
    _, _, seg_dirs = load_index_meta(d)
    mtimes_before = {s: os.path.getmtime(os.path.join(s, "terms.parquet"))
                     for s in seg_dirs}
    victim = seg_dirs[2]
    blob_before = open(os.path.join(victim, "terms.parquet"), "rb").read()
    shutil.rmtree(victim)

    ds2 = read_transcripts(small_corpus_dir,
                           columns=["conv_id", "turn_idx", "text"])
    build_index(ds2, d, SMALL_CFG)
    # victim rebuilt byte-identical; survivors untouched (same mtime)
    assert open(os.path.join(victim, "terms.parquet"), "rb").read() \
        == blob_before
    for s in seg_dirs:
        if s != victim:
            assert os.path.getmtime(os.path.join(s, "terms.parquet")) \
                == mtimes_before[s], f"{s} was rebuilt"


def test_resume_from_interrupted_build(ray_session, small_corpus_dir,
                                       tmp_path):
    """FIXTURES.md §6: a killed build leaves a SUBSET of finished atomic
    segments and no top-level manifest.  Resume completes the remainder
    and the final index is byte-identical to an uninterrupted build."""
    import shutil
    ref = str(tmp_path / "ref")
    ds = read_transcripts(small_corpus_dir,
                          columns=["conv_id", "turn_idx", "text"])
    build_index(ds, ref, SMALL_CFG)
    _, _, ref_segs = load_index_meta(ref)

    # interrupted state: first 2 finished segments only, nothing else
    part = str(tmp_path / "part")
    os.makedirs(os.path.join(part, "segments"))
    for s in ref_segs[:2]:
        shutil.copytree(s, os.path.join(part, "segments",
                                        os.path.basename(s)))
    ds2 = read_transcripts(small_corpus_dir,
                           columns=["conv_id", "turn_idx", "text"])
    build_index(ds2, part, SMALL_CFG)

    _, _, part_segs = load_index_meta(part)
    assert [os.path.basename(s) for s in part_segs] \
        == [os.path.basename(s) for s in ref_segs]
    for a, b in zip(ref_segs, part_segs):
        for f in ("docs.parquet", "terms.parquet"):
            assert open(os.path.join(a, f), "rb").read() \
                == open(os.path.join(b, f), "rb").read(), (a, f)
    # the 2 pre-existing segments were not rebuilt (same bytes is implied
    # above; manifests carry the same fingerprints)
    for a, b in zip(ref_segs[:2], part_segs[:2]):
        ma = json.load(open(os.path.join(a, "manifest.json")))
        mb = json.load(open(os.path.join(b, "manifest.json")))
        assert ma["input_fingerprint"] == mb["input_fingerprint"]


def test_manifest_lineage_fields(small_index_dir):
    _, _, seg_dirs = load_index_meta(small_index_dir)
    for d in seg_dirs:
        m = json.load(open(os.path.join(d, "manifest.json")))
        assert set(m) >= {"segment", "segment_id", "n_docs", "n_terms",
                          "total_len", "postings_bytes", "input_fingerprint"}
        assert len(m["input_fingerprint"]) == 32
