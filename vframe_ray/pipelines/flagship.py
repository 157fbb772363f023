"""Flagship pipeline: index the ``documents`` table, serve BM25 top-k.

This is the `open → detect → save-detections` of the new engine
(SURVEY.md §3.1) exercised over the driver's test tables: documents are
lifted into the transcripts shape (one single-turn conversation per doc,
``conv_id`` zero-padded so lexicographic order == doc_id order, which
makes the engine's (conv_id, turn_idx) tie-break equal the SQL oracle's
``ORDER BY doc_id``), indexed once into a resumable cache dir, then
queried with a fixed query set.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import EngineConfig, IndexConfig
from ..index.build import build_index, load_index_meta
from ..index.query import search_index

CACHE_ROOT = "/tmp/vframe_ray_cache"

# fixed reference query set over the documents vocabulary
DOC_QUERIES = [
    {"query_id": 0, "query_text": "spark window merge", "k": 10},
    {"query_id": 1, "query_text": "vector", "k": 5},
    {"query_id": 2, "query_text": "the customer", "k": 10},
    {"query_id": 3, "query_text": "zzzmissing spark", "k": 10},
    {"query_id": 4, "query_text": "dup stream", "k": 10},
    {"query_id": 5, "query_text": "hash join agg sort scan", "k": 10},
    {"query_id": 6, "query_text": "big", "k": 100},
    {"query_id": 7, "query_text": "slow fast", "k": 10},
]

DOCS_CFG = EngineConfig(index=IndexConfig(num_segments=4, block_size=128))


def documents_as_transcripts(sf_dir: str) -> "ray.data.Dataset":
    """documents(doc_id, text, …) -> transcripts(conv_id, turn_idx, text)."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

    def lift(t: pa.Table) -> pa.Table:
        pad = pc.utf8_lpad(pc.cast(t["doc_id"], pa.string()), 10, "0")
        return pa.table({
            "conv_id": pad,
            "turn_idx": pa.array(np.zeros(t.num_rows, dtype=np.int32)),
            "text": t["text"],
        })

    return ds.map_batches(lift, batch_format="pyarrow", zero_copy_batch=True)


def documents_index(sf_dir: str, cfg: EngineConfig = DOCS_CFG) -> str:
    """Build (or resume — finished segments are skipped) the documents
    index for this sf dir; returns the index dir.  The cache dir embeds a
    config fingerprint so a stale cache from an older engine config can
    never serve queries."""
    import hashlib
    import json as _json
    tag = os.path.basename(os.path.normpath(sf_dir))
    cfg_fp = hashlib.sha1(_json.dumps(cfg.to_dict(), sort_keys=True)
                          .encode()).hexdigest()[:8]
    index_dir = os.path.join(CACHE_ROOT, f"docs-{tag}-{cfg_fp}")
    manifest = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(manifest):
        build_index(documents_as_transcripts(sf_dir), index_dir, cfg)
    return index_dir


def bm25_documents(sf_dir: str) -> pa.Table:
    """Run DOC_QUERIES; result (query_id, rank, doc_id, score_r) in the
    exact shape of the SQL oracle (score rounded to 6 dp — engine and
    DuckDB agree to ~1 ulp, the rounding absorbs it)."""
    index_dir = documents_index(sf_dir)
    res = search_index(index_dir, DOC_QUERIES)
    doc_id = pc.cast(res["conv_id"], pa.int64())
    score_r = pc.round(res["score"], ndigits=6)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": doc_id,
        "score_r": score_r,
    })


def phrase_match_documents(sf_dir: str, phrase: str = "batch batch"
                           ) -> pa.Table:
    """Docs containing the exact consecutive token phrase — exercises the
    positional postings (reference analog: ordered per-frame metadata;
    the oracle is a LIKE over the space-joined corpus, exact because the
    synthetic documents are single-space token streams)."""
    from ..analyze import Tokenizer
    from ..index.codec import decode_all
    from ..index.segment import SegmentReader

    index_dir = documents_index(sf_dir)
    cfg_d, _, seg_dirs = load_index_meta(index_dir)
    bs = cfg_d["index"]["block_size"]
    terms = Tokenizer().tokenize(phrase)

    out: list[int] = []
    for seg in seg_dirs:
        r = SegmentReader(seg)
        tps = r.load_terms(sorted(set(terms)))
        if any(t not in tps for t in terms):
            continue
        # doc -> positions per phrase slot
        slot_pos: list[dict[int, np.ndarray]] = []
        for t in terms:
            docs, tfs, pos = decode_all(tps[t], bs, with_positions=True)
            offs = np.zeros(len(docs) + 1, dtype=np.int64)
            np.cumsum(tfs, out=offs[1:])
            slot_pos.append({int(d): pos[offs[i]:offs[i + 1]]
                             for i, d in enumerate(docs)})
        cand = set(slot_pos[0])
        for m in slot_pos[1:]:
            cand &= set(m)
        for d in sorted(cand):
            ok = slot_pos[0][d]
            for i, m in enumerate(slot_pos[1:], start=1):
                ok = ok[np.isin(ok + i, m[d])]
                if not len(ok):
                    break
            if len(ok):
                out.append(int(r.conv_id[d].as_py()))
    return pa.table({"doc_id": pa.array(sorted(out), pa.int64())})


def entry_flagship(sf_dir: str = "/root/testdata/sf0.001") -> pa.Table:
    """The driver smoke entry: build + query, return ranked hits."""
    return bm25_documents(sf_dir)
