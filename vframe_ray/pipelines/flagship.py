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

from ..config import AnalyzerConfig, EngineConfig, IndexConfig
from ..index.build import build_index
from ..index.query import search_index
from ..sources.readers import read_parquet as _read_parquet
from ..storage import cache_root as _cache_root

# Index-cache root: node-local /tmp by default; set VFRAME_RAY_CACHE to a
# shared-filesystem mount on multi-node clusters (vframe_ray/storage.py).

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
    ds = _read_parquet(os.path.join(sf_dir, "documents.parquet"),
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
    index_dir = os.path.join(_cache_root(), f"docs-{tag}-{cfg_fp}")
    manifest = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(manifest):
        build_index(documents_as_transcripts(sf_dir), index_dir, cfg)
    return index_dir


STOPWORDS = ("a", "the")
STOP_QUERIES = [
    {"query_id": 0, "query_text": "the customer", "k": 10},
    {"query_id": 1, "query_text": "spark window merge", "k": 10},
    {"query_id": 2, "query_text": "a", "k": 10},   # fully stopped: 0 rows
]


def documents_stop_index(sf_dir: str) -> str:
    """Documents index built under a NON-DEFAULT analyzer (stopwords
    removed at index AND query time) — exercises the config plumbing
    end to end: dl/avgdl/df all post-stopword, the cache fingerprint
    embeds the analyzer so it can never collide with the plain index."""
    from ..config import AnalyzerConfig
    cfg = EngineConfig(
        analyzer=AnalyzerConfig(stopwords=frozenset(STOPWORDS)),
        index=IndexConfig(num_segments=4, block_size=128))
    return documents_index(sf_dir, cfg)


def bm25_stopwords(sf_dir: str) -> pa.Table:
    """STOP_QUERIES over the stopword-analyzer index: stopped query
    terms vanish ('the customer' scores as 'customer'; an all-stopword
    query returns nothing), corpus stats are post-stopword."""
    index_dir = documents_stop_index(sf_dir)
    res = search_index(index_dir, STOP_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


STEM_QUERIES = [
    # surface forms differing from the indexed text only by plural
    # suffixes must meet in the stemmed term space
    {"query_id": 0, "query_text": "queries", "k": 10},
    {"query_id": 1, "query_text": "partitions merge", "k": 10},
    {"query_id": 2, "query_text": "windows", "k": 10},
]


def documents_stem_index(sf_dir: str) -> str:
    """Documents index under the S-stemmer analyzer (Harman ies/es/s
    suffix rules, applied at index AND query time) — like the stopword
    index this exercises the analyzer-config plumbing end to end:
    df/dl/avgdl are all post-stem, the cache fingerprint embeds the
    stemmer, and the stored index config drives query-side stemming."""
    from ..config import AnalyzerConfig
    cfg = EngineConfig(
        analyzer=AnalyzerConfig(stem="s"),
        index=IndexConfig(num_segments=4, block_size=128))
    return documents_index(sf_dir, cfg)


def bm25_stemmed(sf_dir: str) -> pa.Table:
    """STEM_QUERIES over the stemmed index: plural query forms match
    singular document terms (and vice versa) because both sides map
    through the same S-stemmer before scoring."""
    index_dir = documents_stem_index(sf_dir)
    res = search_index(index_dir, STEM_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


def extended_documents_index(sf_dir: str,
                             cfg: EngineConfig = DOCS_CFG) -> str:
    """Index built in TWO phases through the delta-append path: base
    build over doc_id % 3 != 0, then :func:`~vframe_ray.index.build.
    extend_index` with the held-out doc_id % 3 == 0 third — the
    reference's continue/extend workflow (``open -i prior.json``,
    media.py:79-111) as a driver-checkable query.  BM25 depends only on
    global df/avgdl + per-doc stats, never on segment layout, so query
    results over the extended index must be value-identical to the
    full-corpus SQL oracle."""
    import hashlib
    import json as _json
    import shutil

    from ..index.build import extend_index

    tag = os.path.basename(os.path.normpath(sf_dir))
    cfg_fp = hashlib.sha1(_json.dumps(cfg.to_dict(), sort_keys=True)
                          .encode()).hexdigest()[:8]
    index_dir = os.path.join(_cache_root(), f"docs-ext-{tag}-{cfg_fp}")
    marker = os.path.join(index_dir, "EXTENDED")
    if not os.path.exists(marker):
        shutil.rmtree(index_dir, ignore_errors=True)

        def subset(keep_third: bool):
            def pick(t: pa.Table) -> pa.Table:
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                return t.filter(pa.array((ids % 3 == 0) == keep_third))
            ds = _read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
            return ds.map_batches(pick, batch_format="pyarrow",
                                  zero_copy_batch=True)

        def lift(t: pa.Table) -> pa.Table:
            pad = pc.utf8_lpad(pc.cast(t["doc_id"], pa.string()), 10, "0")
            return pa.table({
                "conv_id": pad,
                "turn_idx": pa.array(np.zeros(t.num_rows, dtype=np.int32)),
                "text": t["text"],
            })

        build_index(subset(False).map_batches(lift, batch_format="pyarrow"),
                    index_dir, cfg)
        extend_index(subset(True).map_batches(lift, batch_format="pyarrow"),
                     index_dir)
        with open(marker, "w") as f:
            f.write("ok")
    return index_dir


def bm25_documents_extended(sf_dir: str) -> pa.Table:
    """DOC_QUERIES against the two-phase (build + extend) index; same
    result shape/oracle as :func:`bm25_documents` — the equality IS the
    append-path correctness claim."""
    index_dir = extended_documents_index(sf_dir)
    res = search_index(index_dir, DOC_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


def documents_as_conversations(sf_dir: str) -> "ray.data.Dataset":
    """documents -> MULTI-TURN transcripts: conv_id = source, turn_idx =
    rank of doc_id within its source, ``lang`` carried as a docmap
    attribute for query-time predicates (skip-labels analog).  The same
    doc contents as :func:`documents_as_transcripts`, so BM25 stats and
    scores are identical — only the identity keys change, which makes
    the conversation-shaped result SQL-oracle-checkable."""
    import pandas as pd
    ds = _read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text", "source", "lang"])

    # source-hash-bucket co-partition, turn ranks assigned vectorized per
    # bucket (cumcount within source) — conversation count scales with
    # the corpus, so no per-conversation map_groups
    from ..runtime import num_hash_buckets
    import pyarrow as pa
    nb = num_hash_buckets()

    def add_bucket(t: "pa.Table") -> "pa.Table":
        h = pd.util.hash_array(t["source"].to_pandas()
                               .to_numpy(dtype=object))
        return t.append_column("__b", pa.array((h % nb).astype(np.int32)))

    def to_conv(g: "pd.DataFrame"):
        from ..runtime import arrow_group
        g = g.sort_values(["source", "doc_id"])
        return arrow_group(pd.DataFrame({
            "conv_id": g["source"].to_numpy(),
            "turn_idx": g.groupby("source", sort=False).cumcount()
            .to_numpy(dtype=np.int32),
            "text": g["text"].to_numpy(),
            "lang": g["lang"].to_numpy(),
        }))

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__b").map_groups(to_conv, batch_format="pandas"))


def conversations_index(sf_dir: str, cfg: EngineConfig = DOCS_CFG) -> str:
    """Build (or resume) the conversation-shaped documents index with the
    ``lang`` attribute column; cache dir embeds the config fingerprint
    (VERDICT round 1: unfingerprinted tidx-* caches could serve stale
    indexes after a config change)."""
    import hashlib
    import json as _json
    tag = os.path.basename(os.path.normpath(sf_dir))
    cfg_fp = hashlib.sha1(_json.dumps(cfg.to_dict(), sort_keys=True)
                          .encode()).hexdigest()[:8]
    index_dir = os.path.join(_cache_root(), f"conv-{tag}-{cfg_fp}")
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        build_index(documents_as_conversations(sf_dir), index_dir, cfg,
                    attribute_cols=["lang"])
    return index_dir


def bm25_conversations(sf_dir: str,
                       predicates: list[str] | None = None) -> pa.Table:
    """DOC_QUERIES over the conversation-shaped index; result
    (query_id, rank, conv_id, turn_idx, score_r) — optionally filtered by
    docmap-attribute predicates at scoring time (global stats stay
    unfiltered, the skip-labels contract)."""
    index_dir = conversations_index(sf_dir)
    res = search_index(index_dir, DOC_QUERIES, predicates=predicates)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "conv_id": res["conv_id"],
        "turn_idx": res["turn_idx"],
        "score_r": pc.round(res["score"], ndigits=6),
    })


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
    synthetic documents are single-space token streams).

    Runs on the DISTRIBUTED phrase path: positional intersection inside
    per-segment tasks via :func:`phrase_search_index` (the round-1
    driver-side segment loop is gone)."""
    from ..index.query import phrase_search_index

    index_dir = documents_index(sf_dir)
    hits = phrase_search_index(index_dir,
                               [{"query_id": 0, "phrase": phrase}])
    return pa.table({"doc_id": pc.cast(hits["conv_id"], pa.int64())})


# fixed ranked-phrase query set (k per phrase; scores = BM25 over the
# phrase's terms restricted to phrase-hit docs)
PHRASE_RANK_QUERIES = [
    {"query_id": 0, "phrase": "batch batch", "k": 10},
    {"query_id": 1, "phrase": "the customer", "k": 10},
    {"query_id": 2, "phrase": "spark window", "k": 5},
    {"query_id": 3, "phrase": "hash join", "k": 10},
    {"query_id": 4, "phrase": "zzzmissing phrase", "k": 10},
]


# fixed proximity (NEAR/W) query set: all distinct terms within a
# `window`-token span; scores = BM25 over the query terms restricted to
# proximity-hit docs (query_id 4 degenerates to a single distinct term —
# the window constraint vanishes, matching the m=1 reduction in
# SegmentSearcher.proximity_hits)
PROX_QUERIES = [
    {"query_id": 0, "query_text": "hash join", "window": 3, "k": 10},
    {"query_id": 1, "query_text": "customer vector", "window": 2, "k": 10},
    {"query_id": 2, "query_text": "spark window merge", "window": 6, "k": 8},
    {"query_id": 3, "query_text": "zzzmissing join", "window": 5, "k": 10},
    {"query_id": 4, "query_text": "batch batch", "window": 4, "k": 10},
]


PROX_ORDERED_QUERIES = [
    {"query_id": 0, "query_text": "hash join", "window": 3, "k": 10,
     "ordered": True},
    {"query_id": 1, "query_text": "join hash", "window": 3, "k": 10,
     "ordered": True},
    {"query_id": 2, "query_text": "the customer order", "window": 8,
     "k": 10, "ordered": True},
    {"query_id": 3, "query_text": "batch batch", "window": 5, "k": 10,
     "ordered": True},
]


def bm25_proximity_ordered(sf_dir: str) -> pa.Table:
    """Ordered span-near (terms in the given order, increasing
    positions, bounded span) — queries 0/1 are the same term pair in
    both directions, so their hit sets differ exactly by order."""
    from ..index.query import proximity_rank_index
    index_dir = documents_index(sf_dir)
    res = proximity_rank_index(index_dir, PROX_ORDERED_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


def bm25_proximity(sf_dir: str) -> pa.Table:
    """PROX_QUERIES as ranked scored results (query_id, rank, doc_id,
    score_r) on the distributed per-segment proximity path
    (index/query.proximity_rank_index)."""
    from ..index.query import proximity_rank_index
    index_dir = documents_index(sf_dir)
    res = proximity_rank_index(index_dir, PROX_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


TV_QUERIES = [
    {"query_id": 0, "query_text": "spark window merge", "k": 3},
    {"query_id": 1, "query_text": "vector", "k": 3},
    {"query_id": 2, "query_text": "hash join", "k": 4},
]


def term_vectors_hits(sf_dir: str):
    """Term vectors for matched docs (Lucene/Elasticsearch
    ``termvectors`` on search hits): for each TV_QUERIES top-k doc, its
    FULL (term, tf) vector — the "why did this doc rank / what else is
    in it" inspection surface, and the feature export for downstream
    rerankers.

    Postings are term-major, so a doc's vector is not in the index (no
    forward index by design); instead the ≤ queries×k hit docs come
    back from the ranked scatter-gather and ONE pushdown-filtered
    parquet read re-tokenizes JUST those docs (the Q18 ≤-k-finalists
    discipline — the corpus is never rescanned).

    Returns pandas (query_id, rank, doc_id, term, tf) sorted by
    (query_id, rank, term).
    """
    import pandas as pd

    from ..analyze import Tokenizer
    from ..index.query import search_index
    index_dir = documents_index(sf_dir)
    res = search_index(index_dir, TV_QUERIES).to_pandas()
    if not len(res):
        return pd.DataFrame({c: pd.Series(dtype=d) for c, d in
                             [("query_id", "int32"), ("rank", "int32"),
                              ("doc_id", "int64"), ("term", "object"),
                              ("tf", "int64")]})
    res["doc_id"] = res["conv_id"].astype("int64")
    doc_ids = sorted(set(res["doc_id"]))

    ds = _read_parquet(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"],
                       filter=pc.field("doc_id").isin(doc_ids))
    tok = Tokenizer()

    def tf_partial(t: pa.Table) -> pa.Table:
        tokens = tok.tokenize_array(t["text"])
        flat = pc.list_flatten(tokens).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(tokens).to_numpy(
            zero_copy_only=False)
        if not len(flat):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        terms_u, codes = np.unique(flat, return_inverse=True)
        key = parents.astype(np.int64) * len(terms_u) + codes
        uk, counts = np.unique(key, return_counts=True)
        return pa.table({
            "doc_id": pa.array(ids[(uk // len(terms_u))
                                   .astype(np.int64)], pa.int64()),
            "term": pa.array(terms_u[uk % len(terms_u)], pa.string()),
            "tf": pa.array(counts.astype(np.int64))})

    tf = ds.map_batches(tf_partial, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    out = res[["query_id", "rank", "doc_id"]].merge(tf, on="doc_id")
    return out.sort_values(["query_id", "rank", "term"]) \
        .reset_index(drop=True)


SPAN_FIRST_QUERIES = [
    {"query_id": 0, "query_text": "hash join", "limit": 12, "k": 10},
    {"query_id": 1, "query_text": "customer", "limit": 4, "k": 10},
    {"query_id": 2, "query_text": "spark window", "limit": 20, "k": 8},
    {"query_id": 3, "query_text": "zzzmissing join", "limit": 30, "k": 10},
    {"query_id": 4, "query_text": "vector merge", "limit": 9, "k": 10},
]


def bm25_span_first(sf_dir: str) -> pa.Table:
    """SPAN_FIRST_QUERIES as ranked scored results (query_id, rank,
    doc_id, score_r): docs where every query term occurs within the
    first ``limit`` token positions, BM25-scored
    (index/entrypoints.span_first_search_index)."""
    from ..index.query import span_first_search_index
    index_dir = documents_index(sf_dir)
    res = span_first_search_index(index_dir, SPAN_FIRST_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


PQF_QUERIES = [
    {"query_id": 0, "query_text": "spark window merge", "k": 10,
     "filter": ["lang == en"]},
    {"query_id": 1, "query_text": "spark window merge", "k": 10,
     "filter": ["lang == de"]},
    {"query_id": 2, "query_text": "spark window merge", "k": 10},
    {"query_id": 3, "query_text": "vector", "k": 8,
     "filter": ["lang == fr"]},
]


def bm25_per_query_filter(sf_dir: str) -> pa.Table:
    """PQF_QUERIES over the conversation-shaped index with PER-QUERY
    attribute filters (Elasticsearch filter-context-per-request): the
    same query text returns different rankings under different lang
    filters in ONE batched call; an unfiltered sibling rides along.
    Each distinct filter compiles once per segment call and masks that
    query's scoring only — global stats stay unfiltered (the
    skip-labels contract)."""
    index_dir = conversations_index(sf_dir)
    res = search_index(index_dir, PQF_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "conv_id": res["conv_id"],
        "turn_idx": res["turn_idx"],
        "score_r": pc.round(res["score"], ndigits=6),
    })


COMMON_QUERIES = [
    {"query_id": 0, "query_text": "dup merge sort", "k": 10},
    {"query_id": 1, "query_text": "the window", "k": 10},
    {"query_id": 2, "query_text": "dup zzzmissing", "k": 10},
    {"query_id": 3, "query_text": "zzzmissing customer", "k": 8},
]
COMMON_DF_NUM, COMMON_DF_DEN = 2, 5     # low-df iff df·5 < n_docs·2


def bm25_common_terms(sf_dir: str) -> pa.Table:
    """COMMON_QUERIES with Lucene CommonTermsQuery semantics: recall
    from low-df terms only (integer df·den < n·num rule), BM25 scoring
    over every query term; all-high-df queries fall back to plain
    recall (index/entrypoints.search_common_index)."""
    from ..index.query import search_common_index
    index_dir = documents_index(sf_dir)
    res = search_common_index(index_dir, COMMON_QUERIES,
                              max_df_num=COMMON_DF_NUM,
                              max_df_den=COMMON_DF_DEN)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


BOOST_QUERIES = [
    {"query_id": 0, "query_text": "spark^2.5 window merge^0.5", "k": 10},
    {"query_id": 1, "query_text": "hash^3 join", "k": 10},
    {"query_id": 2, "query_text": "vector", "k": 5},
    {"query_id": 3, "query_text": "zzzmissing^2 customer", "k": 10},
]


def bm25_boosted(sf_dir: str) -> pa.Table:
    """BOOST_QUERIES (``term^2.5`` syntax) as ranked scored results —
    boost multiplies the term's whole BM25 contribution
    (index/query.search_boosted_index)."""
    from ..index.query import search_boosted_index
    index_dir = documents_index(sf_dir)
    res = search_boosted_index(index_dir, BOOST_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


HYBRID_QUERIES = [
    {"query_id": 0, "query_text": "spark window merge", "seed_vec": 3,
     "n": 50, "k": 10},
    {"query_id": 1, "query_text": "vector customer", "seed_vec": 7,
     "n": 40, "k": 10},
    {"query_id": 2, "query_text": "zzzmissing", "seed_vec": 1,
     "n": 30, "k": 10},
]


RRF_C = 60
RRF_QUERIES = [
    {"query_id": 0, "query_text": "spark window merge", "seed_vec": 3,
     "n": 30, "k": 10},
    {"query_id": 1, "query_text": "vector customer", "seed_vec": 7,
     "n": 30, "k": 10},
]


def rrf_fusion(sf_dir: str) -> pa.Table:
    """Reciprocal-rank fusion (the Elasticsearch/OpenSearch hybrid
    default): two INDEPENDENT retrieval legs — BM25 top-n from the
    inverted index and exact cosine top-n against a seed embedding
    over the FULL embeddings table (vs :func:`hybrid_search`, whose
    vector pass only re-ranks the lexical candidates) — fused by
    rrf = 1/(C + r_lex) + 1/(C + r_vec), a missing leg contributing
    exactly 0.  Rank fusion needs only the two legs' RANKS, so the
    fusion itself is driver-side arithmetic over ≤ 2·n rows per query;
    all data-sized work stays in the legs (scatter-gather top-k and
    the broadcast-matmul block top-k).  The fused float is the same
    two-division one-addition chain in the SQL oracle, so scores
    hash-match bit-for-bit.  doc_id == vec_id alignment of the
    synthetic tables.  Returns (query_id, rank, doc_id, rrf)."""
    import pyarrow.parquet as pq

    from ..index.query import search_index
    from ..sources.readers import read_parquet as _read_parquet
    from ..stages.similarity import cosine_topk

    index_dir = documents_index(sf_dir)
    lex = search_index(index_dir, [
        {"query_id": q["query_id"], "query_text": q["query_text"],
         "k": q["n"]} for q in RRF_QUERIES]).to_pandas()
    lex["doc_id"] = lex["conv_id"].astype(np.int64)
    lex = lex[["query_id", "doc_id", "rank"]] \
        .rename(columns={"rank": "r_lex"})

    seeds = sorted({q["seed_vec"] for q in RRF_QUERIES})
    st = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "in", seeds)])
    by_seed = {int(i): np.asarray(v, dtype=np.float64)
               for i, v in zip(st["vec_id"].to_pylist(),
                               st["embedding"].to_pylist())}
    emb = _read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    vec = cosine_topk(
        emb, {q["query_id"]: by_seed[q["seed_vec"]]
              for q in RRF_QUERIES},
        k=max(q["n"] for q in RRF_QUERIES)).to_pandas()
    n_by_q = {q["query_id"]: q["n"] for q in RRF_QUERIES}
    vec = vec[vec["rank"] <= vec["query_id"].map(n_by_q)]
    vec = vec.rename(columns={"vec_id": "doc_id", "rank": "r_vec"})[
        ["query_id", "doc_id", "r_vec"]]

    f = lex.merge(vec, on=["query_id", "doc_id"], how="outer")
    rl = f["r_lex"].to_numpy(dtype=np.float64)
    rv = f["r_vec"].to_numpy(dtype=np.float64)
    f["rrf"] = (np.where(np.isnan(rl), 0.0, 1.0 / (RRF_C + rl))
                + np.where(np.isnan(rv), 0.0, 1.0 / (RRF_C + rv)))
    f = f.sort_values(["query_id", "rrf", "doc_id"],
                      ascending=[True, False, True])
    f["rank"] = (f.groupby("query_id", sort=False).cumcount() + 1) \
        .astype(np.int32)
    k_by_q = {q["query_id"]: q["k"] for q in RRF_QUERIES}
    f = f[f["rank"] <= f["query_id"].map(k_by_q)]
    return pa.table({
        "query_id": pa.array(f["query_id"].astype("int32")),
        "rank": pa.array(f["rank"].astype("int32")),
        "doc_id": pa.array(f["doc_id"].astype("int64")),
        "rrf": pa.array(f["rrf"].astype("float64")),
    })


def hybrid_search(sf_dir: str) -> pa.Table:
    """Hybrid retrieval (RAG-shaped): BM25 top-N candidate recall from
    the inverted index, then embedding-cosine re-rank against a seed
    vector (stages/similarity.rerank_by_embedding).  Assumes the
    synthetic tables' alignment doc_id == vec_id.  Returns (query_id,
    rank, doc_id, sim_r)."""
    import numpy as np

    from ..index.query import search_index
    from ..stages.similarity import rerank_by_embedding

    index_dir = documents_index(sf_dir)
    cand: dict[int, "np.ndarray"] = {}
    for q in HYBRID_QUERIES:
        res = search_index(index_dir, [{
            "query_id": q["query_id"], "query_text": q["query_text"],
            "k": q["n"]}])
        cand[q["query_id"]] = np.asarray(
            [int(c) for c in res["conv_id"].to_pylist()], dtype=np.int64)
    seeds = {q["query_id"]: q["seed_vec"] for q in HYBRID_QUERIES}
    k_by_q = {q["query_id"]: q["k"] for q in HYBRID_QUERIES}
    df = rerank_by_embedding(cand,
                             os.path.join(sf_dir, "embeddings.parquet"),
                             seeds, k=max(k_by_q.values()))
    df = df[df["rank"] <= df["query_id"].map(k_by_q)]
    return pa.table({
        "query_id": pa.array(df["query_id"].astype("int32")),
        "rank": pa.array(df["rank"].astype("int32")),
        "doc_id": pa.array(df["vec_id"].astype("int64")),
        "sim_r": pa.array(df["sim"].round(6).astype("float64")),
    })


EXPLAIN_QUERIES = [
    {"query_id": 0, "query_text": "spark window merge", "k": 5},
    {"query_id": 1, "query_text": "hash join", "k": 5},
]


def bm25_explain(sf_dir: str) -> pa.Table:
    """Score explanation: per-term BM25 contribution rows for each
    query's global top-k docs (index/query.explain_index); a doc's
    rows sum bit-exactly to its ranked score."""
    from ..index.query import explain_index
    index_dir = documents_index(sf_dir)
    res = explain_index(index_dir, EXPLAIN_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "term": res["term"],
        "contrib_r": pc.round(res["contrib"], ndigits=6),
    })


SEARCH_AFTER_TEXT = "the customer"
SEARCH_AFTER_PAGE = 10


def bm25_search_after(sf_dir: str) -> pa.Table:
    """Cursor pagination: page 1 = plain top-10, cursor = its last row's
    (score, conv_id, turn_idx), page 2 via search_after_index — each
    segment returns only k rows however deep the page (vs offset's
    offset+k over-fetch).  Returns page 2 as (query_id, rank, doc_id,
    score_r) with page-local ranks 1..k."""
    from ..index.query import search_after_index, search_index
    index_dir = documents_index(sf_dir)
    first = search_index(index_dir, [{
        "query_id": 0, "query_text": SEARCH_AFTER_TEXT,
        "k": SEARCH_AFTER_PAGE}])
    last = first.slice(first.num_rows - 1, 1)
    cursor = (last["score"][0].as_py(), last["conv_id"][0].as_py(),
              last["turn_idx"][0].as_py())
    res = search_after_index(index_dir, [{
        "query_id": 0, "query_text": SEARCH_AFTER_TEXT,
        "k": SEARCH_AFTER_PAGE, "after": cursor}])
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


FACET_RANGE_QUERIES = [
    {"query_id": 0, "query_text": "vector"},
    {"query_id": 1, "query_text": "hash join"},
    {"query_id": 2, "query_text": "zzzmissing"},
]
FACET_RANGE_BIN = 16


def facet_dl_ranges(sf_dir: str) -> pa.Table:
    """Range facets: per-query doc-length histogram over the full match
    set (index/query.facet_ranges_index), bins of FACET_RANGE_BIN
    tokens."""
    from ..index.query import facet_ranges_index
    index_dir = documents_index(sf_dir)
    return facet_ranges_index(index_dir, FACET_RANGE_QUERIES,
                              bin_width=FACET_RANGE_BIN)


SUGGEST_PREFIXES = ["s", "ba", "qu", "zzz"]
SUGGEST_K = 5


def suggest_documents(sf_dir: str) -> pa.Table:
    """Autocomplete over the documents index: top-SUGGEST_K dictionary
    terms per prefix by (df desc, term asc) — a dictionary-only read
    (index/query.suggest_terms), no postings touched."""
    from ..index.query import suggest_terms
    index_dir = documents_index(sf_dir)
    return suggest_terms(index_dir, SUGGEST_PREFIXES, k=SUGGEST_K)


def documents_as_transcripts_punct(sf_dir: str) -> "ray.data.Dataset":
    """Documents lifted to transcripts with a HOSTILE surface form:
    every space becomes '! ' and the text is uppercased.  The analyzer
    rule (lowercase, [a-z0-9]+ runs) maps it to the identical token
    stream, so phrase/BM25 results must equal the plain corpus — but a
    padded-LIKE oracle would break, which is the point (VERDICT r2 next
    #9: let the analyzer rule, not the corpus shape, carry the SQL
    equivalence)."""
    ds = _read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

    def lift(t: pa.Table) -> pa.Table:
        pad = pc.utf8_lpad(pc.cast(t["doc_id"], pa.string()), 10, "0")
        txt = pc.utf8_upper(pc.replace_substring(
            pc.fill_null(t["text"], ""), pattern=" ", replacement="! "))
        return pa.table({
            "conv_id": pad,
            "turn_idx": pa.array(np.zeros(t.num_rows, dtype=np.int32)),
            "text": txt,
        })

    return ds.map_batches(lift, batch_format="pyarrow", zero_copy_batch=True)


def documents_punct_index(sf_dir: str, cfg: EngineConfig = DOCS_CFG) -> str:
    """Build (or resume) the punctuated-surface documents index."""
    import hashlib
    import json as _json
    tag = os.path.basename(os.path.normpath(sf_dir))
    cfg_fp = hashlib.sha1(_json.dumps(cfg.to_dict(), sort_keys=True)
                          .encode()).hexdigest()[:8]
    index_dir = os.path.join(_cache_root(), f"docsp-{tag}-{cfg_fp}")
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        build_index(documents_as_transcripts_punct(sf_dir), index_dir, cfg)
    return index_dir


def phrase_rank_documents(sf_dir: str, punct: bool = False) -> pa.Table:
    """PHRASE_RANK_QUERIES as ranked scored results
    (query_id, rank, doc_id, score_r) — phrase-as-filter + BM25 score
    on the distributed per-segment path (index/query.phrase_rank_index).
    ``punct=True`` runs against the hostile-surface index."""
    from ..index.query import phrase_rank_index
    index_dir = (documents_punct_index if punct
                 else documents_index)(sf_dir)
    res = phrase_rank_index(index_dir, PHRASE_RANK_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


def search_snippets(sf_dir: str, query: dict | None = None) -> pa.Table:
    """Top-k BM25 hits with matched terms highlighted in the text — the
    `pipe draw` result-presentation analog (draw.py:68-168) as a final
    ``map_batches`` over the corpus.  Returns
    (rank, doc_id, score_r, snippet) sorted by rank."""
    from ..analyze import Tokenizer
    from ..stages.snippets import highlight_hits

    query = query or DOC_QUERIES[0]
    index_dir = documents_index(sf_dir)
    res = search_index(index_dir, [query])
    hits = pa.table({
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })
    terms = Tokenizer().tokenize(query["query_text"])
    ds = _read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    out = highlight_hits(ds, hits, terms).to_pandas()
    return pa.Table.from_pandas(out.sort_values("rank"),
                                preserve_index=False)


PHRASE_SNIPPET = {"query_id": 0, "phrase": "hash join", "k": 10}


def phrase_snippets(sf_dir: str) -> pa.Table:
    """Ranked phrase hits with the WHOLE phrase occurrence highlighted
    (phrase_highlight_pattern: analyzed terms in order separated by any
    non-token characters — surface-robust).  Returns
    (rank, doc_id, score_r, snippet) sorted by rank."""
    from ..analyze import Tokenizer
    from ..index.query import phrase_rank_index
    from ..stages.snippets import highlight_hits, phrase_highlight_pattern

    index_dir = documents_index(sf_dir)
    res = phrase_rank_index(index_dir, [PHRASE_SNIPPET])
    hits = pa.table({
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })
    terms = Tokenizer().tokenize(PHRASE_SNIPPET["phrase"])
    ds = _read_parquet(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
    out = highlight_hits(ds, hits, terms,
                         pattern=phrase_highlight_pattern(terms)) \
        .to_pandas()
    return pa.Table.from_pandas(out.sort_values("rank"),
                                preserve_index=False)


def entry_flagship(sf_dir: str = "/root/testdata/sf0.001") -> pa.Table:
    """The driver smoke entry: build + query, return ranked hits."""
    return bm25_documents(sf_dir)


# fixed boolean query set: must AND-gates, should adds score, must_not
# excludes; includes the edge cases (absent must term -> 0 rows for
# that query; should term fully cancelled by must_not -> 0 rows)
BOOL_QUERIES = [
    {"query_id": 0, "must": "spark", "should": "window merge",
     "must_not": "", "k": 10},
    {"query_id": 1, "must": "hash join", "should": "", "must_not": "",
     "k": 10},
    {"query_id": 2, "must": "", "should": "vector stream",
     "must_not": "the", "k": 10},
    {"query_id": 3, "must": "customer", "should": "big slow",
     "must_not": "merge sort", "k": 10},
    {"query_id": 4, "must": "zzzmissing spark", "should": "", "must_not": "",
     "k": 10},
    {"query_id": 5, "must": "", "should": "big", "must_not": "big", "k": 5},
]


# fixed wildcard/prefix query set ('s*' expands to 6 corpus terms;
# 'zzz*' expands to nothing -> 0 rows for that query)
PREFIX_QUERIES = [
    {"query_id": 0, "query_text": "s*", "k": 10},
    {"query_id": 1, "query_text": "c*", "k": 10},
    {"query_id": 2, "query_text": "jo* hash", "k": 10},
    {"query_id": 3, "query_text": "qu*", "k": 5},
    {"query_id": 4, "query_text": "zzz*", "k": 10},
]


def bm25_prefix(sf_dir: str) -> pa.Table:
    """PREFIX_QUERIES over the documents index: wildcard terms expand
    against the global dictionary, then score as a plain multi-term
    query (index/query.search_prefix_index).  Result
    (query_id, rank, doc_id, score_r)."""
    from ..index.query import search_prefix_index
    index_dir = documents_index(sf_dir)
    res = search_prefix_index(index_dir, PREFIX_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


def search_facets(sf_dir: str) -> pa.Table:
    """Faceted search over the conversation-shaped index: for each
    DOC_QUERY, counts of MATCHING turns (≥1 query term present) per
    ``lang`` docmap attribute — the search-aggregation analog
    (index/query.facet_counts_index).  Result (query_id, facet, n)."""
    from ..index.query import facet_counts_index
    index_dir = conversations_index(sf_dir)
    return facet_counts_index(index_dir, DOC_QUERIES, "lang")


def search_facet_stats(sf_dir: str) -> pa.Table:
    """Faceted STATS over the conversation-shaped index: per DOC_QUERY
    and ``lang`` facet, matching-turn count AND mean doc length over
    the FULL match set — the ES terms-aggregation with an avg
    sub-metric (index/query.facet_stats_index).  Result (query_id,
    facet, n, avg_dl)."""
    from ..index.query import facet_stats_index
    index_dir = conversations_index(sf_dir)
    return facet_stats_index(index_dir, DOC_QUERIES, "lang")


# fixed more-like-this seed docs (doc_ids present at every sf)
MLT_SEED_IDS = [0, 101, 202]
MLT_MAX_TERMS = 6
MLT_K = 10


def more_like_this(sf_dir: str) -> pa.Table:
    """MLT over the documents index: each seed doc's text is reduced to
    its MLT_MAX_TERMS most informative terms (tf × global idf, ties by
    term), searched as plain BM25, the seed itself excluded
    (index/query.more_like_this_index).  Result
    (query_id, rank, doc_id, score_r)."""
    import pyarrow.parquet as pq
    from ..index.query import more_like_this_index

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"],
                      filters=[("doc_id", "in", MLT_SEED_IDS)])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    index_dir = documents_index(sf_dir)
    seeds = [{"query_id": i, "text": texts[d], "k": MLT_K,
              "exclude": (f"{d:010d}", 0)}
             for i, d in enumerate(MLT_SEED_IDS)]
    res = more_like_this_index(index_dir, seeds,
                               max_query_terms=MLT_MAX_TERMS)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


PAGE_OFFSET, PAGE_K = 5, 5


def bm25_paged(sf_dir: str) -> pa.Table:
    """Page 2 of DOC_QUERIES (ranks 6..10): per-query offset pagination
    with GLOBAL rank numbers — exact because each segment surfaces its
    local top-(offset+k).  Result (query_id, rank, doc_id, score_r)."""
    index_dir = documents_index(sf_dir)
    paged = [{**q, "k": PAGE_K, "offset": PAGE_OFFSET} for q in DOC_QUERIES]
    res = search_index(index_dir, paged)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


def match_counts(sf_dir: str) -> pa.Table:
    """Total-hit counts for DOC_QUERIES over the documents index
    (index/query.match_counts_index).  Result (query_id, n), n = 0 for
    no-match queries."""
    from ..index.query import match_counts_index
    index_dir = documents_index(sf_dir)
    return match_counts_index(index_dir, DOC_QUERIES)


# multi-field split: first TITLE_TOKENS analyzed tokens are the
# "title" field, the rest the "body"; per-field boosts below
TITLE_TOKENS, TITLE_WEIGHT, BODY_WEIGHT = 4, 2.0, 1.0


def field_documents_index(sf_dir: str, field: str,
                          cfg: EngineConfig = DOCS_CFG) -> str:
    """Build (or resume) one FIELD index of the documents corpus: the
    text is analyzed, sliced into title (first TITLE_TOKENS tokens) or
    body (the rest), and indexed as its own aligned index — same
    corpus, same config, so segments and docmap order agree across
    fields (index/query.search_fields_index relies on this)."""
    import hashlib
    import json as _json
    from ..analyze import Tokenizer

    tag = os.path.basename(os.path.normpath(sf_dir))
    cfg_fp = hashlib.sha1(_json.dumps(cfg.to_dict(), sort_keys=True)
                          .encode()).hexdigest()[:8]
    index_dir = os.path.join(_cache_root(), f"docs-f{field}-{tag}-{cfg_fp}")
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        tok = Tokenizer(cfg.analyzer)

        def lift(t: pa.Table) -> pa.Table:
            toks = tok.tokenize_array(t["text"])
            sl = pc.list_slice(toks, 0, TITLE_TOKENS) if field == "title" \
                else pc.list_slice(toks, TITLE_TOKENS, None)
            pad = pc.utf8_lpad(pc.cast(t["doc_id"], pa.string()), 10, "0")
            return pa.table({
                "conv_id": pad,
                "turn_idx": pa.array(np.zeros(t.num_rows, dtype=np.int32)),
                "text": pc.binary_join(sl, " "),
            })

        ds = _read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
        build_index(ds.map_batches(lift, batch_format="pyarrow",
                                   zero_copy_batch=True), index_dir, cfg)
    return index_dir


def bm25_fields(sf_dir: str) -> pa.Table:
    """DOC_QUERIES with per-field boosts: score = TITLE_WEIGHT ×
    BM25_title + BODY_WEIGHT × BM25_body, each field against its own
    aligned index (index/query.search_fields_index).  Result
    (query_id, rank, doc_id, score_r)."""
    from ..index.query import search_fields_index
    fields = [(field_documents_index(sf_dir, "title"), TITLE_WEIGHT),
              (field_documents_index(sf_dir, "body"), BODY_WEIGHT)]
    res = search_fields_index(fields, DOC_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


DISMAX_TIE = 0.3


def bm25_dismax(sf_dir: str) -> pa.Table:
    """DOC_QUERIES under DisjunctionMax field combination: score =
    max(TITLE_WEIGHT × BM25_title, BODY_WEIGHT × BM25_body)
    + DISMAX_TIE × (sum − max) — the best field dominates
    (index/query.search_fields_index(combine='dismax'))."""
    from ..index.query import search_fields_index
    fields = [(field_documents_index(sf_dir, "title"), TITLE_WEIGHT),
              (field_documents_index(sf_dir, "body"), BODY_WEIGHT)]
    res = search_fields_index(fields, DOC_QUERIES, combine="dismax",
                              tie_breaker=DISMAX_TIE)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


def merged_documents_index(sf_dir: str, cfg: EngineConfig = DOCS_CFG
                           ) -> str:
    """Two disjoint partial indexes (doc_id % 3 == 0 vs != 0) merged
    into one via :func:`~vframe_ray.index.compact.merge_indexes` —
    no re-tokenization; results must be value-identical to the
    full-corpus oracle because BM25 depends only on global stats +
    per-doc stats, both rebuilt exactly by the merge."""
    import hashlib
    import json as _json
    import shutil

    from ..index.build import build_index
    from ..index.compact import merge_indexes

    tag = os.path.basename(os.path.normpath(sf_dir))
    cfg_fp = hashlib.sha1(_json.dumps(cfg.to_dict(), sort_keys=True)
                          .encode()).hexdigest()[:8]
    index_dir = os.path.join(_cache_root(), f"docs-merged-{tag}-{cfg_fp}")
    marker = os.path.join(index_dir, "MERGED")
    if not os.path.exists(marker):
        shutil.rmtree(index_dir, ignore_errors=True)

        def part(keep_third: bool, name: str) -> str:
            def pick(t: pa.Table) -> pa.Table:
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                return t.filter(pa.array((ids % 3 == 0) == keep_third))

            def lift(t: pa.Table) -> pa.Table:
                pad = pc.utf8_lpad(pc.cast(t["doc_id"], pa.string()),
                                   10, "0")
                return pa.table({
                    "conv_id": pad,
                    "turn_idx": pa.array(
                        np.zeros(t.num_rows, dtype=np.int32)),
                    "text": t["text"],
                })

            d = os.path.join(_cache_root(),
                             f"docs-part{name}-{tag}-{cfg_fp}")
            if not os.path.exists(os.path.join(d, "manifest.json")):
                ds = _read_parquet(
                    os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"])
                build_index(ds.map_batches(pick, batch_format="pyarrow")
                            .map_batches(lift, batch_format="pyarrow"),
                            d, cfg)
            return d

        merge_indexes([part(False, "a"), part(True, "b")], index_dir,
                      target_segments=cfg.index.num_segments)
        with open(marker, "w") as f:
            f.write("ok")
    return index_dir


def bm25_merged(sf_dir: str) -> pa.Table:
    """DOC_QUERIES over the merged two-part index; same shape/oracle as
    :func:`bm25_documents` — the equality IS the merge-correctness
    claim."""
    index_dir = merged_documents_index(sf_dir)
    res = search_index(index_dir, DOC_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


def grep_documents(sf_dir: str, pattern: str = "vector [a-z]*am"
                   ) -> pa.Table:
    """Regex scan over the corpus (no index): one vectorized
    match_substring_regex kernel per batch — the `pipe skip-detections`
    raw-content filter shape.  Returns matching (doc_id) sorted."""
    ds = _read_parquet(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])

    def scan(t: pa.Table) -> pa.Table:
        m = pc.match_substring_regex(t["text"], pattern)
        return t.filter(m).select(["doc_id"])

    out = ds.map_batches(scan, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    if out.empty:                       # zero matches: keep the schema
        return pa.table({"doc_id": pa.array([], pa.int64())})
    return pa.Table.from_pandas(out.sort_values("doc_id"),
                                preserve_index=False)


DELETE_MOD = 7


def deleted_documents_index(sf_dir: str, cfg: EngineConfig = DOCS_CFG
                            ) -> str:
    """A documents index with every doc_id % DELETE_MOD == 0 conversation
    tombstoned via :func:`~vframe_ray.index.build.delete_docs` — the
    query paths must mask them while corpus stats stay pre-delete
    (Lucene semantics)."""
    import hashlib
    import json as _json
    import pyarrow.parquet as pq
    from ..index.build import build_index, delete_docs

    tag = os.path.basename(os.path.normpath(sf_dir))
    cfg_fp = hashlib.sha1(_json.dumps(cfg.to_dict(), sort_keys=True)
                          .encode()).hexdigest()[:8]
    index_dir = os.path.join(_cache_root(), f"docs-del-{tag}-{cfg_fp}")
    marker = os.path.join(index_dir, "DELETED")
    if not os.path.exists(marker):
        import shutil
        shutil.rmtree(index_dir, ignore_errors=True)
        build_index(documents_as_transcripts(sf_dir), index_dir, cfg)
        ids = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id"])["doc_id"].to_pylist()
        delete_docs(index_dir,
                    [f"{d:010d}" for d in ids if d % DELETE_MOD == 0])
        with open(marker, "w") as f:
            f.write("ok")
    return index_dir


def bm25_deleted(sf_dir: str) -> pa.Table:
    """DOC_QUERIES over the tombstoned documents index: deleted docs
    never surface; scores keep PRE-delete corpus stats until compaction
    purges.  Result (query_id, rank, doc_id, score_r)."""
    index_dir = deleted_documents_index(sf_dir)
    res = search_index(index_dir, DOC_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


# user-config synonym map (reference analog: label alias maps); 'quick'
# is absent from the corpus vocabulary -> contributes nothing
SYNONYMS = {"merge": ["join"], "fast": ["slow", "quick"]}
SYN_QUERIES = [
    {"query_id": 0, "query_text": "merge window", "k": 10},
    {"query_id": 1, "query_text": "fast", "k": 10},
    {"query_id": 2, "query_text": "the fast merge", "k": 10},
]

# fuzzy query set: 'vektor' is 1 edit from 'vector'; 'haash' 1 from
# 'hash'; 'zzzzz' matches nothing
FUZZY_QUERIES = [
    {"query_id": 0, "query_text": "vektor", "k": 10},
    {"query_id": 1, "query_text": "haash sort", "k": 10},
    {"query_id": 2, "query_text": "zzzzz", "k": 10},
]


def bm25_synonyms(sf_dir: str) -> pa.Table:
    """SYN_QUERIES with query-time synonym expansion over the documents
    index (index/query.search_synonym_index)."""
    from ..index.query import search_synonym_index
    index_dir = documents_index(sf_dir)
    res = search_synonym_index(index_dir, SYN_QUERIES, SYNONYMS)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


def bm25_fuzzy(sf_dir: str) -> pa.Table:
    """FUZZY_QUERIES with Levenshtein-1 dictionary expansion
    (index/query.search_fuzzy_index)."""
    from ..index.query import search_fuzzy_index
    index_dir = documents_index(sf_dir)
    res = search_fuzzy_index(index_dir, FUZZY_QUERIES, max_edits=1)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


#  Tuned to the synthetic corpus's df profile (31-term vocabulary, most
#  terms in ~80% of the 500 docs): both bounds genuinely fire — the
#  floor prunes the one rare term ('dup', df≈25), the ceiling prunes
#  the several most-ubiquitous terms — while a healthy mid-band
#  vocabulary survives to score.
DF_PRUNE_MIN = 30          # drop rare terms (df < 30)
DF_PRUNE_MAX_RATIO = 0.79  # drop terms present in > 79% of docs


def df_pruned_documents_index(sf_dir: str,
                              min_df: int = DF_PRUNE_MIN,
                              max_df_ratio: float = DF_PRUNE_MAX_RATIO
                              ) -> str:
    """Documents index with DF-BOUNDED vocabulary (min_df/max_df — the
    Lucene/sklearn vocabulary-pruning knob): pass 1 computes global
    (term, df) with the bucketed term-stats reduce, pass 2 builds under
    an analyzer whose stopword set is the PRUNED terms — data-driven
    stopwords, so dl/avgdl/df are all post-prune and the stored config
    makes query terms prune identically.

    Scale note: the max_df side (common terms) is always tiny and
    broadcastable; the min_df side is vocabulary-sized, fine for this
    corpus but at the 100-TB design point rare-term pruning belongs in
    segment compaction (drop posting lists below the df floor at merge
    time) rather than an analyzer stopword list."""
    import pyarrow.parquet as _pq

    from ..stages.stats import term_stats
    from ..stages.tokenize import tokenize

    n_docs = _pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    stats = term_stats(tokenize(documents_as_transcripts(sf_dir))) \
        .to_pandas()
    df = stats["df"].to_numpy()
    pruned = stats.loc[(df < min_df)
                       | (df > max_df_ratio * n_docs), "term"]
    cfg = EngineConfig(
        analyzer=AnalyzerConfig(stopwords=frozenset(pruned)),
        index=IndexConfig(num_segments=4, block_size=128))
    return documents_index(sf_dir, cfg)


def bm25_df_pruned(sf_dir: str) -> pa.Table:
    """DOC_QUERIES over the df-pruned index: rare and ubiquitous terms
    contribute nothing on either the doc or the query side."""
    index_dir = df_pruned_documents_index(sf_dir)
    res = search_index(index_dir, DOC_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


def federated_documents_indexes(sf_dir: str) -> list[str]:
    """Two cached indexes over the doc_id-parity PARTITIONS of the
    documents corpus — the federation fixture: disjoint doc spaces,
    identical config, together exactly the full corpus."""
    import hashlib
    import json as _json

    tag = os.path.basename(os.path.normpath(sf_dir))
    cfg = EngineConfig(index=IndexConfig(num_segments=3, block_size=128))
    cfg_fp = hashlib.sha1(_json.dumps(cfg.to_dict(), sort_keys=True)
                          .encode()).hexdigest()[:8]
    dirs = []
    for parity in (0, 1):
        index_dir = os.path.join(_cache_root(),
                                 f"docs-fed{parity}-{tag}-{cfg_fp}")
        manifest = os.path.join(index_dir, "manifest.json")
        if not os.path.exists(manifest):
            def lift(t: pa.Table, parity=parity) -> pa.Table:
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                t = t.filter(pa.array(ids % 2 == parity))
                pad = pc.utf8_lpad(pc.cast(t["doc_id"], pa.string()),
                                   10, "0")
                return pa.table({
                    "conv_id": pad,
                    "turn_idx": pa.array(
                        np.zeros(t.num_rows, dtype=np.int32)),
                    "text": t["text"],
                })
            ds = _read_parquet(
                os.path.join(sf_dir, "documents.parquet"),
                columns=["doc_id", "text"]) \
                .map_batches(lift, batch_format="pyarrow",
                             zero_copy_batch=True)
            build_index(ds, index_dir, cfg)
        dirs.append(index_dir)
    return dirs


def bm25_federated(sf_dir: str) -> pa.Table:
    """DOC_QUERIES over TWO partition indexes queried as one corpus via
    :func:`~vframe_ray.index.entrypoints.search_federated` — combined
    N/avgdl/df make the scores value-identical to the single
    full-corpus index, so the oracle is the plain BM25 SQL."""
    from ..index.query import search_federated
    res = search_federated(federated_documents_indexes(sf_dir),
                           DOC_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


MSM_QUERIES = [
    # pure should with a 2-of-3 bar
    {"query_id": 0, "must": "", "should": "vector stream window",
     "must_not": "", "k": 10, "minimum_should_match": 2},
    # must + should bar together
    {"query_id": 1, "must": "customer", "should": "big slow merge",
     "must_not": "", "k": 10, "minimum_should_match": 2},
    # bar above the clause count: provably 0 rows
    {"query_id": 2, "must": "", "should": "spark join",
     "must_not": "", "k": 10, "minimum_should_match": 3},
    # msm=1 must equal the default ≥1-should semantics
    {"query_id": 3, "must": "", "should": "vector stream",
     "must_not": "the", "k": 10, "minimum_should_match": 1},
]


def bm25_msm(sf_dir: str) -> pa.Table:
    """MSM_QUERIES over the documents index: boolean retrieval with
    ``minimum_should_match`` — a doc must hold ≥ m DISTINCT should
    terms (Lucene msm), on top of the must/must_not gates.  Same
    scatter-gather as bm25_boolean; the count is segment-exact."""
    from ..index.query import search_boolean_index
    index_dir = documents_index(sf_dir)
    res = search_boolean_index(index_dir, MSM_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


def bm25_boolean(sf_dir: str) -> pa.Table:
    """BOOL_QUERIES over the documents index: Lucene-style boolean
    retrieval (must/should/must_not) with BM25 scoring over the
    must∪should terms (index/query.search_boolean_index).  Result
    (query_id, rank, doc_id, score_r) in the SQL-oracle shape."""
    from ..index.query import search_boolean_index
    index_dir = documents_index(sf_dir)
    res = search_boolean_index(index_dir, BOOL_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


def bm25_conversations_collapsed(sf_dir: str) -> pa.Table:
    """Field collapsing: DOC_QUERIES over the conversation-shaped index,
    top-k CONVERSATIONS per query, each represented by its best-scoring
    turn (search_index(collapse=True) — exact under the build's
    hash(conv_id) partitioning; see index/query.py)."""
    index_dir = conversations_index(sf_dir)
    res = search_index(index_dir, DOC_QUERIES, collapse=True)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "conv_id": res["conv_id"],
        "turn_idx": res["turn_idx"],
        "score_r": pc.round(res["score"], ndigits=6),
    })


WILD_QUERIES = [
    {"query_id": 0, "query_text": "v*r filter", "k": 10},  # mid-star + literal
    {"query_id": 1, "query_text": "qu?ry", "k": 10},       # single-char hole
    {"query_id": 2, "query_text": "*ow", "k": 10},         # leading wildcard
]


def bm25_wildcard(sf_dir: str) -> pa.Table:
    """WILD_QUERIES with general mid-pattern wildcard expansion
    (index/entrypoints.search_like_index): ``*``/``?`` anywhere in a
    token, leading-literal dictionary pushdown, per-term-idf scoring."""
    from ..index.query import search_like_index
    index_dir = documents_index(sf_dir)
    res = search_like_index(index_dir, WILD_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


REGEX_QUERIES = [
    # v.*r → vector; 'filter' is its own (literal) regex
    {"query_id": 0, "query_text": "v.*r filter", "k": 10},
    # alternation inside a token
    {"query_id": 1, "query_text": "qu(e|i)ry", "k": 10},
    # leading metachar: full dictionary scan (row/slow/window)
    {"query_id": 2, "query_text": ".*ow", "k": 10},
    # quantifier right after the literal run: the prune prefix must
    # drop to 'sor' / 'ag' for these to still match
    {"query_id": 3, "query_text": "sort* agg?", "k": 10},
]


def bm25_regex(sf_dir: str) -> pa.Table:
    """REGEX_QUERIES with full-match regex expansion against the
    dictionary (index/entrypoints.search_regex_index): RE2 on both
    sides, leading-literal pushdown with the quantifier-drop rule,
    per-term-idf scoring of the expanded union."""
    from ..index.query import search_regex_index
    index_dir = documents_index(sf_dir)
    res = search_regex_index(index_dir, REGEX_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


DYM_TERMS = ["vectr", "haash", "colum", "lin", "zzzzz"]


def did_you_mean(sf_dir: str) -> pa.Table:
    """Spell correction over the corpus dictionary: SymSpell edit-1
    candidates ranked by document frequency (df desc, term asc);
    'zzzzz' has no candidate and emits no row
    (index/entrypoints.suggest_corrections)."""
    from ..index.query import suggest_corrections
    index_dir = documents_index(sf_dir)
    return suggest_corrections(index_dir, DYM_TERMS, max_edits=1)


FS_QUERIES = [
    {"query_id": 0, "query_text": "spark window merge", "k": 10},
    {"query_id": 1, "query_text": "vector", "k": 8},
    {"query_id": 2, "query_text": "hash join agg sort scan", "k": 10},
    {"query_id": 3, "query_text": "big", "k": 15},
]
FS_WEIGHT = 0.2


def documents_attr_index(sf_dir: str) -> str:
    """Documents index carrying the ``n_chars`` docmap attribute (the
    function-score factor column); cache dir fingerprinted like the
    plain documents index."""
    import hashlib
    import json as _json
    cfg = DOCS_CFG
    tag = os.path.basename(os.path.normpath(sf_dir))
    cfg_fp = hashlib.sha1(_json.dumps(cfg.to_dict(), sort_keys=True)
                          .encode()).hexdigest()[:8]
    index_dir = os.path.join(_cache_root(), f"docsattr-{tag}-{cfg_fp}")
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        ds = _read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text", "n_chars"])

        def lift(t: pa.Table) -> pa.Table:
            pad = pc.utf8_lpad(pc.cast(t["doc_id"], pa.string()), 10, "0")
            return pa.table({
                "conv_id": pad,
                "turn_idx": pa.array(np.zeros(t.num_rows, dtype=np.int32)),
                "text": t["text"],
                "n_chars": t["n_chars"],
            })

        build_index(ds.map_batches(lift, batch_format="pyarrow",
                                   zero_copy_batch=True),
                    index_dir, cfg, attribute_cols=["n_chars"])
    return index_dir


SORT_ATTR_QUERIES = [
    {"query_id": 0, "query_text": "spark window", "k": 10},
    {"query_id": 1, "query_text": "vector", "k": 5},
    {"query_id": 2, "query_text": "zzzmissing dup", "k": 10},
]


def search_sorted_by_length(sf_dir: str) -> pa.Table:
    """SORT_ATTR_QUERIES with relevance ignored: matching docs ordered
    by the n_chars docmap attribute descending (ties by doc id) — the
    Elasticsearch sort-by-field mode
    (index/entrypoints.sort_by_attr_index)."""
    from ..index.query import sort_by_attr_index
    index_dir = documents_attr_index(sf_dir)
    res = sort_by_attr_index(index_dir, SORT_ATTR_QUERIES,
                             attr="n_chars")
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "n_chars": pc.cast(res["score"], pa.int64()),
    })


def bm25_function_score(sf_dir: str) -> pa.Table:
    """FS_QUERIES ranked by BM25 × (1 + w·ln(1 + n_chars)) — the
    attribute-boosted function-score mode (field_value_factor shape)
    over the n_chars-attributed documents index."""
    from ..index.query import function_score_index
    index_dir = documents_attr_index(sf_dir)
    res = function_score_index(index_dir, FS_QUERIES, attr="n_chars",
                               weight=FS_WEIGHT)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


MMR_QUERIES = [
    {"query_id": 0, "query_text": "spark window merge", "k": 12},
    {"query_id": 1, "query_text": "hash join sort", "k": 12},
    {"query_id": 2, "query_text": "the customer", "k": 10},
]
MMR_K = 5


def bm25_mmr(sf_dir: str) -> pa.Table:
    """Diversity-aware retrieval: BM25 top-N candidate recall, then the
    MMR greedy (stages/similarity.mmr_rerank) picks MMR_K results per
    query trading rounded relevance against int8-code cosine redundancy
    (lam = 0.5).  Assumes doc_id == vec_id alignment."""
    import numpy as np

    from ..index.query import search_index
    from ..stages.similarity import mmr_rerank

    index_dir = documents_index(sf_dir)
    res = search_index(index_dir, MMR_QUERIES)
    df = res.to_pandas()
    cand = {}
    for qid, g in df.groupby("query_id"):
        ids = np.asarray([int(c) for c in g["conv_id"]], np.int64)
        rel = np.round(g["score"].to_numpy(np.float64), 6)
        cand[int(qid)] = (ids, rel)
    out = mmr_rerank(cand, os.path.join(sf_dir, "embeddings.parquet"),
                     k=MMR_K)
    return pa.table({
        "query_id": pa.array(out["query_id"].astype("int32")),
        "rank": pa.array(out["rank"].astype("int32")),
        "doc_id": pa.array(out["vec_id"].astype("int64")),
        "rel_r": pa.array(out["rel_r"].astype("float64")),
        "maxcos_r": pa.array(out["maxcos_r"].astype("float64")),
    })


BOOSTING_QUERIES = [
    # demote docs that also mention 'error'
    {"query_id": 0, "positive": "spark window merge",
     "negative": "error", "negative_boost": 0.3, "k": 10},
    # no negative matches in corpus -> pure positive ranking
    {"query_id": 1, "positive": "vector filter",
     "negative": "zzqqmissing", "negative_boost": 0.5, "k": 8},
    # heavy demotion: negative term shared by many positives
    {"query_id": 2, "positive": "hash join sort",
     "negative": "the", "negative_boost": 0.1, "k": 10},
]


def bm25_boosting(sf_dir: str) -> pa.Table:
    """ES boosting-query parity: positive BM25 ranking with
    negative-match demotion (index/entrypoints.search_boosting_index),
    demoted BEFORE the per-segment top-k cut so the merge is exact."""
    from ..index.query import search_boosting_index
    index_dir = documents_index(sf_dir)
    res = search_boosting_index(index_dir, BOOSTING_QUERIES)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })


def prepare_training_data(ds, *, min_tokens: int = 40,
                          chunk_size: int = 32,
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          source_col: str = "source"):
    """End-to-end training-data preparation — the composed pipeline a
    user of this engine actually runs, wired from the shipped stages
    with NO new kernels:

    1. exact dedup over NORMALIZED text, keep-first by id
       (:func:`~vframe_ray.stages.dedup.dedup_normalized`);
    2. length gate: >= ``min_tokens`` analyzer tokens;
    3. self-calibrating quality gate: per-doc unigram-LM cross-entropy
       over the SURVIVING corpus
       (:func:`~vframe_ray.stages.textquality.unigram_cross_entropy`),
       keep ``h_r <= round(mean(h_r), 6)`` — the q22-style
       computed-over-the-same-rows threshold;
    4. chunk the keepers into ``chunk_size``-token windows
       (:func:`~vframe_ray.stages.chunking.chunk_documents`,
       stride = size, no overlap);
    5. report (source, n_docs, n_chunks, n_tokens).

    Shuffle ledger: one text-hash exchange (dedup), two keyed
    exchanges inside cross-entropy, one ``hash_join`` to re-attach
    text for chunking, one to attach source — every stage's scale
    contract documented at its definition.  Returns pandas sorted by
    source.
    """
    import pandas as pd

    from ..analyze import Tokenizer
    from ..stages.chunking import chunk_documents
    from ..stages.dedup import dedup_normalized
    from ..stages.joins import hash_join
    from ..stages.textquality import unigram_cross_entropy

    kept = dedup_normalized(ds, key_cols=[id_col], text_col=text_col)

    def length_gate(t: pa.Table) -> pa.Table:
        tok = Tokenizer()
        n = tok.doc_lengths(tok.tokenize_array(
            pc.fill_null(t[text_col], ""))) \
            .to_numpy(zero_copy_only=False)
        return t.filter(pa.array(n >= min_tokens))

    surv = kept.map_batches(length_gate, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    h = unigram_cross_entropy(surv, id_col=id_col, text_col=text_col) \
        .materialize()

    def h_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "s": pa.array([float(pc.sum(t["h_r"]).as_py() or 0.0)]),
            "n": pa.array([t.num_rows], pa.int64())})

    parts = h.map_batches(h_partial, batch_format="pyarrow").to_pandas()
    n_surv = int(parts["n"].sum())
    thr = round(float(parts["s"].sum()) / n_surv, 6) if n_surv else 0.0

    def quality_gate(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t["h_r"], thr))

    good = h.map_batches(quality_gate, batch_format="pyarrow",
                         zero_copy_batch=True)
    # re-attach text (and source) for chunking: both sides distributed
    # materialized: consumed twice below (chunking + the final join) —
    # lazy lineage would re-execute the exchange per consumer
    good_docs = hash_join(good, surv, key=id_col,
                          left_cols=[id_col, "n_tokens"],
                          right_cols=[text_col, source_col]) \
        .materialize()
    chunks = chunk_documents(good_docs, size=chunk_size,
                             stride=chunk_size, id_col=id_col,
                             text_col=text_col)

    def chunk_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(id_col).aggregate([([], "count_all")])
        return g.rename_columns([id_col, "n_chunks"])

    per_doc = hash_join(
        good_docs, chunks.map_batches(chunk_partial,
                                      batch_format="pyarrow"),
        key=id_col, left_cols=[id_col, source_col, "n_tokens"],
        right_cols=["n_chunks"],
        post=lambda df: df.groupby([id_col, source_col, "n_tokens"],
                                   as_index=False)["n_chunks"].sum())
    agg = per_doc.to_pandas().groupby(source_col, as_index=False).agg(
        n_docs=(id_col, "nunique"), n_chunks=("n_chunks", "sum"),
        n_tokens=("n_tokens", "sum"))
    return agg.sort_values(source_col).reset_index(drop=True)


TOP_HITS_QUERIES = [
    {"query_id": 0, "query_text": "spark window merge", "h": 3},
    {"query_id": 1, "query_text": "the customer", "h": 2},
]


def search_top_hits(sf_dir: str) -> pa.Table:
    """ES top_hits-per-bucket parity over the conversation-shaped index:
    per query and ``lang`` facet, the top-h matching turns by BM25
    (index/entrypoints.top_hits_index)."""
    from ..index.query import top_hits_index
    index_dir = conversations_index(sf_dir)
    res = top_hits_index(index_dir, TOP_HITS_QUERIES, "lang")
    return pa.table({
        "query_id": res["query_id"],
        "facet": res["facet"],
        "rank": res["rank"],
        "conv_id": res["conv_id"],
        "turn_idx": res["turn_idx"],
        "score_r": pc.round(res["score"], ndigits=6),
    })


EVAL_QUERIES = [
    # mid: conjunctive docs exist but BM25's tf-sum ranking mostly
    # misses them in the top-10 — the discriminative case
    {"query_id": 0, "query_text": "dup stream vector window sort",
     "k": 10},
    # saturating: conjunctions are common, top-10 all relevant
    {"query_id": 1, "query_text": "spark window merge join filter sort",
     "k": 10},
    # zero: no doc holds all three terms
    {"query_id": 2, "query_text": "vector gram spill", "k": 10},
]


def retrieval_eval(sf_dir: str) -> pa.Table:
    """Search-quality evaluation harness over conjunctive pseudo-qrels
    (index/entrypoints.retrieval_eval_index): AP@k / NDCG@k of the
    BM25 ranking where relevance = doc holds ALL query terms."""
    from ..index.query import retrieval_eval_index
    index_dir = documents_index(sf_dir)
    return retrieval_eval_index(index_dir, EVAL_QUERIES)


PRF_QUERIES = [
    {"query_id": 0, "query_text": "spark window", "k": 10},
    {"query_id": 1, "query_text": "hash join", "k": 10},
    {"query_id": 2, "query_text": "vector", "k": 10},
]
PRF_D = 5          # feedback depth (docs)
PRF_M = 3          # expansion terms added


def bm25_prf(sf_dir: str) -> pa.Table:
    """Pseudo-relevance-feedback expansion (Rocchio / RM3-lite): run
    the query, take the top ``PRF_D`` docs as pseudo-relevant, add the
    ``PRF_M`` terms with the highest total tf across them (original
    terms excluded, ties by term asc), and re-search with the expanded
    term set — the classic recall-boosting second pass, fully
    deterministic so the two-round pipeline is SQL-mirrorable.

    Feedback docs re-read via ONE pushdown-filtered parquet read
    (≤ queries × D docs — the term_vectors finalists discipline);
    everything else is two ordinary scatter-gather searches.
    Returns (query_id, rank, doc_id, score_r).
    """
    import pandas as pd

    from ..analyze import Tokenizer
    from ..index.query import search_index
    index_dir = documents_index(sf_dir)
    tok = Tokenizer()
    initial = search_index(index_dir, [
        {"query_id": q["query_id"], "query_text": q["query_text"],
         "k": PRF_D} for q in PRF_QUERIES]).to_pandas()
    initial["doc_id"] = initial["conv_id"].astype("int64")
    doc_ids = sorted(set(initial["doc_id"]))
    docs = _read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"],
                         filter=pc.field("doc_id").isin(doc_ids)) \
        .to_pandas() if doc_ids else pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"),
             "text": pd.Series(dtype="object")})
    tf_by_doc = {int(r.doc_id): pd.Series(
        tok.tokenize(r.text)).value_counts()
        for r in docs.itertuples()}
    expanded = []
    for q in PRF_QUERIES:
        orig = set(tok.tokenize(q["query_text"]))
        fb = initial[initial["query_id"] == q["query_id"]]["doc_id"]
        sums: dict[str, int] = {}
        for d in fb:
            for t, n in tf_by_doc.get(int(d), {}).items():
                if t not in orig:
                    sums[t] = sums.get(t, 0) + int(n)
        top = sorted(sums.items(), key=lambda kv: (-kv[1], kv[0]))
        exp = [t for t, _ in top[:PRF_M]]
        expanded.append({
            "query_id": q["query_id"],
            "query_text": " ".join(sorted(orig | set(exp))),
            "k": q["k"]})
    res = search_index(index_dir, expanded)
    return pa.table({
        "query_id": res["query_id"],
        "rank": res["rank"],
        "doc_id": pc.cast(res["conv_id"], pa.int64()),
        "score_r": pc.round(res["score"], ndigits=6),
    })
