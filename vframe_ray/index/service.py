"""Long-lived query serving: persistent shard-searcher actors + the
QueryService front end.  Split out of the former index/query.py
monolith (VERDICT r3 next #6 — no behavior change)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..analyze import Tokenizer
from ..config import BM25Config, EngineConfig
from .entrypoints import (_expand_wildcards, _mlt_plain_queries,
                          _mlt_seed_tfs, _mlt_trim_excluded,
                          _parse_wildcard_queries, parse_boosted_query,
                          suggest_terms)
from .fuzzy import expand_fuzzy_terms
from .scatter import validate_predicates
from .searcher import (_RESULT_SCHEMA, SegmentSearcher,
                       _global_df_for_terms, _merge_topk_driver,
                       idf)


@ray.remote
class _ShardSearcher:
    """Persistent query-serving actor owning a shard of segments: docmaps
    + doc-length norms resident across queries (the reference pattern of
    scorer state loaded once per worker, detect.py:73 / base.py:47-55)."""

    def __init__(self, seg_dirs: list[str], bm25_dict: dict, n_docs: int,
                 avgdl: float, block_size: int):
        from ..runtime import tune_memory
        tune_memory()
        self.searchers = [
            SegmentSearcher(d, BM25Config(**bm25_dict), n_docs, avgdl, {},
                            block_size=block_size)
            for d in seg_dirs]

    _EMPTY = pa.table({"query_id": pa.array([], pa.int32()),
                       "conv_id": pa.array([], pa.string()),
                       "turn_idx": pa.array([], pa.int32()),
                       "score": pa.array([], pa.float64())})

    def reload_deletes(self) -> int:
        """Re-read every resident segment's tombstone sidecar; returns
        the number of tombstoned docs now visible to this shard."""
        n = 0
        for s in self.searchers:
            s.r.reload_deletes()
            if s.r.alive is not None:
                n += int((~s.r.alive).sum())
        return n

    @staticmethod
    def _shard_topk(table: pa.Table,
                    ks: dict[int, int]) -> pa.Table:
        """Per-query top-k cut over this shard's candidate rows, in the
        exact global (score desc, conv_id, turn_idx) order — merging
        per-shard top-ks therefore equals merging every candidate row,
        and the actor→driver transfer shrinks from O(segments·k) to
        O(k) per query per shard."""
        if table.num_rows == 0:
            return table
        df = table.to_pandas()
        df = df.sort_values(["query_id", "score", "conv_id", "turn_idx"],
                            ascending=[True, False, True, True])
        r = df.groupby("query_id", sort=False).cumcount() + 1
        df = df.loc[r <= df["query_id"].map(ks).fillna(0)]
        return pa.Table.from_pandas(df, preserve_index=False) \
            .cast(table.schema)

    def search(self, parsed: list[tuple[int, list[str], int]],
               idf_map: dict[str, float], use_bmw: bool = True,
               predicates: list[str] | None = None,
               collapse: bool = False):
        if not self.searchers:
            return self._EMPTY
        rows = []
        for s in self.searchers:
            s.idf = idf_map
            rows.append(s.search(parsed, use_bmw=use_bmw,
                                 predicates=predicates, prefer_taat=True,
                                 collapse=collapse))
        out = pa.concat_tables(rows)
        if len(rows) > 1:
            # valid under collapse too: conversations are disjoint across
            # segments (hash(conv_id) build partitioning), so per-segment
            # collapsed rows never share a conv_id
            out = self._shard_topk(out, {q[0]: q[2] for q in parsed})
        return out

    def search_function_score(self, parsed: list[tuple[int, list[str],
                                                       int]],
                              idf_map: dict[str, float], attr: str,
                              weight: float,
                              predicates: list[str] | None = None):
        if not self.searchers:
            return self._EMPTY
        rows = []
        for s in self.searchers:
            s.idf = idf_map
            rows.append(s.search_function_score(parsed, attr, weight,
                                                predicates=predicates))
        out = pa.concat_tables(rows)
        if len(rows) > 1:
            out = self._shard_topk(out, {qid: k for qid, _, k in parsed})
        return out

    def search_boolean(self, parsed: list[tuple], idf_map: dict[str, float],
                       predicates: list[str] | None = None):
        if not self.searchers:
            return self._EMPTY
        rows = []
        for s in self.searchers:
            s.idf = idf_map
            rows.append(s.search_boolean(parsed, predicates=predicates))
        out = pa.concat_tables(rows)
        if len(rows) > 1:
            out = self._shard_topk(
                out, {q[0]: q[4] for q in parsed})
        return out

    def facet_counts(self, parsed: list[tuple[int, list[str]]],
                     facet_col: str,
                     predicates: list[str] | None = None):
        tables = [s.facet_counts(parsed, facet_col, predicates=predicates)
                  for s in self.searchers]
        if not tables:
            return pa.table({"query_id": pa.array([], pa.int32()),
                             "facet": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.concat_tables(tables)

    def facet_stats(self, parsed: list[tuple[int, list[str]]],
                    facet_col: str,
                    predicates: list[str] | None = None):
        tables = [s.facet_stats(parsed, facet_col, predicates=predicates)
                  for s in self.searchers]
        if not tables:
            return pa.table({"query_id": pa.array([], pa.int32()),
                             "facet": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "dl_sum": pa.array([], pa.int64())})
        return pa.concat_tables(tables)

    def facet_range_counts(self, parsed: list[tuple[int, list[str]]],
                           bin_width: int,
                           predicates: list[str] | None = None):
        tables = [s.facet_range_counts(parsed, bin_width,
                                       predicates=predicates)
                  for s in self.searchers]
        if not tables:
            return pa.table({"query_id": pa.array([], pa.int32()),
                             "bin_lo": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.concat_tables(tables)

    def search_phrases(self, parsed: list[tuple[int, list[str]]],
                       predicates: list[str] | None = None):
        if not self.searchers:
            return self._EMPTY.drop_columns(["score"])
        return pa.concat_tables([s.search_phrases(parsed,
                                                  predicates=predicates)
                                 for s in self.searchers])

    def search_ranked_phrases(self, parsed: list[tuple[int, list[str], int]],
                              idf_map: dict[str, float],
                              predicates: list[str] | None = None):
        if not self.searchers:
            return self._EMPTY
        rows = []
        for s in self.searchers:
            s.idf = idf_map
            rows.append(s.search_ranked_phrases(parsed,
                                                predicates=predicates))
        out = pa.concat_tables(rows)
        if len(rows) > 1:
            out = self._shard_topk(out, {qid: k for qid, _, k in parsed})
        return out

    def search_proximity(self, parsed: list[tuple[int, list[str], int, int]],
                         idf_map: dict[str, float],
                         predicates: list[str] | None = None):
        if not self.searchers:
            return self._EMPTY
        rows = []
        for s in self.searchers:
            s.idf = idf_map
            rows.append(s.search_proximity(parsed, predicates=predicates))
        out = pa.concat_tables(rows)
        if len(rows) > 1:
            out = self._shard_topk(out, {q[0]: q[3] for q in parsed})
        return out

    def search_span_first(self, parsed: list[tuple[int, list[str],
                                                   int, int]],
                          idf_map: dict[str, float],
                          predicates: list[str] | None = None):
        if not self.searchers:
            return self._EMPTY
        rows = []
        for s in self.searchers:
            s.idf = idf_map
            rows.append(s.search_span_first(parsed,
                                            predicates=predicates))
        out = pa.concat_tables(rows)
        if len(rows) > 1:
            out = self._shard_topk(out, {q[0]: q[3] for q in parsed})
        return out

    def search_common(self, parsed: list[tuple[int, list[str],
                                               list[str], int]],
                      idf_map: dict[str, float],
                      predicates: list[str] | None = None):
        if not self.searchers:
            return self._EMPTY
        rows = []
        for s in self.searchers:
            s.idf = idf_map
            rows.append(s.search_common(parsed, predicates=predicates))
        out = pa.concat_tables(rows)
        if len(rows) > 1:
            out = self._shard_topk(out, {q[0]: q[3] for q in parsed})
        return out

    def search_boosted(self, parsed: list[tuple[int, list[tuple], int]],
                       base_idf: dict[str, float],
                       predicates: list[str] | None = None):
        if not self.searchers:
            return self._EMPTY
        rows = [s.search_boosted(parsed, base_idf, predicates=predicates)
                for s in self.searchers]
        out = pa.concat_tables(rows)
        if len(rows) > 1:
            out = self._shard_topk(out, {qid: k for qid, _, k in parsed})
        return out

    def search_after(self, parsed: list[tuple],
                     idf_map: dict[str, float],
                     predicates: list[str] | None = None):
        if not self.searchers:
            return self._EMPTY
        rows = []
        for s in self.searchers:
            s.idf = idf_map
            rows.append(s.search_after(parsed, predicates=predicates))
        out = pa.concat_tables(rows)
        if len(rows) > 1:
            out = self._shard_topk(out, {qid: k for qid, _, k, _ in parsed})
        return out

    def top_hits(self, parsed: list[tuple], facet_col: str,
                 idf_map: dict[str, float],
                 predicates: list[str] | None = None):
        from .searcher import _TOP_HITS_SCHEMA
        if not self.searchers:
            return pa.table({f.name: [] for f in _TOP_HITS_SCHEMA},
                            schema=_TOP_HITS_SCHEMA)
        rows = []
        for s in self.searchers:
            s.idf = idf_map
            rows.append(s.top_hits_by_facet(parsed,
                                            facet_col,
                                            predicates=predicates))
        out = pa.concat_tables(rows)
        if len(rows) > 1:
            # per-(query, facet) local cut — same superset-safety as
            # the segment-level cut (facet is a doc property)
            import pandas as pd
            df = out.to_pandas()
            hs = {q[0]: q[2] for q in parsed}
            df = df.sort_values(["query_id", "facet", "score",
                                 "conv_id", "turn_idx"],
                                ascending=[True, True, False, True,
                                           True])
            df = df.groupby(["query_id", "facet"], sort=False) \
                .head(max(hs.values()) if hs else 0)
            keep = df.groupby(["query_id", "facet"],
                              sort=False).cumcount() < \
                df["query_id"].map(hs).to_numpy()
            out = pa.Table.from_pandas(df[keep], preserve_index=False) \
                .cast(_TOP_HITS_SCHEMA)
        return out

    def search_boosting(self, parsed: list[tuple],
                        idf_map: dict[str, float],
                        predicates: list[str] | None = None):
        if not self.searchers:
            return self._EMPTY
        rows = []
        for s in self.searchers:
            s.idf = idf_map
            rows.append(s.search_boosting(parsed, predicates=predicates))
        out = pa.concat_tables(rows)
        if len(rows) > 1:
            out = self._shard_topk(out,
                                   {q[0]: q[4] for q in parsed})
        return out

    def search_mixed(self, ops: list[dict], idf_map: dict[str, float],
                     predicates: list[str] | None = None):
        """ONE round trip for a heterogeneous query batch (VERDICT r3
        next #7: mixed proximity/boolean/facets/… used to fan out one
        actor call per mode).  ``ops`` entries carry {"mode", "parsed",
        …mode extras}; returns one table per op, each already per-shard
        top-k cut where the mode is ranked.  A single idf map covers
        the union of every op's terms, so hot decoded postings pinned
        by one op are reused by the next within the same call."""
        out = []
        for op in ops:
            mode, parsed = op["mode"], op["parsed"]
            if mode == "search":
                out.append(self.search(parsed, idf_map,
                                       op.get("use_bmw", True), predicates,
                                       op.get("collapse", False)))
            elif mode == "boolean":
                out.append(self.search_boolean(parsed, idf_map, predicates))
            elif mode == "proximity":
                out.append(self.search_proximity(parsed, idf_map,
                                                 predicates))
            elif mode == "span_first":
                out.append(self.search_span_first(parsed, idf_map,
                                                  predicates))
            elif mode == "phrase_rank":
                out.append(self.search_ranked_phrases(parsed, idf_map,
                                                      predicates))
            elif mode == "boosted":
                out.append(self.search_boosted(parsed, idf_map, predicates))
            elif mode == "boosting":
                out.append(self.search_boosting(parsed, idf_map,
                                                predicates))
            elif mode == "after":
                out.append(self.search_after(parsed, idf_map, predicates))
            elif mode == "facets":
                out.append(self.facet_counts(parsed, op["facet_col"],
                                             predicates))
            elif mode == "facet_ranges":
                out.append(self.facet_range_counts(parsed, op["bin_width"],
                                                   predicates))
            else:
                raise ValueError(f"search_mixed: unknown mode {mode!r}")
        return out


class QueryService:
    """Long-lived BM25 top-k query service over a finished index.

    Spawns ``n_actors`` shard searchers once (segments round-robin);
    each ``search()`` call tokenizes, looks up global df for the query
    terms (small parquet filter read), fans out to every shard, and
    merges the per-shard top-k on the driver.  Amortizes docmap loads
    and actor spin-up across calls — the serving-path counterpart of the
    one-shot :func:`search_index`.
    """

    def __init__(self, index_dir: "str | list[str]", n_actors: int = 8,
                 cfg: EngineConfig | None = None):
        """``index_dir`` may be a list of index dirs — FEDERATED
        serving: combined N/avgdl/df exactly as in
        :func:`~vframe_ray.index.entrypoints.search_federated`, shard
        actors over the union segment list.  Every mode federates:
        wildcard/prefix, general-LIKE and fuzzy expansion run against
        the UNION of the per-index dictionaries; did-you-mean and
        autocomplete rank candidates by df SUMMED across indexes."""
        from .build import load_index_meta
        from ..state.manifest import alias_resolve
        dirs = [index_dir] if isinstance(index_dir, str) \
            else list(index_dir)
        if not dirs:
            raise ValueError("QueryService needs at least one index")
        # resolve aliases ONCE: the service binds wholly to the target
        # at construction (segments AND dictionary); an alias flip is
        # picked up by constructing a fresh service, never half-seen
        # by a running one
        dirs = [alias_resolve(d) for d in dirs]
        metas = [load_index_meta(d) for d in dirs]
        cfg_dict, stats, seg_dirs = metas[0]
        self.cfg = EngineConfig.from_dict(cfg_dict) if cfg is None \
            else cfg.validate()
        for d, (cfg_d, st_d, segs_d) in zip(dirs[1:], metas[1:]):
            other = EngineConfig.from_dict(cfg_d)
            if (other.analyzer, other.bm25) != (self.cfg.analyzer,
                                                self.cfg.bm25):
                raise ValueError(
                    f"incompatible index configs: {dirs[0]} vs {d} "
                    "(analyzer/BM25 params must be equal)")
            seg_dirs = seg_dirs + segs_d
        if len(dirs) > 1:
            n_docs = sum(m[1]["n_docs"] for m in metas)
            total_len = sum(m[1]["total_len"] for m in metas)
            stats = {"n_docs": n_docs, "total_len": total_len,
                     "avgdl": (total_len / n_docs) if n_docs else 0.0}
        self.index_dirs = dirs
        self.index_dir = dirs[0]
        self._federated = len(dirs) > 1
        self.stats = stats
        self.tok = Tokenizer(self.cfg.analyzer)
        n_actors = max(1, min(n_actors, len(seg_dirs)))
        shards = [seg_dirs[i::n_actors] for i in range(n_actors)]
        bm25_dict = {"k1": self.cfg.bm25.k1, "b": self.cfg.bm25.b}
        self.actors = [
            _ShardSearcher.remote(sh, bm25_dict, stats["n_docs"],
                                  stats["avgdl"],
                                  self.cfg.index.block_size)
            for sh in shards]
        # term -> global df (None = absent): the per-call driver-side
        # parquet filter read was ~24 ms at 9.6M docs (VERDICT r3
        # serving push) — repeated vocabularies now skip it entirely
        self._df_cache: dict[str, int | None] = {}
        # request cache (Elasticsearch request-cache analog): whole-call
        # results for the plain search mode keyed by the canonical call
        # payload.  Sound BY the service's visibility contract — index
        # mutations (extend/compact/attr updates) only become visible to
        # a live service via refresh_deletes()/restart, and
        # refresh_deletes clears the cache.  LRU-bounded; 0 disables.
        self.request_cache_size = 256
        self._req_cache: "dict[str, pa.Table]" = {}
        self._req_cache_hits = 0
        self._req_cache_misses = 0

    _DF_CACHE_CAP = 1 << 20   # OOV-flood bound, same spirit as ABSENT_CAP

    def _req_cache_key(self, mode: str, queries: list[dict],
                       **kwargs) -> str:
        import json as _json
        return _json.dumps([mode, queries, kwargs], sort_keys=True,
                           default=str)

    def _req_cache_get(self, key: str) -> "pa.Table | None":
        hit = self._req_cache.get(key)
        if hit is not None:
            self._req_cache_hits += 1
            # LRU touch: re-insert at the back of the dict order
            self._req_cache.pop(key)
            self._req_cache[key] = hit
        else:
            self._req_cache_misses += 1
        return hit

    def _req_cache_put(self, key: str, table: pa.Table) -> None:
        if self.request_cache_size <= 0:
            return
        while len(self._req_cache) >= self.request_cache_size:
            self._req_cache.pop(next(iter(self._req_cache)))
        self._req_cache[key] = table

    def _validate_predicates(self, predicates) -> None:
        for d in self.index_dirs:     # attrs must exist in EVERY index
            validate_predicates(d, predicates)


    def _gdf_cached(self, terms: set[str]) -> dict[str, int]:
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            if len(self._df_cache) + len(missing) > self._DF_CACHE_CAP:
                self._df_cache.clear()
            fresh: dict[str, int] = {}
            for d in self.index_dirs:     # federated: df sums per index
                for t, v in _global_df_for_terms(d, set(missing)).items():
                    fresh[t] = fresh.get(t, 0) + v
            for t in missing:
                self._df_cache[t] = fresh.get(t)
        return {t: v for t in terms
                if (v := self._df_cache.get(t)) is not None}

    def search(self, queries: list[dict], use_bmw: bool = True,
               predicates: list[str] | None = None,
               collapse: bool = False) -> pa.Table:
        ck = self._req_cache_key("search", queries, use_bmw=use_bmw,
                                 predicates=predicates, collapse=collapse)
        cached = self._req_cache_get(ck)
        if cached is not None:
            return cached
        offsets = {int(q["query_id"]): int(q.get("offset", 0))
                   for q in queries}
        for q in queries:
            if q.get("filter"):
                self._validate_predicates(list(q["filter"]))
        parsed = [(int(q["query_id"]),
                   sorted(set(self.tok.tokenize(q["query_text"]))),
                   int(q.get("k", 10)) + int(q.get("offset", 0)),
                   tuple(q["filter"]) if q.get("filter") else None)
                  for q in queries]
        terms = set().union(*[set(q[1]) for q in parsed]) if parsed \
            else set()
        gdf = self._gdf_cached(terms)
        idf_map = {t: idf(self.stats["n_docs"], df) for t, df in gdf.items()}
        # put the payload ONCE: passing `parsed`/`idf_map` inline
        # re-pickles them per actor (measured 25 ms of driver time per
        # 152-query call at 32 actors); top-level ObjectRef args are
        # auto-resolved by Ray, so the actor signature is unchanged
        parsed_ref = ray.put(parsed)
        idf_ref = ray.put(idf_map)
        futs = [a.search.remote(parsed_ref, idf_ref, use_bmw, predicates,
                                collapse)
                for a in self.actors]
        df = pa.concat_tables(ray.get(futs)).to_pandas()
        merged = _merge_topk_driver(
            df, {q[0]: q[2] - offsets.get(q[0], 0) for q in parsed},
            offsets if any(offsets.values()) else None)
        out = pa.Table.from_pandas(merged, preserve_index=False).cast(
            _RESULT_SCHEMA)
        self._req_cache_put(ck, out)
        return out

    def search_function_score(self, queries: list[dict], attr: str,
                              weight: float = 0.2,
                              predicates: list[str] | None = None
                              ) -> pa.Table:
        """Served function-score (field_value_factor) — same contract
        as :func:`function_score_index`, on the resident shards."""
        if predicates:
            self._validate_predicates(predicates)
        parsed = [(int(q["query_id"]),
                   sorted(set(self.tok.tokenize(q["query_text"]))),
                   int(q.get("k", 10))) for q in queries]
        terms = set().union(*[set(t) for _, t, _ in parsed]) if parsed \
            else set()
        gdf = self._gdf_cached(terms)
        idf_map = {t: idf(self.stats["n_docs"], df)
                   for t, df in gdf.items()}
        futs = [a.search_function_score.remote(parsed, idf_map, attr,
                                               weight, predicates)
                for a in self.actors]
        df = pa.concat_tables(ray.get(futs)).to_pandas()
        merged = _merge_topk_driver(df, {qid: k for qid, _, k in parsed})
        return pa.Table.from_pandas(merged, preserve_index=False).cast(
            _RESULT_SCHEMA)

    def search_boolean(self, queries: list[dict],
                       predicates: list[str] | None = None) -> pa.Table:
        """Served boolean retrieval — same contract as
        :func:`search_boolean_index`, on the resident shards."""
        if predicates:
            self._validate_predicates(predicates)

        def _tok(s: str) -> list[str]:
            return sorted(set(self.tok.tokenize(s or "")))

        parsed = [(int(q["query_id"]), _tok(q.get("must", "")),
                   _tok(q.get("should", "")), _tok(q.get("must_not", "")),
                   int(q.get("k", 10)),
                   int(q.get("minimum_should_match", 0)))
                  for q in queries]
        terms = set().union(*[set(q[1]) | set(q[2])
                              for q in parsed]) \
            if parsed else set()
        gdf = self._gdf_cached(terms)
        idf_map = {t: idf(self.stats["n_docs"], df) for t, df in gdf.items()}
        futs = [a.search_boolean.remote(parsed, idf_map, predicates)
                for a in self.actors]
        df = pa.concat_tables(ray.get(futs)).to_pandas()
        merged = _merge_topk_driver(
            df, {q[0]: q[4] for q in parsed})
        return pa.Table.from_pandas(merged, preserve_index=False).cast(
            _RESULT_SCHEMA)

    def search_prefix(self, queries: list[dict],
                      predicates: list[str] | None = None,
                      collapse: bool = False) -> pa.Table:
        """Served wildcard/prefix search — expansion against the global
        dictionary (one small range read per call), then :meth:`search`."""
        per_q, all_prefixes = _parse_wildcard_queries(self.tok, queries)
        plain = _expand_wildcards(self.index_dirs, per_q, all_prefixes)
        return self.search(plain, predicates=predicates, collapse=collapse)

    def search_like(self, queries: list[dict],
                    predicates: list[str] | None = None,
                    collapse: bool = False) -> pa.Table:
        """Served general wildcard search (``*``/``?`` anywhere in a
        token) — the same driver-side dictionary expansion as
        :func:`search_like_index`, then :meth:`search` on the resident
        shards."""
        from .entrypoints import _like_plain_queries
        plain = _like_plain_queries(self.index_dirs, self.tok, queries)
        return self.search(plain, predicates=predicates, collapse=collapse)

    def search_regex(self, queries: list[dict],
                     predicates: list[str] | None = None,
                     collapse: bool = False) -> pa.Table:
        """Served regex term search — the same driver-side full-match
        dictionary expansion as :func:`search_regex_index` (federated:
        expansion unions per-index dictionaries), then :meth:`search`
        on the resident shards."""
        from .entrypoints import _regex_plain_queries
        plain = _regex_plain_queries(self.index_dirs, self.tok, queries)
        return self.search(plain, predicates=predicates, collapse=collapse)

    def suggest_corrections(self, terms: list[str],
                            max_edits: int = 1) -> pa.Table:
        """Served did-you-mean — dictionary-only, so it simply reuses
        the one-shot path (no postings, no shard fan-out needed)."""
        from .entrypoints import suggest_corrections
        if not self._federated:
            return suggest_corrections(self.index_dir, terms, max_edits)
        # federated: candidates union per index, ranked by SUMMED df
        from .fuzzy import expand_fuzzy_terms as _efz
        uniq = sorted(set(terms))
        expansion: dict[str, set] = {t: set() for t in uniq}
        for d in self.index_dirs:
            for t, cs in _efz(d, uniq, max_edits).items():
                expansion[t].update(cs)
        cands = sorted(set().union(*expansion.values())) if uniq else []
        dfmap = self._gdf_cached(set(cands))
        rows = []
        for q in uniq:
            best = min(expansion[q],
                       key=lambda c: (-dfmap.get(c, 0), c),
                       default=None)
            if best is not None:
                rows.append((q, best, int(dfmap.get(best, 0))))
        return pa.table({
            "query_term": pa.array([r[0] for r in rows], pa.string()),
            "suggestion": pa.array([r[1] for r in rows], pa.string()),
            "df": pa.array([r[2] for r in rows], pa.int64())})

    def facet_counts(self, queries: list[dict], facet_col: str,
                     predicates: list[str] | None = None) -> pa.Table:
        """Served faceted search — per-shard partials summed on the
        driver; same contract as :func:`facet_counts_index`."""
        if predicates:
            self._validate_predicates(predicates)
        parsed = [(int(q["query_id"]),
                   sorted(set(self.tok.tokenize(q["query_text"]))))
                  for q in queries]
        futs = [a.facet_counts.remote(parsed, facet_col, predicates)
                for a in self.actors]
        parts = pa.concat_tables(ray.get(futs)).to_pandas()
        schema = pa.schema([("query_id", pa.int32()),
                            ("facet", pa.string()), ("n", pa.int64())])
        if parts.empty:
            return pa.table({f.name: [] for f in schema}, schema=schema)
        out = parts.groupby(["query_id", "facet"], as_index=False)["n"] \
            .sum().sort_values(["query_id", "facet"])
        return pa.Table.from_pandas(out, preserve_index=False).cast(schema)

    def facet_stats(self, queries: list[dict], facet_col: str,
                    predicates: list[str] | None = None) -> pa.Table:
        """Served faceted stats (count + mean doc length per facet over
        the full match set) — integer per-shard partials summed on the
        driver, ONE division; same contract as
        :func:`facet_stats_index`."""
        if predicates:
            self._validate_predicates(predicates)
        parsed = [(int(q["query_id"]),
                   sorted(set(self.tok.tokenize(q["query_text"]))))
                  for q in queries]
        futs = [a.facet_stats.remote(parsed, facet_col, predicates)
                for a in self.actors]
        parts = pa.concat_tables(ray.get(futs)).to_pandas()
        schema = pa.schema([("query_id", pa.int32()),
                            ("facet", pa.string()), ("n", pa.int64()),
                            ("avg_dl", pa.float64())])
        if parts.empty:
            return pa.table({f.name: [] for f in schema}, schema=schema)
        out = parts.groupby(["query_id", "facet"], as_index=False) \
            .agg(n=("n", "sum"), dl_sum=("dl_sum", "sum"))
        out["avg_dl"] = out["dl_sum"].to_numpy("int64") \
            / out["n"].to_numpy("int64")
        out = out[["query_id", "facet", "n", "avg_dl"]] \
            .sort_values(["query_id", "facet"])
        return pa.Table.from_pandas(out, preserve_index=False).cast(schema)

    def more_like_this(self, seeds: list[dict], *,
                       max_query_terms: int = 10,
                       predicates: list[str] | None = None) -> pa.Table:
        """Served MLT — term selection reuses the service df cache, then
        :meth:`search` with seed exclusion (k+1 over-fetch + trim)."""
        seed_tfs, all_terms = _mlt_seed_tfs(self.tok, seeds)
        gdf = self._gdf_cached(all_terms)
        plain = _mlt_plain_queries(seed_tfs, seeds, gdf,
                                   self.stats["n_docs"], max_query_terms)
        res = self.search(plain, predicates=predicates)
        return _mlt_trim_excluded(res, seeds)

    def search_ranked_phrases(self, phrases: list[dict],
                              predicates: list[str] | None = None
                              ) -> pa.Table:
        """phrases: [{"query_id", "phrase", "k"}] -> ranked scored table
        (query_id, rank, conv_id, turn_idx, score): phrase hits scored
        by BM25 over the phrase's terms, served by the resident shards
        in ONE actor round-trip per shard."""
        parsed = [(int(p["query_id"]), self.tok.tokenize(p["phrase"]),
                   int(p.get("k", 10))) for p in phrases]
        if predicates:
            self._validate_predicates(predicates)
        terms = set().union(*[set(t) for _, t, _ in parsed]) if parsed \
            else set()
        gdf = self._gdf_cached(terms)
        idf_map = {t: idf(self.stats["n_docs"], df) for t, df in gdf.items()}
        futs = [a.search_ranked_phrases.remote(parsed, idf_map, predicates)
                for a in self.actors]
        df = pa.concat_tables(ray.get(futs)).to_pandas()
        merged = _merge_topk_driver(df, {qid: k for qid, _, k in parsed})
        return pa.Table.from_pandas(merged, preserve_index=False).cast(
            _RESULT_SCHEMA)

    def search_proximity(self, queries: list[dict],
                         predicates: list[str] | None = None) -> pa.Table:
        """queries: [{"query_id", "query_text", "window", "k"}] ->
        ranked scored table: NEAR/W hits (all distinct terms within a
        ``window``-token span; ``"ordered": True`` = span-near in the
        given order) scored by BM25 over the query terms, served by the
        resident shards in ONE round-trip per shard."""
        parsed = [(int(q["query_id"]),
                   (self.tok.tokenize(q["query_text"])
                    if q.get("ordered")
                    else sorted(set(self.tok.tokenize(q["query_text"])))),
                   int(q.get("window", 8)), int(q.get("k", 10)),
                   bool(q.get("ordered", False)))
                  for q in queries]
        if predicates:
            self._validate_predicates(predicates)
        terms = set().union(*[set(q[1]) for q in parsed]) if parsed \
            else set()
        gdf = self._gdf_cached(terms)
        idf_map = {t: idf(self.stats["n_docs"], df) for t, df in gdf.items()}
        futs = [a.search_proximity.remote(parsed, idf_map, predicates)
                for a in self.actors]
        df = pa.concat_tables(ray.get(futs)).to_pandas()
        merged = _merge_topk_driver(df, {q[0]: q[3] for q in parsed})
        return pa.Table.from_pandas(merged, preserve_index=False).cast(
            _RESULT_SCHEMA)

    def search_span_first(self, queries: list[dict],
                          predicates: list[str] | None = None
                          ) -> pa.Table:
        """queries: [{"query_id", "query_text", "limit", "k"}] ->
        ranked scored table: docs where EVERY query term occurs within
        the first ``limit`` token positions (Lucene SpanFirstQuery
        semantics, conjunctive), scored by BM25 over the query terms,
        served by the resident shards in ONE round-trip per shard."""
        parsed = [(int(q["query_id"]),
                   sorted(set(self.tok.tokenize(q["query_text"]))),
                   int(q.get("limit", 16)), int(q.get("k", 10)))
                  for q in queries]
        if predicates:
            self._validate_predicates(predicates)
        terms = set().union(*[set(q[1]) for q in parsed]) if parsed \
            else set()
        gdf = self._gdf_cached(terms)
        idf_map = {t: idf(self.stats["n_docs"], df)
                   for t, df in gdf.items()}
        futs = [a.search_span_first.remote(parsed, idf_map, predicates)
                for a in self.actors]
        df = pa.concat_tables(ray.get(futs)).to_pandas()
        merged = _merge_topk_driver(df, {q[0]: q[3] for q in parsed})
        return pa.Table.from_pandas(merged, preserve_index=False).cast(
            _RESULT_SCHEMA)

    def search_common(self, queries: list[dict],
                      max_df_num: int = 2, max_df_den: int = 5,
                      predicates: list[str] | None = None) -> pa.Table:
        """queries: [{"query_id", "query_text", "k"}] -> ranked scored
        table with common-terms semantics (recall from low-df terms
        only, scoring over all terms; all-high-df queries fall back to
        plain recall).  The low/high split runs once on the driver
        against the service's cached global df."""
        parsed0 = [(int(q["query_id"]),
                    sorted(set(self.tok.tokenize(q["query_text"]))),
                    int(q.get("k", 10))) for q in queries]
        if predicates:
            self._validate_predicates(predicates)
        terms = set().union(*[set(t) for _, t, _ in parsed0]) \
            if parsed0 else set()
        gdf = self._gdf_cached(terms)
        n = self.stats["n_docs"]
        parsed = [(qid, ts,
                   [t for t in ts if t in gdf
                    and gdf[t] * max_df_den < n * max_df_num], k)
                  for qid, ts, k in parsed0]
        idf_map = {t: idf(n, df) for t, df in gdf.items()}
        futs = [a.search_common.remote(parsed, idf_map, predicates)
                for a in self.actors]
        df = pa.concat_tables(ray.get(futs)).to_pandas()
        merged = _merge_topk_driver(df, {q[0]: q[3] for q in parsed})
        return pa.Table.from_pandas(merged, preserve_index=False).cast(
            _RESULT_SCHEMA)

    def search_phrases(self, phrases: list[dict],
                       predicates: list[str] | None = None) -> pa.Table:
        """phrases: [{"query_id", "phrase"}] -> (query_id, conv_id,
        turn_idx) of docs containing each exact consecutive phrase,
        scatter-gathered across the resident shard actors."""
        parsed = [(int(p["query_id"]), self.tok.tokenize(p["phrase"]))
                  for p in phrases]
        if predicates:
            self._validate_predicates(predicates)
        futs = [a.search_phrases.remote(parsed, predicates)
                for a in self.actors]
        out = pa.concat_tables(ray.get(futs))
        return out.sort_by([("query_id", "ascending"),
                            ("conv_id", "ascending"),
                            ("turn_idx", "ascending")])

    def search_boosted(self, queries: list[dict],
                       predicates: list[str] | None = None) -> pa.Table:
        """Boosted search served by the resident shards: queries
        [{"query_id", "query_text", "k"}] with ``term^2.5`` boost
        syntax in the text (see :func:`parse_boosted_query`)."""
        parsed = [(int(q["query_id"]),
                   parse_boosted_query(self.tok, str(q["query_text"])),
                   int(q.get("k", 10))) for q in queries]
        if predicates:
            self._validate_predicates(predicates)
        terms = set(t for _, tb, _ in parsed for t, _ in tb)
        gdf = self._gdf_cached(terms)
        base_idf = {t: idf(self.stats["n_docs"], df)
                    for t, df in gdf.items()}
        futs = [a.search_boosted.remote(parsed, base_idf, predicates)
                for a in self.actors]
        df = pa.concat_tables(ray.get(futs)).to_pandas()
        merged = _merge_topk_driver(df, {qid: k for qid, _, k in parsed})
        return pa.Table.from_pandas(merged, preserve_index=False).cast(
            _RESULT_SCHEMA)

    def top_hits(self, queries: list[dict], facet_col: str,
                 predicates: list[str] | None = None) -> pa.Table:
        """Served top_hits-per-bucket: queries [{"query_id",
        "query_text", "h"}] → (query_id, facet, rank, conv_id,
        turn_idx, score); parity with the one-shot
        :func:`~vframe_ray.index.entrypoints.top_hits_index`."""
        import pandas as pd
        parsed = [(int(q["query_id"]),
                   sorted(set(self.tok.tokenize(q["query_text"]))),
                   int(q.get("h", 3))) for q in queries]
        if predicates:
            self._validate_predicates(predicates)
        terms = set(t for _, ts, _ in parsed for t in ts)
        gdf = self._gdf_cached(terms)
        idf_map = {t: idf(self.stats["n_docs"], df)
                   for t, df in gdf.items()}
        parsed_ref = ray.put(parsed)
        futs = [a.top_hits.remote(parsed_ref, facet_col, idf_map,
                                  predicates)
                for a in self.actors]
        df = pa.concat_tables(ray.get(futs)).to_pandas()
        hs = {qid: h for qid, _, h in parsed}
        out_schema = pa.schema([
            ("query_id", pa.int32()), ("facet", pa.string()),
            ("rank", pa.int32()), ("conv_id", pa.string()),
            ("turn_idx", pa.int32()), ("score", pa.float64())])
        if df.empty:
            return pa.table({f.name: [] for f in out_schema},
                            schema=out_schema)
        df = df.sort_values(["query_id", "facet", "score", "conv_id",
                             "turn_idx"],
                            ascending=[True, True, False, True, True]) \
            .reset_index(drop=True)
        df["rank"] = (df.groupby(["query_id", "facet"], sort=False)
                      .cumcount() + 1).astype("int32")
        df = df[df["rank"] <= df["query_id"].map(hs)]
        df = df[["query_id", "facet", "rank", "conv_id", "turn_idx",
                 "score"]].reset_index(drop=True)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .cast(out_schema)

    def search_boosting(self, queries: list[dict],
                        predicates: list[str] | None = None) -> pa.Table:
        """Served boosting compound: queries [{"query_id", "positive",
        "negative", "negative_boost", "k"}] — positive BM25 ranking
        with negative matchers demoted, demotion before every local
        top-k cut (exact; parity-tested vs the one-shot path)."""
        parsed = [(int(q["query_id"]),
                   sorted(set(self.tok.tokenize(q.get("positive", "")))),
                   sorted(set(self.tok.tokenize(q.get("negative", "")))),
                   float(q.get("negative_boost", 0.5)),
                   int(q.get("k", 10))) for q in queries]
        if predicates:
            self._validate_predicates(predicates)
        terms = set(t for q in parsed for t in (*q[1], *q[2]))
        gdf = self._gdf_cached(terms)
        idf_map = {t: idf(self.stats["n_docs"], df)
                   for t, df in gdf.items()}
        futs = [a.search_boosting.remote(parsed, idf_map, predicates)
                for a in self.actors]
        df = pa.concat_tables(ray.get(futs)).to_pandas()
        merged = _merge_topk_driver(df, {q[0]: q[4] for q in parsed})
        return pa.Table.from_pandas(merged, preserve_index=False).cast(
            _RESULT_SCHEMA)

    def search_after(self, queries: list[dict],
                     predicates: list[str] | None = None) -> pa.Table:
        """Served cursor pagination: queries [{"query_id", "query_text",
        "k", "after": (score, conv_id, turn_idx)}] — each shard returns
        only k rows past the cursor (no offset over-fetch)."""
        parsed = [(int(q["query_id"]),
                   sorted(set(self.tok.tokenize(q["query_text"]))),
                   int(q.get("k", 10)),
                   (float(q["after"][0]), str(q["after"][1]),
                    int(q["after"][2])))
                  for q in queries]
        if predicates:
            self._validate_predicates(predicates)
        terms = set().union(*[set(t) for _, t, _, _ in parsed]) if parsed \
            else set()
        gdf = self._gdf_cached(terms)
        idf_map = {t: idf(self.stats["n_docs"], df) for t, df in gdf.items()}
        futs = [a.search_after.remote(parsed, idf_map, predicates)
                for a in self.actors]
        df = pa.concat_tables(ray.get(futs)).to_pandas()
        merged = _merge_topk_driver(df, {qid: k for qid, _, k, _ in parsed})
        return pa.Table.from_pandas(merged, preserve_index=False).cast(
            _RESULT_SCHEMA)

    def facet_ranges(self, queries: list[dict], bin_width: int,
                     predicates: list[str] | None = None) -> pa.Table:
        """Served range facets (doc-length histogram over the full match
        set): per-shard (query, bin) partials summed on the driver."""
        parsed = [(int(q["query_id"]),
                   sorted(set(self.tok.tokenize(q["query_text"]))))
                  for q in queries]
        if predicates:
            self._validate_predicates(predicates)
        futs = [a.facet_range_counts.remote(parsed, bin_width, predicates)
                for a in self.actors]
        parts = pa.concat_tables(ray.get(futs)).to_pandas()
        schema = pa.schema([("query_id", pa.int32()),
                            ("bin_lo", pa.int64()), ("n", pa.int64())])
        if parts.empty:
            return pa.table({f.name: [] for f in schema}, schema=schema)
        out = parts.groupby(["query_id", "bin_lo"], as_index=False)["n"] \
            .sum().sort_values(["query_id", "bin_lo"])
        return pa.Table.from_pandas(out, preserve_index=False).cast(schema)

    def search_synonyms(self, queries: list[dict],
                        synonyms: dict[str, list[str]],
                        predicates: list[str] | None = None) -> pa.Table:
        """Served synonym expansion: the same pure query rewrite as
        :func:`search_synonym_index`, then the resident shards."""
        syn_norm: dict[str, list[str]] = {}
        for key, vals in synonyms.items():
            kt = self.tok.tokenize(key)
            if len(kt) != 1:
                raise ValueError(f"synonym key {key!r} must analyze to "
                                 f"one term")
            syn_norm[kt[0]] = [t for v in vals for t in self.tok.tokenize(v)]
        plain = []
        for q in queries:
            terms = set()
            for t in self.tok.tokenize(str(q.get("query_text", ""))):
                terms.add(t)
                terms.update(syn_norm.get(t, ()))
            plain.append({"query_id": int(q["query_id"]),
                          "query_text": " ".join(sorted(terms)),
                          "k": int(q.get("k", 10))})
        return self.search(plain, predicates=predicates)

    def search_fuzzy(self, queries: list[dict], *, max_edits: int = 1,
                     predicates: list[str] | None = None) -> pa.Table:
        """Served fuzzy search: SymSpell deletion-table expansion
        (sidecar built once per dictionary state, pushdown-read per
        call — sublinear in vocabulary; see index.fuzzy), then the
        resident shards."""
        parsed = [(int(q["query_id"]),
                   sorted(set(self.tok.tokenize(str(q.get("query_text",
                                                          ""))))),
                   int(q.get("k", 10))) for q in queries]
        all_terms = sorted(set().union(*[set(t) for _, t, _ in parsed])
                           ) if parsed else []
        expansion: dict[str, set] = {t: set() for t in all_terms}
        for d in self.index_dirs:     # federated: union of dictionaries
            for t, cs in expand_fuzzy_terms(d, all_terms,
                                            max_edits).items():
                expansion[t].update(cs)
        plain = []
        for qid, terms, k in parsed:
            ex = set()
            for t in terms:
                ex.update(expansion[t])
            plain.append({"query_id": qid,
                          "query_text": " ".join(sorted(ex)), "k": k})
        return self.search(plain, predicates=predicates)

    def search_mixed(self, requests: list[dict],
                     predicates: list[str] | None = None
                     ) -> list[pa.Table]:
        """Heterogeneous query batch in ONE round trip per shard
        (VERDICT r3 next #7).  Each request is {"mode": one of
        search|boolean|proximity|span_first|phrase_rank|boosted|after|
        facets|facet_ranges|prefix|like|regex (the expansion modes expand
        driver-side and ride as plain searches), "queries": [...],
        + mode extras
        ("facet_col",
        "bin_width", "collapse", "use_bmw")}; returns one result table
        per request, value-identical to calling the per-mode method
        (parity-tested).  Compared to one call per mode this saves
        (modes-1) × actor round trips and lets every mode share one
        global-df lookup and the shards' pinned hot postings."""
        if predicates:
            self._validate_predicates(predicates)
        ops: list[dict] = []
        merges: list[tuple] = []          # (kind, per-op merge payload)
        all_terms: set[str] = set()
        for req in requests:
            mode = req["mode"]
            qs = req["queries"]
            if mode in ("like", "prefix", "regex"):
                # expansion modes expand driver-side (one dictionary
                # read) and then ride the batch as plain searches
                if mode == "like":
                    from .entrypoints import _like_plain_queries
                    qs = _like_plain_queries(self.index_dirs, self.tok, qs)
                elif mode == "regex":
                    from .entrypoints import _regex_plain_queries
                    qs = _regex_plain_queries(self.index_dirs, self.tok,
                                              qs)
                else:
                    per_q, pats = _parse_wildcard_queries(self.tok, qs)
                    qs = _expand_wildcards(self.index_dirs, per_q, pats)
                req = {**req, "queries": qs}
                mode = "search"
            if mode == "search":
                offsets = {int(q["query_id"]): int(q.get("offset", 0))
                           for q in qs}
                for q in qs:
                    if q.get("filter"):
                        self._validate_predicates(list(q["filter"]))
                parsed = [(int(q["query_id"]),
                           sorted(set(self.tok.tokenize(q["query_text"]))),
                           int(q.get("k", 10)) + int(q.get("offset", 0)),
                           tuple(q["filter"]) if q.get("filter")
                           else None)
                          for q in qs]
                ops.append({"mode": mode, "parsed": parsed,
                            "use_bmw": bool(req.get("use_bmw", True)),
                            "collapse": bool(req.get("collapse", False))})
                merges.append(("topk",
                               {q[0]: q[2] - offsets.get(q[0], 0)
                                for q in parsed},
                               offsets if any(offsets.values()) else None))
                all_terms |= {t for q in parsed for t in q[1]}
            elif mode == "boolean":
                def _tok(s):
                    return sorted(set(self.tok.tokenize(s or "")))
                parsed = [(int(q["query_id"]), _tok(q.get("must", "")),
                           _tok(q.get("should", "")),
                           _tok(q.get("must_not", "")),
                           int(q.get("k", 10)),
                           int(q.get("minimum_should_match", 0)))
                          for q in qs]
                ops.append({"mode": mode, "parsed": parsed})
                merges.append(("topk",
                               {q[0]: q[4] for q in parsed},
                               None))
                all_terms |= {t for q in parsed
                              for t in (*q[1], *q[2])}
            elif mode == "proximity":
                parsed = [(int(q["query_id"]),
                           (self.tok.tokenize(q["query_text"])
                            if q.get("ordered")
                            else sorted(set(
                                self.tok.tokenize(q["query_text"])))),
                           int(q.get("window", 8)), int(q.get("k", 10)),
                           bool(q.get("ordered", False))) for q in qs]
                ops.append({"mode": mode, "parsed": parsed})
                merges.append(("topk", {q[0]: q[3] for q in parsed}, None))
                all_terms |= {t for q in parsed for t in q[1]}
            elif mode == "span_first":
                parsed = [(int(q["query_id"]),
                           sorted(set(self.tok.tokenize(
                               q["query_text"]))),
                           int(q.get("limit", 16)), int(q.get("k", 10)))
                          for q in qs]
                ops.append({"mode": mode, "parsed": parsed})
                merges.append(("topk", {q[0]: q[3] for q in parsed},
                               None))
                all_terms |= {t for q in parsed for t in q[1]}
            elif mode == "phrase_rank":
                parsed = [(int(p["query_id"]),
                           self.tok.tokenize(p["phrase"]),
                           int(p.get("k", 10))) for p in qs]
                ops.append({"mode": mode, "parsed": parsed})
                merges.append(("topk", {qid: k for qid, _, k in parsed},
                               None))
                all_terms |= {t for _, ts, _ in parsed for t in ts}
            elif mode == "boosted":
                parsed = [(int(q["query_id"]),
                           parse_boosted_query(self.tok,
                                               str(q["query_text"])),
                           int(q.get("k", 10))) for q in qs]
                ops.append({"mode": mode, "parsed": parsed})
                merges.append(("topk", {qid: k for qid, _, k in parsed},
                               None))
                all_terms |= {t for _, tb, _ in parsed for t, _ in tb}
            elif mode == "boosting":
                parsed = [(int(q["query_id"]),
                           sorted(set(self.tok.tokenize(
                               q.get("positive", "")))),
                           sorted(set(self.tok.tokenize(
                               q.get("negative", "")))),
                           float(q.get("negative_boost", 0.5)),
                           int(q.get("k", 10))) for q in qs]
                ops.append({"mode": mode, "parsed": parsed})
                merges.append(("topk", {q[0]: q[4] for q in parsed},
                               None))
                all_terms |= {t for q in parsed
                              for t in (*q[1], *q[2])}
            elif mode == "after":
                parsed = [(int(q["query_id"]),
                           sorted(set(self.tok.tokenize(q["query_text"]))),
                           int(q.get("k", 10)),
                           (float(q["after"][0]), str(q["after"][1]),
                            int(q["after"][2]))) for q in qs]
                ops.append({"mode": mode, "parsed": parsed})
                merges.append(("topk", {qid: k for qid, _, k, _ in parsed},
                               None))
                all_terms |= {t for _, ts, _, _ in parsed for t in ts}
            elif mode in ("facets", "facet_ranges"):
                parsed = [(int(q["query_id"]),
                           sorted(set(self.tok.tokenize(q["query_text"]))))
                          for q in qs]
                op = {"mode": mode, "parsed": parsed}
                if mode == "facets":
                    op["facet_col"] = req["facet_col"]
                    merges.append(("facet", "facet"))
                else:
                    op["bin_width"] = int(req["bin_width"])
                    merges.append(("facet", "bin_lo"))
                ops.append(op)
                all_terms |= {t for _, ts in parsed for t in ts}
            else:
                raise ValueError(f"search_mixed: unknown mode {mode!r}")

        gdf = self._gdf_cached(all_terms)
        idf_map = {t: idf(self.stats["n_docs"], df)
                   for t, df in gdf.items()}
        # one put for the whole heterogeneous payload (same per-actor
        # re-pickle save as QueryService.search)
        ops = ray.put(ops)
        idf_map = ray.put(idf_map)
        futs = [a.search_mixed.remote(ops, idf_map, predicates)
                for a in self.actors]
        per_shard = ray.get(futs)         # [shard][op] -> table

        results: list[pa.Table] = []
        for oi, merge in enumerate(merges):
            parts = pa.concat_tables([sh[oi] for sh in per_shard])
            if merge[0] == "topk":
                _, ks, offsets = merge
                merged = _merge_topk_driver(parts.to_pandas(), ks, offsets)
                results.append(pa.Table.from_pandas(
                    merged, preserve_index=False).cast(_RESULT_SCHEMA))
            else:
                key = merge[1]
                schema = pa.schema([
                    ("query_id", pa.int32()),
                    (key, pa.string() if key == "facet" else pa.int64()),
                    ("n", pa.int64())])
                df = parts.to_pandas()
                if df.empty:
                    results.append(pa.table({f.name: [] for f in schema},
                                            schema=schema))
                else:
                    out = df.groupby(["query_id", key],
                                     as_index=False)["n"].sum() \
                        .sort_values(["query_id", key])
                    results.append(pa.Table.from_pandas(
                        out, preserve_index=False).cast(schema))
        return results

    def suggest(self, prefixes: list[str], k: int = 10) -> pa.Table:
        """Autocomplete against the index's global term dictionary —
        see :func:`suggest_terms` (dictionary-only; no shard fan-out)."""
        return suggest_terms(self.index_dirs, prefixes, k)

    def refresh_deletes(self) -> int:
        """Make tombstones written after service start visible: every
        shard re-reads its sidecars.  Returns total tombstoned docs.
        The request cache is dropped — its entries were computed under
        the pre-refresh tombstone set."""
        self._req_cache.clear()
        return sum(ray.get([a.reload_deletes.remote()
                            for a in self.actors]))

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []


