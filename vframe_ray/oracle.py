"""Single-process BM25 oracle — the conformance authority.

The reference ships no automated tests; correctness is anchored on golden
example outputs (reference: data/examples/images/output/, README.md:57-72).
This module replaces those golden frames with an executable oracle: a naive,
obviously-correct in-memory inverted index + exact top-k BM25 scorer.  The
distributed engine must be *rank-identical* (same doc keys AND bit-identical
float64 scores) to this oracle on the deterministic synthetic corpus
(SURVEY.md §5, §7.4).

Determinism contract (mirrored exactly by the distributed engine):
- score(d, q) sums the per-term contributions in ascending sorted order of
  the distinct query terms;
- ties are broken by ascending (conv_id, turn_idx) — no global int doc id
  is required, which is what makes the distributed engine shuffle-free on
  doc-id assignment (SURVEY.md §7.4 "stable global doc_id").
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass

from .analyze import Tokenizer
from .config import BM25Config, EngineConfig


@dataclass(frozen=True)
class Hit:
    conv_id: str
    turn_idx: int
    score: float


class OracleIndex:
    """Naive in-memory inverted index over (conv_id, turn_idx, text) rows."""

    def __init__(self, rows, cfg: EngineConfig | None = None):
        """rows: (conv_id, turn_idx, text) or (conv_id, turn_idx, text,
        attrs_dict) — attrs enable predicate-filtered search."""
        self.cfg = (cfg or EngineConfig()).validate()
        tok = Tokenizer(self.cfg.analyzer)
        self.doc_keys: list[tuple[str, int]] = []
        self.doclens: list[int] = []
        self.attrs: list[dict] = []
        self.postings: dict[str, list[tuple[int, int]]] = {}  # term -> [(doc, tf)]
        self.positions: dict[tuple[str, int], list[int]] = {}  # (term, doc) -> pos
        # sort docs by (conv_id, turn_idx) so internal ids follow key order
        rows = sorted(rows, key=lambda r: (r[0], r[1]))
        for row in rows:
            conv_id, turn_idx, text = row[0], row[1], row[2]
            self.attrs.append(row[3] if len(row) > 3 else {})
            did = len(self.doc_keys)
            self.doc_keys.append((conv_id, int(turn_idx)))
            toks = tok.tokenize(text)
            self.doclens.append(len(toks))
            counts = Counter(toks)
            for term, tf in counts.items():
                self.postings.setdefault(term, []).append((did, tf))
            for pos, term in enumerate(toks):
                self.positions.setdefault((term, did), []).append(pos)
        self.n_docs = len(self.doc_keys)
        self.total_len = sum(self.doclens)
        self.avgdl = self.total_len / self.n_docs if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score_doc(self, did: int, terms: list[str], bm25: BM25Config) -> float:
        """BM25 of one doc for *distinct, sorted* query terms."""
        dl = self.doclens[did]
        norm = bm25.k1 * (1.0 - bm25.b + bm25.b * dl / self.avgdl)
        s = 0.0
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            tf = next((f for d, f in plist if d == did), 0)
            if tf:
                s += self.idf(t) * (tf * (bm25.k1 + 1.0)) / (tf + norm)
        return s

    def search(self, query: str, k: int = 10,
               predicate=None) -> list[Hit]:
        """Exact top-k: score every candidate doc, sort, cut.
        ``predicate``: optional callable(attrs_dict) -> bool filter."""
        if self.n_docs == 0:
            return []
        tok = Tokenizer(self.cfg.analyzer)
        terms = sorted(set(tok.tokenize(query)))
        cand: set[int] = set()
        for t in terms:
            cand.update(d for d, _ in self.postings.get(t, ()))
        if predicate is not None:
            cand = {d for d in cand if predicate(self.attrs[d])}
        bm25 = self.cfg.bm25
        scored = [(self.score_doc(d, terms, bm25), d) for d in cand]
        scored.sort(key=lambda sd: (-sd[0], self.doc_keys[sd[1]]))
        return [
            Hit(self.doc_keys[d][0], self.doc_keys[d][1], s)
            for s, d in scored[:k]
        ]

    def phrase_candidates(self, terms: list[str]) -> list[int]:
        """Docs containing all terms as a consecutive phrase (positional)."""
        if not terms:
            return []
        base = [d for d, _ in self.postings.get(terms[0], ())]
        out = []
        for d in base:
            p0 = set(self.positions.get((terms[0], d), ()))
            ok = set(p0)
            for i, t in enumerate(terms[1:], start=1):
                pi = self.positions.get((t, d), [])
                ok = {p for p in ok if p + i in pi}
                if not ok:
                    break
            if ok:
                out.append(d)
        return out
