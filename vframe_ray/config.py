"""Engine configuration.

Validated dataclasses replace the reference's YAML ModelZoo registry +
dacite validation (reference: src/vframe/settings/app_cfg.py:191-213,
src/vframe/models/dnn.py:21-135): every tunable that the reference
spreads over YAML anchors and CLI flags lives here, with defaults chosen
for 100 TB-scale operation and overridable per run.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


@dataclass(frozen=True)
class AnalyzerConfig:
    """Tokenizer / normalization spec.

    The token rule is deliberately simple and *oracle-portable*: it must be
    expressible identically in Python ``re``, pyarrow compute, and ANSI SQL
    (DuckDB ``regexp_split_to_array``), because correctness is gated on a
    SQL oracle producing byte-identical terms.

    Rule: lowercase the text, then tokens are maximal runs of ``[a-z0-9]``.
    """

    token_pattern: str = "[a-z0-9]+"
    lowercase: bool = True
    # Optional stopword set; default empty so engine and SQL oracle agree
    # without needing the list shipped into SQL.
    stopwords: frozenset[str] = frozenset()
    # Optional stemmer: None (off) or "s" — the Harman S-stemmer
    # (ies→y / es→e / s→'' with the classic exception suffixes),
    # chosen because it is expressible identically in Python, Arrow
    # kernels and ANSI SQL (analyze.sql_stem_expr).  Applied after
    # stopword removal, at index AND query time.
    stem: str | None = None

    def validate(self) -> None:
        import re

        re.compile(self.token_pattern)
        if self.stem not in (None, "s"):
            raise ValueError(f"unknown stemmer {self.stem!r}")


@dataclass(frozen=True)
class BM25Config:
    """Okapi BM25 parameters (Robertson et al.; Lucene-style non-negative idf).

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d, q) = sum over *distinct* q terms of
                  idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    Summation is performed in ascending sorted term order so float64
    results are bit-identical between the distributed engine and the
    single-process oracle (SURVEY.md §7.4 "rank-identical scores").
    """

    k1: float = 1.2
    b: float = 0.75

    def validate(self) -> None:
        if self.k1 < 0 or not (0.0 <= self.b <= 1.0):
            raise ValueError(f"invalid BM25 params k1={self.k1} b={self.b}")


@dataclass(frozen=True)
class IndexConfig:
    """Physical index layout.

    - ``num_segments``: documents are partitioned into segments by
      ``xxhash(conv_id) % num_segments`` so every turn of a conversation
      co-locates (enables within-conversation operators, mirrors the
      reference's per-file container semantics, media.py:255).
      Size segments so one segment's text fits a worker heap: at 100 TB
      with ~1-2 GB of raw text per segment that is ~10^5 segments; the
      default here is sized for the sandbox test corpora.
    - ``block_size``: postings are delta+varint encoded in blocks of this
      many docs, each block carrying (max_tf, min_dl) so a BM25 upper
      bound (block-max WAND) is computable at query time with *global*
      avgdl — global stats never need to exist at build time.
    - ``hot_term_df_ratio`` / ``salt_factor``: terms whose partial-df
      exceeds the ratio are salted into ``salt_factor`` sub-keys during
      the global df merge groupby (SURVEY.md §4 skew row).
    """

    num_segments: int = 8
    block_size: int = 128
    hot_term_df_ratio: float = 0.10
    salt_factor: int = 16
    store_positions: bool = True

    def validate(self) -> None:
        if self.num_segments < 1 or self.block_size < 1 or self.salt_factor < 1:
            raise ValueError("num_segments, block_size, salt_factor must be >= 1")


@dataclass(frozen=True)
class EngineConfig:
    analyzer: AnalyzerConfig = field(default_factory=AnalyzerConfig)
    bm25: BM25Config = field(default_factory=BM25Config)
    index: IndexConfig = field(default_factory=IndexConfig)

    def validate(self) -> "EngineConfig":
        self.analyzer.validate()
        self.bm25.validate()
        self.index.validate()
        return self

    def to_dict(self) -> dict:
        d = asdict(self)
        d["analyzer"]["stopwords"] = sorted(self.analyzer.stopwords)
        return d

    @staticmethod
    def from_dict(d: dict) -> "EngineConfig":
        a = dict(d.get("analyzer", {}))
        a["stopwords"] = frozenset(a.get("stopwords", ()))
        return EngineConfig(
            analyzer=AnalyzerConfig(**a),
            bm25=BM25Config(**d.get("bm25", {})),
            index=IndexConfig(**d.get("index", {})),
        ).validate()


DEFAULT_CONFIG = EngineConfig()
