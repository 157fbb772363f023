"""Text analysis stages: token counting, quality scoring, language-ID,
document fingerprinting.

These are the textual analog of the reference's attribute-extraction
trio (reference: src/commands/utils/media-attrs.py → media-attrs-filter
→ media-attrs-summarize — per-file header attributes, filter chain,
global stats): flat per-doc feature columns computed in a vectorized
``map_batches``, filterable by the predicate DSL, aggregable.

Every feature in ``quality_features`` is deliberately SQL-expressible so
the DuckDB oracle can validate it value-for-value.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..analyze import Tokenizer

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language-ID.  Deterministic; ties broken by language name ascending.
LANG_STOPWORDS: dict[str, frozenset] = {
    "en": frozenset("the and of to in is you that it he was for on are as with his they i at be this have from or one had by word but not what all were we when your can said there use an each which she do how their if".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als auch es an werden aus er hat dass sie nach wird bei einer um am sind noch wie einem über einen so zum war haben nur oder".split()),
    "fr": frozenset("de la le et les des en un du une que est pour qui dans a par plus pas au sur ne se ce il sont la vous je avec son bien cette mais ses tout nous comme ou si leur y dont quand".split()),
    "es": frozenset("de la que el en y a los del se las por un para con no una su al lo como mas pero sus le ya o este si porque esta entre cuando muy sin sobre tambien me hasta hay donde quien desde todo nos".split()),
    "zh": frozenset("de le shi wo you he ta zhe zhong da lai shang guo dao ye hen zai men hao dou mei qu ni ge na".split()),
}


class QualityStage:
    """Per-doc quality features, vectorized (pandas string kernels):
    n_tokens, n_distinct, avg_token_len, stopword_ratio (EN list),
    punct_ratio, upper_ratio, digit_ratio."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.tok = Tokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pandas().fillna("")
        toks = [self.tok.tokenize(t) for t in texts]
        n_tokens = np.array([len(t) for t in toks], dtype=np.int64)
        n_distinct = np.array([len(set(t)) for t in toks], dtype=np.int64)
        tok_chars = np.array([sum(len(w) for w in t) for t in toks],
                             dtype=np.float64)
        stop = LANG_STOPWORDS["en"]
        n_stop = np.array([sum(w in stop for w in t) for t in toks],
                          dtype=np.int64)
        n_chars = texts.str.len().to_numpy(dtype=np.float64)
        n_alpha = np.array([sum(c.isalnum() or c.isspace() for c in t)
                            for t in texts], dtype=np.float64)
        safe_tok = np.maximum(n_tokens, 1).astype(np.float64)
        safe_chars = np.maximum(n_chars, 1.0)
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_tokens": pa.array(n_tokens),
            "n_distinct": pa.array(n_distinct),
            "avg_token_len": pa.array(tok_chars / safe_tok),
            "stopword_ratio": pa.array(n_stop / safe_tok),
            "punct_ratio": pa.array((n_chars - n_alpha) / safe_chars),
        })


def quality_features(ds, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(QualityStage(id_col, text_col),
                          batch_format="pyarrow", zero_copy_batch=True)


class LangIdStage:
    """Stopword-hit language ID (n-gram-free heuristic): predicted lang =
    argmax over languages of stopword hits; 'und' (undetermined) when no
    list scores > 0.  Ties broken by language code ascending (stable).

    Stateful analyzer built once per actor (reference pattern:
    haardetect.py:78-79 cascade loaded once)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.tok = Tokenizer()
        self.langs = sorted(LANG_STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch[self.text_col].to_pylist():
            toks = self.tok.tokenize(t)
            best_lang, best = "und", 0
            for lang in self.langs:
                score = sum(w in LANG_STOPWORDS[lang] for w in toks)
                if score > best:
                    best, best_lang = score, lang
            preds.append(best_lang)
        return pa.table({self.id_col: batch[self.id_col],
                         "pred_lang": pa.array(preds, pa.string())})


def langid(ds, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(LangIdStage, batch_format="pyarrow",
                          fn_constructor_kwargs=dict(id_col=id_col,
                                                     text_col=text_col),
                          concurrency=(1, 4))


class FingerprintStage:
    """Deterministic 64-bit document fingerprint: polynomial rolling hash
    over the token stream (order-sensitive, unlike the bag-of-words
    hashes) — the analog of the reference's per-file sha256 identity
    (file_utils.py:50-60) but over normalized tokens so formatting
    changes don't alter it."""

    B = np.uint64(1000003)
    MOD_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col
        self.tok = Tokenizer()

    def fingerprint(self, tokens: list[str]) -> int:
        h = np.uint64(1469598103934665603)          # FNV offset
        for t in tokens:
            th = np.uint64(int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"))
            h = ((h * self.B) & self.MOD_MASK) ^ th
        return int(h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [self.fingerprint(self.tok.tokenize(t))
               for t in batch[self.text_col].to_pylist()]
        return pa.table({
            self.id_col: batch[self.id_col],
            "fingerprint": pa.array(np.array(fps, dtype=np.uint64)
                                    .astype(np.int64)),
        })


def fingerprints(ds, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(FingerprintStage(id_col, text_col),
                          batch_format="pyarrow")
