"""Stage registry + plugin loading — the engine's extension surface.

The reference dispatches its CLI through configurable command groups
loaded from arbitrary directories (reference: config.yaml:32-71
``commands: [{name, dir}]``; src/cli.py:54-166 two-stage click dispatch
over globbed command files).  Here the same capability is a flat
registry of named Dataset->Dataset stages:

- built-in stages self-register at import;
- user plugin directories (``--plugins`` on the CLI or the
  ``VFRAME_RAY_PLUGINS`` env var, ``os.pathsep``-separated) are scanned
  for ``*.py`` files which are imported and may call
  :func:`register` themselves;
- ``python -m vframe_ray stages`` lists everything, ``apply`` runs a
  registered stage over parquet input.
"""

from __future__ import annotations

import glob
import importlib.util
import os
import sys
from collections.abc import Callable

_REGISTRY: dict[str, Callable] = {}


def register(name: str, fn: Callable | None = None):
    """Register a stage under ``name``.  Usable directly
    (``register("x", fn)``) or as a decorator (``@register("x")``)."""
    def _put(f: Callable) -> Callable:
        if name in _REGISTRY and _REGISTRY[name] is not f:
            raise ValueError(f"stage {name!r} already registered")
        _REGISTRY[name] = f
        return f

    return _put(fn) if fn is not None else _put


def get(name: str) -> Callable:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown stage {name!r}; available: {available()}") \
            from None


def available() -> list[str]:
    return sorted(_REGISTRY)


def load_plugins(paths: list[str] | None = None) -> list[str]:
    """Import every ``*.py`` under the given directories (default:
    ``$VFRAME_RAY_PLUGINS``); modules register stages on import.
    Returns the list of loaded module names."""
    if paths is None:
        env = os.environ.get("VFRAME_RAY_PLUGINS", "")
        paths = [p for p in env.split(os.pathsep) if p]
    loaded = []
    for d in paths:
        for f in sorted(glob.glob(os.path.join(d, "*.py"))):
            mod_name = "vframe_ray_plugin_" + \
                os.path.splitext(os.path.basename(f))[0]
            spec = importlib.util.spec_from_file_location(mod_name, f)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[mod_name] = mod
            spec.loader.exec_module(mod)
            loaded.append(mod_name)
    return loaded


def _register_builtins() -> None:
    """Built-in stage table (lazy callables so importing the registry
    stays cheap; resolution happens at get())."""
    from .stages import chunking, dedup, multimodal, sessionize, \
        similarity, textops, textquality
    from .stages import stats as _stats

    for name, fn in {
        "redact": textops.redact,
        "caption": textops.caption,
        "decimate": textops.decimate,
        "quality_features": textquality.quality_features,
        "langid": textquality.langid,
        "bpe_token_count": textquality.bpe_token_count,
        "fingerprints": textquality.fingerprints,
        "winnow_fingerprints": textquality.winnow_fingerprints,
        "dedup_exact": dedup.dedup_exact,
        "jaccard_pairs": dedup.jaccard_pairs,
        "minhash_candidates": dedup.minhash_candidates,
        "simhash": dedup.simhash_table,
        "near_dedup": dedup.near_dedup_in_conversation,
        "near_dedup_embeddings": dedup.near_dedup_embeddings,
        "cosine_topk": similarity.cosine_topk,
        "cosine_dup_pairs": similarity.cosine_dup_pairs,
        "lsh_topk": similarity.lsh_topk,
        "ivf_topk": similarity.ivf_topk,
        "sessionize": sessionize.sessionize,
        "rollup_conversations": sessionize.rollup_conversations,
        "tumbling_window": sessionize.tumbling_window,
        "media_header_probe": multimodal.media_header_probe,
        "image_features": multimodal.image_features,
        "frame_sample": multimodal.frame_sample,
        # round-3 fourth wave
        "percolate": textops.percolate,
        "cross_contamination": dedup.cross_contamination,
        "hopping_window": sessionize.hopping_window,
        "term_cooccurrence": _stats.term_cooccurrence,
        "significant_terms": _stats.significant_terms,
        "binned_quantiles": _stats.binned_quantiles,
        "rerank_by_embedding": similarity.rerank_by_embedding,
        "srp_dup_pairs": similarity.srp_dup_pairs,
        # round 4
        "chunk_documents": chunking.chunk_documents,
        "pack_sequences": chunking.pack_sequences,
        "top_bigrams": _stats.top_bigrams,
        "tfidf_top_terms": _stats.tfidf_top_terms,
        "repetition_features": textquality.repetition_features,
        "event_funnel": sessionize.event_funnel,
        "duplicate_chunk_fraction": chunking.duplicate_chunk_fraction,
        # round-5 third session: LLM-quality wave
        "unigram_cross_entropy": textquality.unigram_cross_entropy,
        "flesch_reading_ease": textquality.flesch_reading_ease,
        "c4_rule_filter": textquality.c4_rule_filter,
        "char_entropy": textquality.char_entropy,
        "dedup_normalized": dedup.dedup_normalized,
        "ngram_novelty": dedup.ngram_novelty,
        "analyze_tokens": textops.analyze_tokens,
        "dup_span_coverage": chunking.dup_span_coverage,
        "winnow_pairs": dedup.winnow_pairs,
        "continuation_pairs": dedup.continuation_pairs,
        "image_dup_pairs": multimodal.image_dup_pairs,
    }.items():
        if name not in _REGISTRY:
            register(name, fn)


_register_builtins()
