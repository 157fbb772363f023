"""oov_rate — top-V vocabulary by collection frequency with the
(cf desc, term asc) tie-break, per-doc OOV counts, against a scalar
oracle; cf-tie boundary, empty docs, repartition invariance."""

import re
from collections import Counter

import numpy as np
import pandas as pd

import ray.data


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _brute(docs, V):
    cf = Counter()
    for d in docs:
        cf.update(_toks(d["text"]))
    vocab = set(t for t, _ in sorted(cf.items(),
                                     key=lambda kv: (-kv[1], kv[0]))[:V])
    rows = []
    for d in sorted(docs, key=lambda d: d["doc_id"]):
        tk = _toks(d["text"])
        if not tk:
            continue
        oov = sum(t not in vocab for t in tk)
        rows.append((d["doc_id"], len(tk), oov, oov / len(tk)))
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "n_oov",
                                       "oov_rate"])


DOCS = [
    # cf ties: bb and cc both occur 3 times -> with V=2 after 'aa'
    # (cf 4), the term-asc tie-break picks 'bb', leaves 'cc' OOV
    {"doc_id": 0, "text": "aa aa bb cc"},
    {"doc_id": 1, "text": "aa bb cc rare1"},
    {"doc_id": 2, "text": "aa bb cc rare2 rare3"},
    {"doc_id": 3, "text": ""},                       # no row
    {"doc_id": 4, "text": "!!!"},                    # no tokens, no row
]


def test_oov_rate_vs_brute_tiebreak_and_repartition(ray_session):
    from vframe_ray.stages.textquality import oov_rate
    want = _brute(DOCS, V=2)
    assert set(want.doc_id) == {0, 1, 2}
    # cc must be OOV everywhere (lost the tie to bb)
    assert want.loc[want.doc_id == 0, "n_oov"].iloc[0] == 1
    for parts in (1, 4):
        ds = ray.data.from_items(DOCS).repartition(parts)
        got = oov_rate(ds, top_v=2).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_oov_rate_vocab_covers_all(ray_session):
    """V >= distinct terms: zero OOV everywhere."""
    from vframe_ray.stages.textquality import oov_rate
    got = oov_rate(ray.data.from_items(DOCS), top_v=100).to_pandas()
    assert (got["n_oov"] == 0).all() and (got["oov_rate"] == 0.0).all()
