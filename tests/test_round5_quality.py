"""Round-5 third-session wave: unigram-LM cross-entropy quality signal
(plus siblings added later in the session)."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _xent_scalar(texts):
    """Scalar oracle: corpus unigram MLE cross-entropy per doc (nats)."""
    from vframe_ray.analyze import Tokenizer
    tok = Tokenizer()
    docs = [tok.tokenize(t) for t in texts]
    cf = {}
    for d in docs:
        for t in d:
            cf[t] = cf.get(t, 0) + 1
    c = sum(cf.values())
    out = {}
    for i, d in enumerate(docs):
        if not d:
            continue
        s = sum(math.log(cf[t] / c) for t in d)
        out[i] = (len(d), round(-s / len(d), 6))
    return out


def test_unigram_cross_entropy_scalar_oracle(ray_session):
    import ray.data
    from vframe_ray.stages.textquality import unigram_cross_entropy
    texts = ["the cat sat on the mat", "the the the", "rare zyzzyva token",
             "", "cat mat", "on on the zyzzyva"]
    tbl = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                    "text": pa.array(texts)})
    out = unigram_cross_entropy(ray.data.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = _xent_scalar(texts)
    assert list(out["doc_id"]) == sorted(exp)       # empty doc absent
    for _, r in out.iterrows():
        n, h = exp[int(r["doc_id"])]
        assert int(r["n_tokens"]) == n
        assert r["h_r"] == pytest.approx(h, abs=1e-6)
    # an all-repeat doc of the most common term scores LOWEST
    assert out.set_index("doc_id")["h_r"].idxmin() == 1


def test_unigram_cross_entropy_partition_invariant(ray_session):
    # h_r must be a pure function of the corpus — never of block
    # boundaries (the per-doc float sum orders contributions by value)
    import ray.data
    from vframe_ray.stages.textquality import unigram_cross_entropy
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 30)))
             for _ in range(120)]
    tbl = pa.table({"doc_id": pa.array(np.arange(120, dtype=np.int64)),
                    "text": pa.array(texts)})
    outs = []
    for parts in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        outs.append(unigram_cross_entropy(ds).to_pandas()
                    .sort_values("doc_id").reset_index(drop=True))
    assert outs[0].equals(outs[1])


def test_unigram_cross_entropy_corpus_total_passthrough(ray_session):
    # an index-backed caller passes total_len instead of the pre-pass;
    # the result must be identical
    import ray.data
    from vframe_ray.stages.textquality import unigram_cross_entropy
    texts = ["alpha beta gamma", "alpha alpha beta", "gamma delta"]
    tbl = pa.table({"doc_id": pa.array(np.arange(3, dtype=np.int64)),
                    "text": pa.array(texts)})
    a = unigram_cross_entropy(ray.data.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = unigram_cross_entropy(ray.data.from_arrow(tbl),
                              corpus_total=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
