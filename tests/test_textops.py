import numpy as np
import pyarrow as pa

import ray.data


def _docs(ray_session):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "turn_idx": pa.array([0, 1, 2], pa.int32()),
        "text": pa.array(["call 555 1234 now", "no digits here",
                          "x9y"]),
        "n": pa.array([10, 20, 30], pa.int64()),
    }))


def test_redact(ray_session):
    from vframe_ray.stages.textops import redact
    out = redact(_docs(ray_session), pattern="[0-9]+",
                 replacement="#").to_pandas().sort_values("doc_id")
    assert list(out["text_redacted"]) == ["call # # now", "no digits here",
                                          "x#y"]


def test_caption(ray_session):
    from vframe_ray.stages.textops import caption
    out = caption(_docs(ray_session), ["doc_id", "n"],
                  sep="/").to_pandas().sort_values("doc_id")
    assert list(out["caption"]) == ["0/10", "1/20", "2/30"]


def test_decimate(ray_session):
    from vframe_ray.stages.textops import decimate
    tbl = pa.table({"turn_idx": pa.array(np.arange(20, dtype=np.int32))})
    out = decimate(ray.data.from_arrow(tbl), 4).to_pandas()
    assert sorted(out["turn_idx"]) == [0, 4, 8, 12, 16]


def test_salted_sum_equals_plain_groupby(ray_session):
    from vframe_ray.stages.stats import salted_sum
    rng = np.random.default_rng(0)
    n = 5000
    keys = rng.choice(["hot"] * 8 + [f"k{i}" for i in range(50)], n)
    vals = rng.integers(0, 100, n)
    tbl = pa.table({"conv_id": pa.array(keys.astype(object), pa.string()),
                    "turn_idx": pa.array(np.zeros(n, dtype=np.int32)),
                    "key": pa.array(keys.astype(object), pa.string()),
                    "v": pa.array(vals.astype(np.int64))})
    ds = ray.data.from_arrow(tbl)
    got = salted_sum(ds, "key", ["v"], salt_factor=4).to_pandas() \
        .set_index("key")["v"].to_dict()
    import pandas as pd
    want = pd.DataFrame({"key": keys, "v": vals}).groupby("key")["v"] \
        .sum().to_dict()
    assert got == want


def test_term_stats_match_oracle_counts(ray_session):
    from vframe_ray.stages.stats import term_stats
    from vframe_ray.stages.tokenize import tokenize
    from collections import Counter
    texts = ["apple banana apple", "banana cherry", "apple", ""]
    tbl = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(4)]),
        "turn_idx": pa.array([0] * 4, pa.int32()),
        "text": pa.array(texts),
    })
    ds = tokenize(ray.data.from_arrow(tbl))
    out = term_stats(ds).to_pandas().set_index("term")
    df_want = Counter()
    cf_want = Counter()
    for t in texts:
        toks = t.split()
        for w in set(toks):
            df_want[w] += 1
        for w in toks:
            cf_want[w] += 1
    assert out["df"].to_dict() == dict(df_want)
    assert out["cf"].to_dict() == dict(cf_want)


def test_percolate_standing_queries(ray_session):
    """A doc matches a standing query iff it contains EVERY query term;
    repartitioning must not change the result (pure per-batch map)."""
    import ray.data

    from vframe_ray.stages.textops import percolate

    rows = [{"doc_id": 0, "text": "alpha beta gamma"},
            {"doc_id": 1, "text": "alpha alpha"},
            {"doc_id": 2, "text": "beta gamma"},
            {"doc_id": 3, "text": ""},
            {"doc_id": 4, "text": "gamma alpha beta delta"}]
    qs = [{"query_id": 0, "query_text": "alpha beta"},
          {"query_id": 1, "query_text": "gamma"},
          {"query_id": 2, "query_text": "zzz alpha"}]
    want = sorted([(0, 0), (4, 0), (0, 1), (2, 1), (4, 1)])
    a = percolate(ray.data.from_items(rows), qs)
    got = sorted((r["doc_id"], r["query_id"]) for r in a.take_all())
    assert got == want
    b = percolate(ray.data.from_items(rows).repartition(4), qs)
    assert sorted((r["doc_id"], r["query_id"])
                  for r in b.take_all()) == want
