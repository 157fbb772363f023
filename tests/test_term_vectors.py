"""term_vectors_hits — each hit doc's full (term, tf) vector must equal
a scalar Counter over the tokenizer's output, and the hit set must be
exactly the ranked search results."""

from collections import Counter

import pyarrow.parquet as pq


def test_term_vectors_match_counter_and_hits(ray_session):
    from vframe_ray.analyze import Tokenizer
    from vframe_ray.index.query import search_index
    from vframe_ray.pipelines.flagship import (TV_QUERIES,
                                               documents_index,
                                               term_vectors_hits)
    sf = "/root/testdata/sf0.001"
    got = term_vectors_hits(sf)
    hits = search_index(documents_index(sf), TV_QUERIES).to_pandas()
    want_triples = set(zip(hits["query_id"].astype(int),
                           hits["rank"].astype(int),
                           hits["conv_id"].astype("int64")))
    got_triples = set(zip(got["query_id"].astype(int),
                          got["rank"].astype(int),
                          got["doc_id"].astype("int64")))
    assert got_triples == want_triples

    docs = pq.read_table(sf + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .set_index("doc_id")["text"]
    tok = Tokenizer()
    for (qid, doc), sub in got.groupby(["query_id", "doc_id"]):
        want = Counter(tok.tokenize(docs.loc[doc]))
        assert dict(zip(sub["term"], sub["tf"])) == dict(want), (qid, doc)
