"""Deterministic synthetic transcripts corpus + query set (FIXTURES.md).

Plays the role of the reference's committed example media
(reference: data/examples/, README.md:57-72): a seeded, reproducible
fixture the engine is validated against.  Exact shape from
``BASELINE.json:input_hint``:

    (conv_id:string, turn_idx:int32, role:string, text:string,
     tool:string, ts:timestamp[us])

Planted properties (FIXTURES.md §1, §5):
- Zipfian vocabulary (~10^4 terms) with a planted head of hot terms at
  df ≈ 30-50% of docs — exercises salted groupby skew handling;
- mixed case, punctuation, unicode NFC/NFD pairs, empty/whitespace-only
  turns, one very long outlier turn;
- exact-duplicate turns across conversations and near-duplicate
  (1-token-edit) consecutive turns within a conversation;
- files written in shuffled row order (ordering must be restored, not
  assumed), one parquet file per ~10^4 rows;
- timestamps monotone within a conversation, spanning a year.
"""

from __future__ import annotations

import os
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

HOT_TERMS = ["pipeline", "tensor", "shuffle"]          # planted head, df 30-50%
ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["", "", "", "", "", "", "bash", "search", "python", "browser"]
UNICODE_PAIR_NFC = unicodedata.normalize("NFC", "café")
UNICODE_PAIR_NFD = unicodedata.normalize("NFD", "café")


def _vocab(n_terms: int) -> list[str]:
    return [f"tok{i:05d}" for i in range(n_terms)]


def generate_transcripts(n_turns: int, seed: int = SEED,
                         n_terms: int = 10_000) -> pa.Table:
    """Seeded transcripts table with exactly the input_hint schema."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(n_terms))
    # Zipf ranks for the body of the distribution; sampled via inverse-CDF
    # (searchsorted on the cumulative), so drawing k tokens is O(k log V)
    # instead of rng.choice(p=...)'s O(k·V)
    zipf_p = 1.0 / np.arange(1, n_terms + 1) ** 1.1
    zipf_p /= zipf_p.sum()
    zipf_cum = np.cumsum(zipf_p)

    def draw(k: int) -> np.ndarray:
        return np.minimum(
            np.searchsorted(zipf_cum, rng.random(k), side="right"),
            n_terms - 1)

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []

    conv_no = 0
    produced = 0
    while produced < n_turns:
        # conversation length 1..64, Zipf-ish (many short, few long)
        clen = int(min(64, 1 + rng.zipf(1.4))) if rng.random() < 0.9 else \
            int(rng.integers(1, 65))
        clen = min(clen, n_turns - produced)
        cid = f"conv-{conv_no:08d}"
        base_ts = EPOCH_US + int(rng.integers(0, 365 * 86_400_000_000))
        ts = base_ts
        prev_tokens: list[str] | None = None
        for t in range(clen):
            role = ROLES[int(rng.integers(0, 4))] if t else "user"
            tool = TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool" else ""
            r = rng.random()
            if r < 0.01:
                text = ""                                   # empty turn
            elif r < 0.02:
                text = "   \t  "                            # whitespace-only
            elif r < 0.03 and prev_tokens:
                # near-duplicate: 1-token edit of previous turn
                toks = list(prev_tokens)
                toks[int(rng.integers(0, len(toks)))] = str(
                    vocab[int(rng.integers(0, n_terms))])
                text = " ".join(toks)
                prev_tokens = toks
            else:
                ntok = int(rng.integers(3, 40))
                toks = list(vocab[draw(ntok)])
                for hot in HOT_TERMS:                       # planted hot head
                    if rng.random() < 0.4:
                        toks.insert(int(rng.integers(0, len(toks) + 1)), hot)
                if rng.random() < 0.05:
                    toks.insert(0, UNICODE_PAIR_NFC if rng.random() < 0.5
                                else UNICODE_PAIR_NFD)
                if rng.random() < 0.1:                      # mixed case + punct
                    toks = [w.upper() if rng.random() < 0.3 else w for w in toks]
                    toks.insert(int(rng.integers(0, len(toks))), "--")
                text = " ".join(toks)
                prev_tokens = toks
            conv_ids.append(cid)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(ts)
            ts += int(rng.integers(1_000_000, 120_000_000))
            produced += 1
        conv_no += 1

    # planted exact duplicates: copy ~1% of texts onto other rows
    n = len(texts)
    ndup = max(1, n // 100)
    src = rng.integers(0, n, ndup)
    dst = rng.integers(0, n, ndup)
    for s, d in zip(src, dst):
        if conv_ids[s] != conv_ids[d]:
            texts[d] = texts[s]
    # one very long outlier turn
    long_i = int(rng.integers(0, n))
    texts[long_i] = " ".join(vocab[draw(20_000)])

    return pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        # large_string: >2 GB of text (≈15M turns) overflows int32
        # offsets inside take/concat kernels
        "text": pa.array(texts, pa.large_string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    })


def write_transcripts(out_dir: str, n_turns: int, seed: int = SEED,
                      rows_per_file: int = 10_000, n_terms: int = 10_000) -> str:
    """Write the corpus as multiple parquet files in *shuffled row order*
    (FIXTURES.md §5: ordering must be restored, not assumed)."""
    os.makedirs(out_dir, exist_ok=True)
    tbl = generate_transcripts(n_turns, seed=seed, n_terms=n_terms)
    rng = np.random.default_rng(seed + 1)
    perm = rng.permutation(tbl.num_rows)
    # take per output file, not once for the whole table: a single take
    # concatenates into one chunk and overflows int32 string offsets
    # past 2 GB of text (~15M turns)
    for fi, lo in enumerate(range(0, tbl.num_rows, rows_per_file)):
        idx = perm[lo:lo + rows_per_file]
        pq.write_table(tbl.take(pa.array(idx)),
                       os.path.join(out_dir, f"part-{fi:05d}.parquet"))
    return out_dir


def generate_queries(seed: int = SEED, n_terms: int = 10_000) -> list[dict]:
    """Reference query set (FIXTURES.md §2): common/rare single terms,
    2-5 term conjunctions, absent terms, hot-term hits; k in {1, 10, 100}."""
    rng = np.random.default_rng(seed + 7)
    vocab = _vocab(n_terms)
    queries: list[dict] = []

    def add(text: str, k: int = 10):
        queries.append({"query_id": len(queries), "query_text": text, "k": k})

    add(vocab[0])                      # most common zipf term
    add(vocab[1])
    add(vocab[n_terms - 1])            # rare tail term
    add(vocab[n_terms // 2])
    for hot in HOT_TERMS:
        add(hot)
        add(f"{hot} {vocab[3]}")
    for nt in (2, 3, 4, 5):
        idx = rng.integers(0, 200, nt)
        add(" ".join(vocab[i] for i in idx))
    add("zzznotfound qqqabsent")       # absent from corpus
    add(vocab[5], k=1)
    add(vocab[6], k=100)
    add("café")                        # unicode (tokenizes to caf)
    add(f"{HOT_TERMS[0]} {HOT_TERMS[1]} {HOT_TERMS[2]}")
    return queries
