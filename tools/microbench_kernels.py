"""Micro-benchmark: round-1 per-row kernels vs round-2 vectorized ones.

Loads the round-1 implementations out of git history and times both on
the same in-memory batch (no Ray session — pure per-batch kernel cost).
Results are recorded in BASELINE.md §4.

    python tools/microbench_kernels.py [rows]
"""

import importlib.util
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R1_COMMIT = "9d26705"


def load_from_git(commit: str, path: str, name: str):
    src = subprocess.run(["git", "show", f"{commit}:{path}"],
                         capture_output=True, text=True,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__)))).stdout
    # the historical modules use relative imports (from ..analyze import);
    # rewrite them to absolute so they exec standalone
    src = src.replace("from ..analyze import", "from vframe_ray.analyze import")
    src = src.replace("from .hashing import", "from vframe_ray.stages.hashing import")
    spec = importlib.util.spec_from_loader(name, loader=None)
    mod = importlib.util.module_from_spec(spec)
    mod.__dict__["__name__"] = name
    sys.modules[name] = mod
    exec(compile(src, f"<git:{path}>", "exec"), mod.__dict__)
    return mod


def make_batch(n_rows: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.array([f"tok{i:05d}" for i in range(5000)])
    texts = [" ".join(vocab[rng.integers(0, 5000, rng.integers(10, 60))])
             for _ in range(n_rows)]
    return pa.table({"doc_id": pa.array(range(n_rows), pa.int64()),
                     "text": pa.array(texts)})


def bench(fn, batch, reps=3):
    fn(batch)                                   # warm
    t0 = time.time()
    for _ in range(reps):
        fn(batch)
    return (time.time() - t0) / reps


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    batch = make_batch(n_rows)
    old_dedup = load_from_git(R1_COMMIT, "vframe_ray/stages/dedup.py",
                              "r1_dedup")
    old_tq = load_from_git(R1_COMMIT, "vframe_ray/stages/textquality.py",
                           "r1_textquality")
    from vframe_ray.stages import dedup as new_dedup
    from vframe_ray.stages import textquality as new_tq

    pairs = [
        ("minhash_sig+bands", old_dedup.MinHashStage(),
         new_dedup.MinHashStage()),
        ("simhash", old_dedup.SimHashStage(), new_dedup.SimHashStage()),
        ("shingle_explode", old_dedup.ShingleStage(3),
         new_dedup.ShingleStage(3)),
        ("quality_features", old_tq.QualityStage(), new_tq.QualityStage()),
        ("langid", old_tq.LangIdStage(), new_tq.LangIdStage()),
        ("fingerprint", old_tq.FingerprintStage(),
         new_tq.FingerprintStage()),
    ]
    print(f"rows={n_rows}  (sec/batch; speedup = r1/r2)")
    for name, old, new in pairs:
        t_old = bench(old, batch)
        t_new = bench(new, batch)
        print(f"{name:20s} r1={t_old*1000:8.1f}ms  r2={t_new*1000:7.1f}ms  "
              f"speedup={t_old/t_new:6.1f}x  "
              f"({n_rows/t_new:,.0f} rows/s vectorized)")


if __name__ == "__main__":
    main()
