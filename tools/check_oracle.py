"""Driver-mimic: run every ``queries()`` entry at a given sf dir and
compare with its ``oracle_sql()`` via DuckDB — row count, column
names/types, and order-insensitive value comparison.  Run:

    python tools/check_oracle.py [sf_dir] [only_query ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()          # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    qs, oq = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_df(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oq:
            print(f"rows  {name}: {len(mine)} rows (rows-only check)")
            n_rowsonly += 1
            continue
        try:
            orc = canon(con.execute(oq[name]).fetchdf())
        except Exception as ex:
            print(f"FAIL  {name}: oracle SQL raised: {ex}")
            n_fail += 1
            continue
        ok = True
        if list(mine.columns) != list(orc.columns):
            print(f"FAIL  {name}: columns {list(mine.columns)} "
                  f"vs {list(orc.columns)}")
            ok = False
        elif len(mine) != len(orc):
            print(f"FAIL  {name}: rows {len(mine)} vs {len(orc)}")
            ok = False
        else:
            for c in mine.columns:
                a, b = mine[c], orc[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    eq = np.allclose(a.to_numpy(dtype=float),
                                     b.to_numpy(dtype=float),
                                     rtol=0, atol=0, equal_nan=True)
                else:
                    eq = (a.astype(str) == b.astype(str)).all()
                if not eq:
                    bad = (a != b)
                    try:
                        i = int(np.flatnonzero(bad.to_numpy())[0])
                        detail = f"first diff row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}"
                    except Exception:
                        detail = ""
                    print(f"FAIL  {name}: column {c} values differ; {detail}")
                    ok = False
                    break
        if ok:
            print(f"PASS  {name}: {len(mine)} rows, "
                  f"{len(mine.columns)} cols exact")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
