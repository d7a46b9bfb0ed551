"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf and compare row-count/schema/values against oracle_sql()
via DuckDB (order-insensitive).

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa

sys.path.insert(0, ".")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(x):
    import ray.data

    if isinstance(x, ray.data.Dataset):
        df = x.to_pandas()
        if not len(df.columns):
            # Ray quirk: an empty Dataset's to_pandas drops columns even
            # when .schema() knows them — restore for the compare
            sch = x.schema()
            if sch is not None:
                df = pd.DataFrame({n: pd.Series(dtype="object")
                                   for n in sch.names})
        return df
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        if "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    # These oracles run over the SYNTHETIC transcripts corpus (not the
    # testdata tables) and inline the sf0.01 corpus path / its token
    # statistics into the SQL (score_oracle.py *_sql defaults) — the
    # driver's gate always runs at sf0.01, where they are green.  At
    # any other sf the engine side would read a different corpus than
    # the SQL, so comparing is apples-to-oranges by construction.
    sf001_pinned = {
        "flagship_or_topk", "nested_conv_search", "nested_kp_bm25",
        "nested_kp_bm25_filtered", "split_index_bm25",
        "dist_nested_kp_bm25",
    }
    at_sf001 = os.path.abspath(sf_dir).rstrip("/").endswith("sf0.01")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in sf001_pinned and not at_sf001:
            print(f"SKIP {name}: oracle pinned to the sf0.01 synthetic "
                  "transcript corpus")
            continue
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append((name, f"query raised: {ex!r}"))
            print(f"ERROR {name}: {ex!r}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows-only {name}: {len(mine)} rows, cols={list(mine.columns)}")
            continue
        try:
            want = canon(con.sql(sql).df())
        except Exception as ex:
            failures.append((name, f"oracle raised: {ex!r}"))
            print(f"ORACLE-ERROR {name}: {ex!r}")
            continue
        if list(mine.columns) != list(want.columns):
            failures.append((name, f"schema {list(mine.columns)} != {list(want.columns)}"))
            print(f"SCHEMA-MISMATCH {name}: {list(mine.columns)} vs {list(want.columns)}")
            continue
        if len(mine) != len(want):
            failures.append((name, f"rows {len(mine)} != {len(want)}"))
            print(f"ROWCOUNT-MISMATCH {name}: {len(mine)} vs {len(want)}")
            continue
        # tolerate dtype diffs by comparing as strings after rounding
        eq = True
        for c in mine.columns:
            a, b = mine[c], want[c]
            try:
                if not (a.astype(str).values == b.astype(str).values).all():
                    eq = False
                    break
            except Exception:
                eq = False
                break
        if eq:
            print(f"OK {name}: {len(mine)} rows")
        else:
            failures.append((name, f"value mismatch in {c}"))
            print(f"VALUE-MISMATCH {name} (column {c})")
            print("  mine:", mine.head(3).to_dict("records"))
            print("  want:", want.head(3).to_dict("records"))
    print(f"\n{len(failures)} failures")
    for n, r in failures:
        print(" -", n, r)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
