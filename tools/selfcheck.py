"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the given sf dir, compare
row count, schema width and order-insensitive values.

Usage: python tools/selfcheck.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]
    import __spark_entry__ as entrymod
    from lucene_spark.session import get_spark

    spark = get_spark("selfcheck", cpus=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            results[name] = f"SPARK ERROR: {e}"
            print(f"{name:24s} SPARK ERROR: {str(e)[:2000]}")
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(got)})"
            print(f"{name:24s} rows-only rows={len(got)} {time.time()-t0:.1f}s")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            print(f"{name:24s} ORACLE ERROR: {str(e)[:2000]}")
            continue
        g, w = norm_frame(got), norm_frame(want)
        ok_rows = len(g) == len(w)
        ok_cols = list(g.columns) == list(w.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    g, w, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
                )
                ok_vals = True
            except AssertionError as e:
                results[name] = f"VALUE MISMATCH: {str(e)[:300]}"
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(
            f"{name:24s} {status} rows={len(g)}/{len(w)} cols={list(g.columns)}"
            f"{'' if ok_cols else ' vs ' + str(list(w.columns))} {time.time()-t0:.1f}s"
        )
        if status == "FAIL" and ok_rows and ok_cols:
            diff = g.compare(w) if g.shape == w.shape else None
            print(diff.head(10) if diff is not None else "(shape diff)")
        results[name] = status
    bad = [n for n, r in results.items() if r not in ("OK",) and not str(r).startswith("rows-only")]
    print(f"\n{len(results) - len(bad)}/{len(results)} OK; failing: {bad}")
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
