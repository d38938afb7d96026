#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (t2).

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
  - loads each <outDir>/<name> parquet dump (Spark result),
  - runs the matching oracle SQL from oracle_sql.json in DuckDB with the
    sfDir tables registered as views,
  - compares: row count, column names (sorted), and cell values in row
    order after sorting columns by name.

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark dump: {e}")
            failures += 1
            continue
        try:
            oracle_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:300]}")
            failures += 1
            continue
        s = spark_df[sorted(spark_df.columns)]
        o = oracle_df[sorted(oracle_df.columns)]
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns differ: spark={list(s.columns)} oracle={list(o.columns)}")
            failures += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows differ: spark={len(s)} oracle={len(o)}")
            failures += 1
            continue
        bad = None
        lenient = [0]  # None-vs-NaN cells passed leniently (logged on PASS)
        for c in s.columns:
            sv, ov = s[c].reset_index(drop=True), o[c].reset_index(drop=True)
            # normalize for comparison (driver hashes values; match exactly,
            # except both-null which any sane hasher treats as equal).
            # Array-typed cells make elementwise == raise; fall back to a
            # per-cell compare so one query can't abort the whole gate.
            try:
                sn, on_ = pd.isnull(sv), pd.isnull(ov)
                eq = (sv.astype(object) == ov.astype(object)) | (sn & on_)
                ok_all = bool(eq.all())
            except Exception:
                import numpy as np

                def _scalar_null(x):
                    try:
                        return x is None or bool(pd.isna(x))
                    except (TypeError, ValueError):
                        return False  # pd.isna on arrays is elementwise

                def _cell_eq(a, b):
                    if _scalar_null(a) or _scalar_null(b):
                        if not (_scalar_null(a) and _scalar_null(b)):
                            return False
                        # Both null, but None-vs-NaN is a representational
                        # difference the driver's hasher may or may not
                        # forgive — pass, but SAY SO, so a masked
                        # divergence is visible in the gate output.
                        if (a is None) != (b is None):
                            lenient[0] += 1
                        return True
                    try:  # float-like arrays: NaN==NaN counts as equal
                        return bool(np.array_equal(a, b, equal_nan=True))
                    except TypeError:  # non-float (str/object) arrays
                        return bool(np.array_equal(a, b))

                cells = [_cell_eq(a, b) for a, b in zip(sv.tolist(), ov.tolist())]
                eq = pd.Series(cells)
                ok_all = all(cells)
            if not ok_all:
                i = int(eq.idxmin())
                bad = (c, i, sv.iloc[i], ov.iloc[i], str(sv.dtype), str(ov.dtype))
                break
        if bad:
            c, i, a, b, ta, tb = bad
            print(f"FAIL {name}: col={c} row={i}: spark={a!r}({ta}) oracle={b!r}({tb})")
            failures += 1
        else:
            dtypes_s = [str(t) for t in s.dtypes]
            dtypes_o = [str(t) for t in o.dtypes]
            note = "" if dtypes_s == dtypes_o else f"  [dtype diff: {list(zip(s.columns, dtypes_s, dtypes_o))}]"
            if lenient[0]:
                note += f"  [null-leniency: {lenient[0]} None-vs-NaN cells]"
            print(f"PASS {name} ({len(s)} rows){note}")
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracled queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
