"""Local replica of the driver's correctness gate: run every registry query
in Spark AND its DuckDB oracle at sf=0.01, compare row count, schema
(column names), and exact values (columns sorted by name, rows sorted by
all columns). Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.where(pd.notna(s), None)
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}"]
    if len(a) != len(b):
        errs.append(f"row count: spark={len(a)} oracle={len(b)}")
        return errs
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            af = pd.to_numeric(a[c]).to_numpy(dtype=float)
            bf = pd.to_numeric(b[c]).to_numpy(dtype=float)
            same = (af == bf) | (np.isnan(af) & np.isnan(bf))
            if not same.all():
                i = int(np.argmin(same))
                errs.append(f"col {c}: first diff at row {i}: {af[i]!r} != {bf[i]!r}")
        else:
            same = (av == bv) | (pd.isna(av) & pd.isna(bv))
            if not np.asarray(same).all():
                i = int(np.argmin(np.asarray(same)))
                errs.append(f"col {c}: first diff at row {i}: {av[i]!r} != {bv[i]!r}")
    return errs


def main() -> int:
    import json
    import os

    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv and "/" in argv[0] else "/root/testdata/sf0.01"
    only = [a for a in argv if "/" not in a]

    from etl_spark.queries import REGISTRY
    from etl_spark.session import get_spark

    spark = get_spark(app_name="check_oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    results: dict[str, dict] = {}
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        row = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        results[name] = row
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            row["err"] = f"spark error: {e}"
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        row["spark_rows"] = len(sdf)
        if sql is None:
            row.update(rows_match=True, schema_match=True, hash_match=None,
                       err="no oracle (rows-only check)")
            print(f"ok   {name}: (no oracle) rows={len(sdf)} [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            row["err"] = f"oracle error: {e}"
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        row["oracle_rows"] = len(odf)
        errs = compare(sdf, odf)
        row["schema_match"] = not any(e.startswith("columns differ") for e in errs)
        row["rows_match"] = len(sdf) == len(odf)
        row["hash_match"] = not errs
        if errs:
            failures += 1
            row["err"] = "; ".join(errs[:4])
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)} [{time.time()-t0:.1f}s]")
            for e in errs[:4]:
                print(f"     {e}")
        else:
            print(f"ok   {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
    if out_path is None and not only:
        # full-registry sweeps default to writing the standing artifact —
        # every registry query gets a machine-checkable row each round
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CORRECTNESS_SELF.json",
        )
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {out_path} ({len(results)} queries)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
