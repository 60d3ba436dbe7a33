#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — not part of
the library). Reads Verify output (spark parquet per query + oracle_sql.json),
replays each oracle in DuckDB over the same sf dir, and diff-reports.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            rel = con.sql(sql)
            # catch DuckDB integer widening at the source: a HUGEINT column
            # (uncast sum/windowed-sum of BIGINT) converts to float64 in
            # pandas and reds the driver's type-sensitive hash even when
            # every value matches (round-5 t69). Fail loudly pre-conversion.
            hug = [c for c, t in zip(rel.columns, rel.types)
                   if "HUGEINT" in str(t).upper() or "INT128" in str(t).upper()]
            if hug:
                print(f"FAIL {name}: oracle emits HUGEINT column(s) {hug} "
                      f"— wrap in CAST(... AS BIGINT)")
                n_fail += 1
                continue
            oracle_df = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        sc = sorted(spark_df.columns)
        oc = sorted(oracle_df.columns)
        if sc != oc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            n_fail += 1
            continue
        s = spark_df[sc].sort_values(sc).reset_index(drop=True)
        o = oracle_df[oc].sort_values(oc).reset_index(drop=True)
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        # value compare (driver hashes; we diff for debuggability)
        import pandas as pd
        diffs = []
        for c in sc:
            a, b = s[c], o[c]
            # exact equality, mirroring the driver's hash compare; NaN-ness
            # compared explicitly (no sentinel fills — a real value equal to
            # a sentinel must not match a one-sided NaN)
            if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                eq = (a.isna() == b.isna()) & (a.isna() | (a == b))
            else:
                aa, bb = a.astype(object), b.astype(object)
                eq = (aa.isna() == bb.isna()) & (aa.isna() | (aa == bb))
            bad = (~eq).to_numpy().nonzero()[0]
            if len(bad):
                diffs.append((c, bad[:3]))
        if diffs:
            n_fail += 1
            print(f"FAIL {name}: value diffs in {[c for c, _ in diffs]} "
                  f"(rows={len(s)})")
            for c, idx in diffs[:2]:
                for i in idx:
                    print(f"    {c}[{i}]: spark={s[c][i]!r} oracle={o[c][i]!r}")
        else:
            # dtype deltas are a hard FAIL: the driver's hash is
            # type-sensitive, so equal values with differing dtypes (the
            # classic: DuckDB widening sum(BIGINT) to HUGEINT -> float64,
            # as t69 did in round 5) red the row even when every value
            # matches. An uncast oracle aggregate must be caught HERE.
            dt = [(c, str(s[c].dtype), str(o[c].dtype)) for c in sc
                  if str(s[c].dtype) != str(o[c].dtype)]
            if dt:
                n_fail += 1
                print(f"FAIL {name}: dtype deltas (values equal): {dt}")
            else:
                print(f"PASS {name} ({len(s)} rows)")
                n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracles)} total with oracles")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
