#!/usr/bin/env python3
"""Build the N× replication stress corpus used by PLANS.md's empirical
scaling checks (dev tool only — not part of the library).

Method (the round-4 convention): fact tables replicated with offset keys,
documents replicated as near-identical REVISIONS (each copy r > 0 appends
a revision marker to the text, so every doc becomes an N-way near
duplicate — a deliberately dup-heavy corpus that stresses candidate
generation, not just row counts), embeddings replicated as exact-dup
vectors under offset ids, dimension tables copied once (facts grow,
dims stay — the realistic shape).

Usage: python3 scripts/make_replica.py <srcSfDir> <dstDir> [N=10]
"""
import os
import sys

import duckdb


def main(src: str, dst: str, n: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def copy(sql: str, name: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        cnt = con.sql(f"SELECT count(*) FROM '{dst}/{name}.parquet'") \
            .fetchone()[0]
        print(f"{name}: {cnt} rows")

    # dims: single copy
    for t in ["region", "nation", "customer", "supplier", "part"]:
        copy(f"SELECT * FROM '{src}/{t}.parquet'", t)

    reps = f"unnest(generate_series(0, {n - 1})) AS rep(r)"

    okey = con.sql(
        f"SELECT max(o_orderkey) + 1 FROM '{src}/orders.parquet'"
    ).fetchone()[0]
    copy(f"""SELECT o_orderkey + r * {okey} AS o_orderkey,
                 o.* EXCLUDE (o_orderkey)
             FROM '{src}/orders.parquet' o, {reps}""", "orders")
    copy(f"""SELECT l_orderkey + r * {okey} AS l_orderkey,
                 l.* EXCLUDE (l_orderkey)
             FROM '{src}/lineitem.parquet' l, {reps}""", "lineitem")

    ekey = con.sql(
        f"SELECT max(event_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()[0]
    copy(f"""SELECT event_id + r * {ekey} AS event_id,
                 e.* EXCLUDE (event_id)
             FROM '{src}/events.parquet' e, {reps}""", "events")

    dkey = con.sql(
        f"SELECT max(doc_id) + 1 FROM '{src}/documents.parquet'"
    ).fetchone()[0]
    # r = 0 keeps the original text; r > 0 appends a revision marker —
    # a near-identical revision (tail shingles change, the rest collide)
    copy(f"""SELECT doc_id + r * {dkey} AS doc_id,
                 CASE WHEN r = 0 THEN text
                      ELSE text || ' rev' || CAST(r AS VARCHAR) END AS text,
                 lang, source,
                 CAST(strlen(CASE WHEN r = 0 THEN text
                      ELSE text || ' rev' || CAST(r AS VARCHAR) END)
                   AS BIGINT) AS n_chars
             FROM '{src}/documents.parquet', {reps}""", "documents")

    vkey = con.sql(
        f"SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet'"
    ).fetchone()[0]
    copy(f"""SELECT vec_id + r * {vkey} AS vec_id,
                 v.* EXCLUDE (vec_id)
             FROM '{src}/embeddings.parquet' v, {reps}""", "embeddings")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 10)
