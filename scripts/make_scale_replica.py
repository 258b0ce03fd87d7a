"""Reconstruct an sf1.0-SCALE testdata replica for local measurement.

The driver generated (and later removed) /root/testdata/sf1.0; its exact
generator is not in this repo. This builds a structurally comparable 10x
replica from the deterministic sf0.1 tables so that (a) after-plans can be
captured at the same scale the before-plans were, and (b) optimizations can
be A/B-measured at driver scale. It is NOT the driver's data — numbers from
it are labeled "replica-sf1.0" in OPTIMIZATION_r09.md / BENCH.md.

Scale law (replica i in 0..9):
- documents: doc_id += i*max; every whitespace token gets a per-replica
  suffix (replica 0 unchanged), so token/shingle equality WITHIN a replica
  is bit-preserved (near-dup pair structure scales exactly 10x) and tokens
  never collide ACROSS replicas (no synthetic dup explosion).
- embeddings: vec_id += i*max; deterministic tiny per-replica perturbation
  (+ (i * 1e-3) on one coordinate rotating by vec_id) keeps ANN structure
  per replica without exact cross-replica ties.
- events: event_id/user_id offset per replica; ts shifted +i days so
  sessionization/gap structure is preserved per replica.
- lineitem/orders/customer/supplier/part: primary/foreign keys offset in
  lockstep so join relationships are preserved; nation/region copied as-is.

Usage: python scripts/make_scale_replica.py [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_r09/sf1.0"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(sql: str, t: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET, CODEC ZSTD)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows", flush=True)

    reps = f"range(0, {factor}) r(i)"

    # key maxima for collision-free offsets
    mx = {}
    for t, k in [("documents", "doc_id"), ("embeddings", "vec_id"),
                 ("events", "event_id"), ("orders", "o_orderkey"),
                 ("customer", "c_custkey"), ("part", "p_partkey"),
                 ("supplier", "s_suppkey")]:
        mx[t] = con.execute(f"SELECT max({k}) + 1 FROM {src(t)}").fetchone()[0]
    umax = con.execute(f"SELECT max(user_id) + 1 FROM {src('events')}").fetchone()[0]

    write(
        f"""
        SELECT d.doc_id + i * {mx['documents']} AS doc_id,
               CASE WHEN i = 0 THEN d.text
                    ELSE regexp_replace(d.text, '(\\S+)', '\\1zq' || i, 'g')
               END AS text,
               d.lang, d.source, d.n_chars
        FROM {src('documents')} d, {reps}
        """,
        "documents",
    )
    write(
        f"""
        SELECT e.vec_id + i * {mx['embeddings']} AS vec_id,
               CASE WHEN i = 0 THEN e.embedding
                    ELSE list_transform(e.embedding,
                         (x, j) -> CASE WHEN (j - 1) = e.vec_id % len(e.embedding)
                                        THEN x + i * 0.001 ELSE x END)
               END AS embedding,
               e.label
        FROM {src('embeddings')} e, {reps}
        """,
        "embeddings",
    )
    write(
        f"""
        SELECT e.event_id + i * {mx['events']} AS event_id,
               e.ts + INTERVAL (i) DAY AS ts,
               e.user_id + i * {umax} AS user_id,
               e.event_type, e.value, e.props
        FROM {src('events')} e, {reps}
        """,
        "events",
    )
    write(
        f"""
        SELECT l.l_orderkey + i * {mx['orders']} AS l_orderkey,
               l.l_partkey + i * {mx['part']} AS l_partkey,
               l.l_suppkey + i * {mx['supplier']} AS l_suppkey,
               l.l_linenumber, l.l_quantity, l.l_extendedprice,
               l.l_discount, l.l_tax, l.l_returnflag, l.l_linestatus,
               l.l_shipdate
        FROM {src('lineitem')} l, {reps}
        """,
        "lineitem",
    )
    write(
        f"""
        SELECT o.o_orderkey + i * {mx['orders']} AS o_orderkey,
               o.o_custkey + i * {mx['customer']} AS o_custkey,
               o.o_orderstatus, o.o_totalprice, o.o_orderdate,
               o.o_orderpriority
        FROM {src('orders')} o, {reps}
        """,
        "orders",
    )
    write(
        f"""
        SELECT c.c_custkey + i * {mx['customer']} AS c_custkey,
               c.c_name || '-' || i AS c_name, c.c_nationkey, c.c_acctbal,
               c.c_mktsegment
        FROM {src('customer')} c, {reps}
        """,
        "customer",
    )
    write(
        f"""
        SELECT s.s_suppkey + i * {mx['supplier']} AS s_suppkey, s.* EXCLUDE (s_suppkey)
        FROM {src('supplier')} s, {reps}
        """,
        "supplier",
    )
    write(
        f"""
        SELECT p.p_partkey + i * {mx['part']} AS p_partkey, p.* EXCLUDE (p_partkey)
        FROM {src('part')} p, {reps}
        """,
        "part",
    )
    for t in ("nation", "region"):
        write(f"SELECT * FROM {src(t)}", t)


if __name__ == "__main__":
    main()
