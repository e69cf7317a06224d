#!/usr/bin/env python3
"""Deterministic x10 scale-up of /root/testdata/sf0.1 -> target/sf1.

Test scaffolding for the cross-scale replay probe (the r12 verdict's
item 7): one more decade of data so value-distribution-dependent bugs
(signed zero, quantile interpolation, ln/exp ulp drift, overflow) that
the sf0.01 gate can't see get one more chance to surface. NOT a gate
input — the driver's gate stays on /root/testdata.

Construction (all copies c = 0..9, c = 0 is the original rows bit-equal):
  - dimension tables (region, nation) stay fixed — the TPC-H convention;
  - fact/entity keys shift by c * N (keys are dense 0-based, so copies
    never collide and referential integrity is preserved within a copy);
  - doubles perturb by tiny deterministic per-copy deltas so the scaled
    corpus carries NEW values (prices +c cents, event values +c/1000,
    embedding dim0 +c/1000) — a pure row-copy would replay the identical
    value set 10x and probe nothing;
  - document text for c > 0 gets a per-copy suffix (keeps within-copy
    duplicate structure while avoiding a pathological all-dup corpus;
    n_chars recomputed to stay = length(text)).
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS c")


def rd(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def write(t, sql):
    con.execute(
        f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
    ).fetchone()[0]
    print(f"{t}: {n} rows")


# dimensions: fixed
for t in ("region", "nation"):
    write(t, f"SELECT * FROM {rd(t)}")

write("customer", f"""
  SELECT c_custkey + c * 15000 AS c_custkey, c_name, c_nationkey,
    round(c_acctbal + c * 0.01, 2) AS c_acctbal, c_mktsegment
  FROM {rd('customer')}, copies""")

write("supplier", f"""
  SELECT s_suppkey + c * 1000 AS s_suppkey, s_name, s_nationkey,
    round(s_acctbal + c * 0.01, 2) AS s_acctbal
  FROM {rd('supplier')}, copies""")

write("part", f"""
  SELECT p_partkey + c * 20000 AS p_partkey, p_name, p_brand, p_type,
    p_size, round(p_retailprice + c * 0.01, 2) AS p_retailprice
  FROM {rd('part')}, copies""")

write("orders", f"""
  SELECT o_orderkey + c * 150000 AS o_orderkey,
    o_custkey + c * 15000 AS o_custkey, o_orderstatus,
    round(o_totalprice + c * 0.01, 2) AS o_totalprice,
    o_orderdate, o_orderpriority
  FROM {rd('orders')}, copies""")

write("lineitem", f"""
  SELECT l_orderkey + c * 150000 AS l_orderkey,
    l_partkey + c * 20000 AS l_partkey,
    l_suppkey + c * 1000 AS l_suppkey, l_linenumber, l_quantity,
    round(l_extendedprice + c * 0.01, 2) AS l_extendedprice,
    l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM {rd('lineitem')}, copies""")

write("events", f"""
  SELECT event_id + c * 100000 AS event_id, ts,
    user_id + c * 1500 AS user_id, event_type,
    value + c * 0.001 AS value, props
  FROM {rd('events')}, copies""")

write("documents", f"""
  SELECT doc_id + c * 5000 AS doc_id,
    CASE WHEN c = 0 THEN text ELSE text || ' rep' || c END AS text,
    lang, source,
    CAST(length(CASE WHEN c = 0 THEN text
                     ELSE text || ' rep' || c END) AS BIGINT) AS n_chars
  FROM {rd('documents')}, copies""")

write("embeddings", f"""
  SELECT vec_id + c * 2000 AS vec_id,
    CAST(list_transform(range(1, len(embedding) + 1),
      i -> CASE WHEN i = 1 THEN embedding[1] + c * 0.001
                ELSE embedding[i] END) AS FLOAT[]) AS embedding,
    label
  FROM {rd('embeddings')}, copies""")

print(f"done -> {DST}")
