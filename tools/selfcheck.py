#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the oracle
SQL from oracle_sql.json in DuckDB over the sf parquet tables, and
compares: row count, schema (sorted column names), and a value hash
computed over column-name-sorted, row-sorted stringified values.
"""
import sys, os, json, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                if os.path.isdir(p) else
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            results[name] = {"ok": False, "err": "no spark output"}
            continue
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
            sp_cols = [d[0] for d in sp.description]
            sp_rows = sp.fetchall()
            du = con.execute(sql)
            du_cols = [d[0] for d in du.description]
            du_rows = du.fetchall()
            schema_match = sorted(sp_cols) == sorted(du_cols)
            rows_match = len(sp_rows) == len(du_rows)
            hash_match = (schema_match and
                          table_hash(sp_cols, sp_rows) ==
                          table_hash(du_cols, du_rows))
            results[name] = {"ok": schema_match and rows_match and hash_match,
                             "rows_match": rows_match,
                             "schema_match": schema_match,
                             "hash_match": hash_match,
                             "spark_rows": len(sp_rows),
                             "duck_rows": len(du_rows)}
            if not schema_match:
                results[name]["spark_cols"] = sorted(sp_cols)
                results[name]["duck_cols"] = sorted(du_cols)
        except Exception as e:
            results[name] = {"ok": False, "err": str(e)[:300]}
    n_ok = sum(1 for r in results.values() if r.get("ok"))
    for name, r in sorted(results.items()):
        mark = "PASS" if r.get("ok") else "FAIL"
        extra = "" if r.get("ok") else " " + json.dumps(
            {k: v for k, v in r.items() if k != "ok"})
        print(f"{mark} {name}{extra}")
    print(f"== {n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)


main()
