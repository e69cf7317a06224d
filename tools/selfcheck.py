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
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # pandas/numpy floats: NaN marks null; HUGEINT arrives here as float
        # (this is the dtype drift the driver gate sees — intentional).
        if v != v:
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def fetch_df(rel):
    """Replicate the driver harness: go through pandas (so DuckDB HUGEINT
    coerces to float64 exactly like the driver sees it), sort columns by
    name, then pandas sort_values over all columns (which CRASHES on
    array-typed columns — also exactly like the driver)."""
    df = rel.df()
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def table_hash(df):
    lines = sorted("|".join(canon(v) for v in row)
                   for row in df.itertuples(index=False, name=None))
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
            # HUGEINT gate: sum() over integer columns yields HUGEINT, which
            # pandas coerces to float64 and the driver canonicalizes
            # differently from Spark's int64 (976742 vs 976742.0). canon()'s
            # %.6g papers over that drift locally, so catch it at the TYPE
            # level: any HUGEINT output column is an automatic FAIL here.
            rel = con.sql(sql)
            huge = [c for c, t in zip(rel.columns, rel.types)
                    if "HUGEINT" in str(t).upper()]
            if huge:
                results[name] = {
                    "ok": False,
                    "err": ("oracle outputs HUGEINT column(s) "
                            f"{huge} — wrap in CAST(... AS BIGINT); the "
                            "driver gate hash-fails these even when values "
                            "match")}
                continue
            sp = fetch_df(con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')"))
            du = fetch_df(con.execute(sql))
            schema_match = list(sp.columns) == list(du.columns)
            rows_match = len(sp) == len(du)
            hash_match = (schema_match and
                          table_hash(sp) == table_hash(du))
            results[name] = {"ok": schema_match and rows_match and hash_match,
                             "rows_match": rows_match,
                             "schema_match": schema_match,
                             "hash_match": hash_match,
                             "spark_rows": len(sp),
                             "duck_rows": len(du)}
            if not schema_match:
                results[name]["spark_cols"] = sorted(sp.columns)
                results[name]["duck_cols"] = sorted(du.columns)
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
