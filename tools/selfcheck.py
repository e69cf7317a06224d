#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
       python3 tools/selfcheck.py --survey [<SURVEY.md> <oracle_sql.json>]

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the oracle
SQL from oracle_sql.json in DuckDB over the sf parquet tables, and
compares: row count, schema (sorted column names), and a value hash
computed over column-name-sorted, row-sorted stringified values.

--survey checks the SURVEY.md §2 <-> SparkEntry.queries bijection:
every backticked gate id in a §2 status cell must be a real query
(oracle_sql.json key), every query must be cited somewhere in §2, and
every §2 row must cite at least one gate id unless it is on the
spec-only allowlist. This runs automatically at the end of a full
(non-subset) gate check too — coverage claims rot silently otherwise.
"""
import sys, os, json, hashlib, re
import duckdb
import numpy as np

# §2 rows proven by ScalaTest specs instead of a SQL-oracle gate query
# (src_parquet: PlanSpec pins pushdown/pruning on every scan; gen_cli:
# CliSpec proves end-to-end CLI == gate-query equivalence)
SPEC_ONLY_ROWS = {"src_parquet", "gen_cli"}
GATE_ID = re.compile(r"^[a-z][a-z0-9]*(?:_[a-z0-9]+)+$")


def survey_check(survey_path, oracle_keys):
    """Returns a list of drift messages (empty = bijection holds).

    §2 cites gates in several layouts — backticked in a status cell,
    bare as the row id (compact tables, incl. two id/status pairs per
    line), slash-joined lists — so: (1) every BACKTICKED gate-id-shaped
    token (graft_* function names exempt) must be a live query; (2)
    every table row must mention at least one live query id anywhere,
    or be spec-only; (3) every live query id must appear somewhere in
    §2. Liberal word-matching for (2)/(3) keeps the check layout-proof;
    strict backtick matching for (1) catches renames of explicit cites.
    """
    text = open(survey_path, encoding="utf-8").read()
    m = re.search(r"^## §2.*?(?=^## §3)", text, re.S | re.M)
    if not m:
        return ["SURVEY.md: could not locate §2 (## §2 ... ## §3)"]
    sec = m.group(0)
    problems = []
    word = re.compile(r"[a-z][a-z0-9]*(?:_[a-z0-9]+)+")
    for t in sorted(set(re.findall(r"`([^`]+)`", sec))):
        if GATE_ID.match(t) and not t.startswith("graft_") \
                and t not in oracle_keys:
            problems.append(
                f"§2 cites `{t}` which is not a SparkEntry.queries "
                "entry (renamed or removed?)")
    for line in sec.splitlines():
        l = line.strip()
        if not (l.startswith("|") and l.endswith("|")):
            continue
        cells = [c.strip() for c in l.strip("|").split("|")]
        if not cells or cells[0] in ("id", "operator") \
                or set(cells[0]) <= {"-", ":"}:
            continue
        if not (set(word.findall(l)) & oracle_keys) \
                and cells[0] not in SPEC_ONLY_ROWS:
            problems.append(
                f"§2 row '{cells[0]}' mentions no live gate id and is "
                "not on the spec-only allowlist")
    for q in sorted(oracle_keys - set(word.findall(sec))):
        problems.append(
            f"gate query '{q}' is not cited anywhere in SURVEY §2 — "
            "add it to its operator row")
    return problems

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


def survey_main():
    here = os.path.dirname(os.path.abspath(__file__))
    survey = sys.argv[2] if len(sys.argv) > 2 \
        else os.path.join(here, "..", "SURVEY.md")
    oracles = sys.argv[3] if len(sys.argv) > 3 \
        else "/tmp/verify_out/oracle_sql.json"
    keys = set(json.load(open(oracles)).keys())
    problems = survey_check(survey, keys)
    for p in problems:
        print(f"FAIL survey_bijection: {p}")
    if not problems:
        print(f"PASS survey_bijection ({len(keys)} gate ids <-> §2)")
    sys.exit(1 if problems else 0)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--survey":
        survey_main()
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
    # full runs also audit the SURVEY §2 <-> gate bijection (subset runs
    # skip it: they are operator-iteration runs, not coverage audits)
    drift = []
    if not only:
        survey = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "..", "SURVEY.md")
        if os.path.exists(survey):
            drift = survey_check(survey, set(oracles.keys()))
            for p in drift:
                print(f"FAIL survey_bijection: {p}")
            if not drift:
                print("PASS survey_bijection")
    sys.exit(0 if n_ok == len(results) and not drift else 1)


main()
