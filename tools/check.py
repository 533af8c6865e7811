#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <outDir>/<name> spark-written parquet, runs the matching oracle
SQL from <outDir>/oracle_sql.json in DuckDB over <sfDir>/*.parquet views,
and compares: column names (sorted), row count, and the multiset of rows
(values stringified, rows sorted). Exit 1 on any mismatch.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_glob = glob.glob(f"{outdir}/{name}/*.parquet")
        if not spark_glob:
            print(f"[{name}] MISSING spark output")
            failed.append(name)
            continue
        try:
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"[{name}] ORACLE ERROR: {e}")
            failed.append(name)
            continue
        got = con.execute(f"SELECT * FROM read_parquet({spark_glob!r})")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        ok = True
        if sorted(exp_cols) != sorted(got_cols):
            print(f"[{name}] COLS mismatch: spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            ok = False
        elif len(exp_rows) != len(got_rows):
            print(f"[{name}] ROWS mismatch: spark={len(got_rows)} oracle={len(exp_rows)}")
            ok = False
        else:
            a, b = rowset(got_cols, got_rows), rowset(exp_cols, exp_rows)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y]
                print(f"[{name}] VALUES mismatch ({len(diffs)} rows); first: ")
                for x, y in diffs[:3]:
                    print(f"   spark : {x}\n   oracle: {y}")
                ok = False
        if ok:
            print(f"[{name}] OK ({len(got_rows)} rows)")
        else:
            failed.append(name)
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
