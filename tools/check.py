#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare values (columns sorted by name, rows sorted) exactly.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if isinstance(v, bytes):
        return v.hex()
    return v


def frame(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            gcols, got = frame(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            wcols, want = frame(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            failures += 1
        elif got != want:
            n = len(got)
            diffs = [i for i, (a, b) in enumerate(zip(got, want)) if a != b]
            print(f"FAIL {name}: rows spark={n} duck={len(want)} "
                  f"first_diffs={diffs[:3]}")
            for i in diffs[:2]:
                print(f"   spark: {got[i]}")
                print(f"   duck : {want[i]}")
            if len(got) != len(want):
                so, wo = set(got), set(want)
                extra = list(so - wo)[:2]
                miss = list(wo - so)[:2]
                print(f"   extra_in_spark: {extra}")
                print(f"   missing_in_spark: {miss}")
            failures += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
    # rows-only queries (no oracle)
    import glob, os
    for p in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(p.rstrip("/"))
        if name in oracle:
            continue
        try:
            n = con.execute(f"SELECT count(*) FROM '{p}*.parquet'").fetchone()[0]
            print(f"rows {name}: {n}{'  (EMPTY!)' if n == 0 else ''}")
        except Exception as e:
            print(f"rows {name}: unreadable: {e}")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
