#!/usr/bin/env python3
"""Compare a graft.Verify output dir against its DuckDB oracles, the way
the round driver does: per query, run oracle_sql.json's SQL against the
sf parquet tables and diff rows (sorted) + schema against the result
parquet. Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]

Optionally diff two verify dirs byte-for-byte:
  oracle_check.py --diff <dirA> <dirB> [query ...]
"""
import sys, os, json, glob
import duckdb

TABLES = ["documents", "lineitem", "orders", "events", "embeddings",
          "customer", "nation", "part", "region", "supplier"]


def load_result(con, outdir, q):
    files = glob.glob(os.path.join(outdir, q, "*.parquet"))
    if not files:
        return None, None
    rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
    cols = list(zip(rel.columns, [str(t) for t in rel.types]))
    rows = sorted(map(tuple, rel.fetchall()), key=lambda r: tuple(map(repr, r)))
    return cols, rows


def main():
    if sys.argv[1] == "--diff":
        a, b = sys.argv[2], sys.argv[3]
        only = set(sys.argv[4:])
        qs = sorted(os.listdir(a))
        bad = 0
        for q in qs:
            if not os.path.isdir(os.path.join(a, q)):
                continue
            if only and q not in only:
                continue
            ca = duckdb.connect(); cb = duckdb.connect()
            sa, ra = load_result(ca, a, q)
            sb, rb = load_result(cb, b, q)
            if sa != sb:
                print(f"FAIL {q}: schema A={sa} B={sb}"); bad += 1
            elif ra != rb:
                print(f"FAIL {q}: rows differ ({len(ra)} vs {len(rb)})")
                for x in (set(map(repr, ra)) ^ set(map(repr, rb))):
                    print("   ", x[:200])
                bad += 1
            else:
                print(f"ok   {q} ({len(ra)} rows)")
        sys.exit(1 if bad else 0)

    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    bad = 0
    for q, sql in sorted(oracle.items()):
        if only and q not in only:
            continue
        con = duckdb.connect()
        for t in TABLES:
            p = os.path.join(sfdir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        try:
            orel = con.sql(sql)
            orows = sorted(map(tuple, orel.fetchall()),
                           key=lambda r: tuple(map(repr, r)))
            ocols = list(orel.columns)
        except Exception as e:
            print(f"ERR  {q}: oracle failed: {e}"); bad += 1; continue
        scols, srows = load_result(con, outdir, q)
        if scols is None:
            print(f"MISS {q}: no result parquet"); bad += 1; continue
        names = [c for c, _ in scols]
        if names != ocols:
            print(f"FAIL {q}: columns spark={names} oracle={ocols}"); bad += 1
        elif srows != orows:
            print(f"FAIL {q}: rows differ (spark {len(srows)} vs oracle {len(orows)})")
            diff = set(map(repr, srows)) ^ set(map(repr, orows))
            for x in sorted(diff)[:6]:
                print("   ", x[:200])
            bad += 1
        else:
            print(f"ok   {q} ({len(srows)} rows)")
    print(("FAILURES: %d" % bad) if bad else "ALL GREEN")
    sys.exit(1 if bad else 0)


main()
