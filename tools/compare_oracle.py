#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare with the Verify parquet dump (columns
sorted by name, rows sorted, values hashed)."""
import sys, json, glob, hashlib
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(f"{v:.9g}")
            elif v is None:
                vals.append("NULL")
            else:
                vals.append(str(v))
        rows.append("\x1f".join(vals))
    rows.sort()
    return cols, rows

fails = 0
for name in sorted(oracle):
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        want = con.execute(oracle[name]).df()
        gc, gr = canon(got)
        wc, wr = canon(want)
        status = []
        if [c.lower() for c in gc] != [c.lower() for c in wc]:
            status.append(f"SCHEMA got={gc} want={wc}")
        # Driver's hasher is dtype-sensitive (int64 `3` vs float64 `3.0`
        # mismatch — the round-1 HUGEINT artifact); flag kind mismatches.
        gk = {c: got[c].dtype.kind for c in got.columns}
        wk = {c: want[c].dtype.kind for c in want.columns}
        for c in sorted(set(gk) & set(wk)):
            a, b = gk[c], wk[c]
            if a != b and {a, b} <= {"i", "u", "f"}:
                status.append(f"DTYPE {c}: spark={a} oracle={b}")
        if len(gr) != len(wr):
            status.append(f"ROWS got={len(gr)} want={len(wr)}")
        if not status and gr != wr:
            diff = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
            status.append(f"HASH first-diffs={diff}")
        if status:
            fails += 1
            print(f"FAIL {name}: {'; '.join(status)[:500]}")
        else:
            print(f"OK   {name} rows={len(gr)}")
    except Exception as e:
        fails += 1
        print(f"ERR  {name}: {str(e)[:300]}")
print(f"\n{'ALL PASS' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
