#!/usr/bin/env python3
"""Dev-only checker replicating the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfdir> <outdir>
Reads outdir/<name>/ parquet (Spark output) and outdir/oracle_sql.json,
runs each SQL in DuckDB with the sf tables registered as views, and
compares row multisets (columns sorted by name, rows sorted, values
stringified with float rounding).
"""
import sys, json, glob, math
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6g}" if not math.isnan(v) else "nan"
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)

def main(sfdir, outdir):
    con = duckdb.connect()
    import os
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        # driver testdata = single files; Spark-written (e.g. ScaleUp's
        # benchdata/sf1) = directories of part files
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"MISSING {name}"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})")
        gcols = [d[0] for d in got.description]; grows = got.fetchall()
        try:
            want = con.execute(sql)
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_fail += 1; continue
        wcols = [d[0] for d in want.description]; wrows = want.fetchall()
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: cols {sorted(gcols)} != {sorted(wcols)}"); n_fail += 1; continue
        g, w = canon(grows, gcols), canon(wrows, wcols)
        if g == w:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: {len(g)} vs {len(w)} rows")
            diff = [x for x in g if x not in set(w)][:3]
            diff2 = [x for x in w if x not in set(g)][:3]
            print(f"   got-only: {diff}\n   want-only: {diff2}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
