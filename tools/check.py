#!/usr/bin/env python3
"""Dev-only checker replicating the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfdir> <outdir>
Reads outdir/<name>/ parquet (Spark output) and outdir/oracle_sql.json,
runs each SQL in DuckDB with the sf tables registered as views, and
compares row multisets (columns sorted by name).

Comparator calibration (round 9): the driver fetches results through
duckdb's PANDAS conversion and stringifies values at FULL precision.
That layer is what makes its hash "type-sensitive": HUGEINT and
DECIMAL(p,s) become float64 (so an un-cast oracle `sum()/div` prints
"123.0" against a Spark BIGINT's "123" → FAIL), while INTEGER vs
BIGINT both print "123" (→ PASS). Reproduced empirically against the
round-8 driver verdict: its exact 5 failures and 357 passes all fall
out of this rule — a type-tagged comparator is STRICTER than the
driver (it flags INTEGER-vs-BIGINT and DECIMAL(3,1)-vs-DOUBLE twins
the driver accepts), and the old 6-sig-fig str() canon was WEAKER
(it passed the driver's 5 failures). Floats therefore compare via
str() of the float64, full precision — half-ulp divergences like
q_icc's round(msb, 6) are caught.
"""
import sys, json, glob
import duckdb

def canon(df):
    cols = sorted(df.columns)
    out = []
    for _, r in df[cols].iterrows():
        out.append("\x01".join(str(v) for v in r))
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
        gdf = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        try:
            wdf = con.sql(sql).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_fail += 1; continue
        if sorted(gdf.columns) != sorted(wdf.columns):
            print(f"FAIL {name}: cols {sorted(gdf.columns)} != {sorted(wdf.columns)}"); n_fail += 1; continue
        g, w = canon(gdf), canon(wdf)
        if g == w:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: {len(g)} vs {len(w)} rows")
            # hoisted: set(w) inside the comprehension condition was
            # rebuilt per element — O(n^2), effectively hanging on a
            # 1.5M-row mismatch (round-11 q_target_encode)
            sw, sg = set(w), set(g)
            diff = [x for x in g if x not in sw][:3]
            diff2 = [x for x in w if x not in sg][:3]
            print(f"   got-only: {diff}\n   want-only: {diff2}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
