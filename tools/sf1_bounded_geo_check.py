#!/usr/bin/env python3
"""Bounded sf1 oracle for q_geo_radius (VERDICT r11 item 6).

The full DuckDB reference is the brute-force O(n^2) theta join -- 1.1e10
pairs at sf1, infeasible single-threaded. This check keeps the oracle
INDEPENDENT of the engine's grid algorithm (still plain brute force, no
cell pruning) but bounds it to a deterministic subsample: every pair
whose SMALLER endpoint id is divisible by SAMPLE_MOD. That is
n/SAMPLE_MOD outer rows x n inner rows ~ 2.2e8 exact integer predicate
evaluations -- seconds in DuckDB -- and the Spark side is the already-
dumped full result filtered to the same id_a stratum, so a hash match
proves the engine's grid join pair-for-pair on ~1/101 of the pair space
at 10x the driver's gate scale.

Usage: python3 tools/sf1_bounded_geo_check.py <sfdir> <dumpdir>
  (dumpdir must contain <dumpdir>/q_geo_radius/ parquet from graft.Verify)
"""
import glob
import os
import sys

import duckdb

SAMPLE_MOD = 101


def canon(rows):
    return sorted("\x01".join(str(v) for v in r) for r in rows)


def main(sfdir, dumpdir):
    con = duckdb.connect()
    p = f"{sfdir}/customer.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW customer AS SELECT * FROM read_parquet('{src}')")
    oracle = con.execute(f"""
        WITH k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM customer),
        p AS (SELECT CAST(c_custkey AS BIGINT) AS id,
                ('0x' || substr(md5(c_custkey::VARCHAR || ':x'), 1, 15))::BIGINT % (k.k * 1000) AS x,
                ('0x' || substr(md5(c_custkey::VARCHAR || ':y'), 1, 15))::BIGINT % (k.k * 1000) AS y
              FROM customer CROSS JOIN k)
        SELECT a.id AS id_a, b.id AS id_b,
          CAST(CAST(a.x - b.x AS HUGEINT)*(a.x - b.x)
               + CAST(a.y - b.y AS HUGEINT)*(a.y - b.y) AS BIGINT) AS dist2
        FROM (SELECT * FROM p WHERE id % {SAMPLE_MOD} = 0) a
        JOIN p b ON b.id > a.id
        WHERE CAST(a.x - b.x AS HUGEINT)*(a.x - b.x)
              + CAST(a.y - b.y AS HUGEINT)*(a.y - b.y) <= 400000000
        ORDER BY 1, 2""").fetchall()
    spark = con.execute(
        f"""SELECT id_a, id_b, dist2
            FROM read_parquet('{dumpdir}/q_geo_radius/*.parquet')
            WHERE id_a % {SAMPLE_MOD} = 0 ORDER BY 1, 2""").fetchall()
    ok = canon(oracle) == canon(spark)
    print(f"{'PASS' if ok else 'FAIL'} q_geo_radius@{sfdir} sampled id_a%{SAMPLE_MOD}==0: "
          f"oracle {len(oracle)} rows vs spark {len(spark)} rows")
    if not ok:
        o, s = set(canon(oracle)), set(canon(spark))
        for r in sorted(o - s)[:5]:
            print("  oracle-only:", r.replace("\x01", " | "))
        for r in sorted(s - o)[:5]:
            print("  spark-only :", r.replace("\x01", " | "))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
