#!/usr/bin/env python3
"""Assemble a BENCH_ladder_r*.json from the three per-rung
bench_result.json copies that tools/ladder_anchor.sh leaves in its
outdir. From round 13 each rung carries per-query executor cpu_s
beside wall_s (Bench.CpuMeter): cpu is the weather-immune number, so
drift adjudication reads cpu first, wall second (TUNING.md round-13
discipline).

Usage: tools/make_ladder.py <anchordir> <out.json> ["note text"]
  anchordir must contain bench_sf0.1.json / bench_sf1.json / bench_sf3.json
"""
import json
import re
import sys


def load_rung(path):
    s = open(path).read()
    # bench_result.json is a single JSON line
    d = json.loads(s)
    return {
        "total": d["value"],
        "total_cpu": d.get("total_cpu"),
        "queries": d["queries"],
        "cpu": d.get("cpu", {}),
    }


def main(anchordir, out, note):
    ladder = {}
    for rung, fname in (("sf0.1", "bench_sf0.1.json"),
                        ("sf1", "bench_sf1.json"),
                        ("sf3", "bench_sf3.json")):
        ladder[rung] = load_rung(f"{anchordir}/{fname}")
    if note:
        ladder["note"] = note
    with open(out, "w") as f:
        json.dump(ladder, f)
        f.write("\n")
    for rung in ("sf0.1", "sf1", "sf3"):
        r = ladder[rung]
        print(f"{rung}: wall {r['total']} s, cpu {r['total_cpu']} s, "
              f"{len(r['queries'])} queries")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "")
