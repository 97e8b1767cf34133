#!/usr/bin/env python3
"""Merge per-SF graft.Bench JSON artifacts into a SCALING_r{N}.json.

Usage: merge_scaling.py OUT sf0.001.json sf0.01.json sf0.1.json
Each input is the file graft.Bench writes (SPARK_GRAFT_BENCH_OUT).
"""
import json
import math
import sys


def main() -> None:
    out, *paths = sys.argv[1:]
    benches = [json.load(open(p)) for p in paths]
    sfs = [float(b["sf"].rsplit("sf", 1)[1]) for b in benches]
    queries = {}
    for name in benches[0]["queries"]:
        warm = {f"sf{sf:g}": round(b["queries"][name], 3)
                for sf, b in zip(sfs, benches)}
        lo, hi = benches[0]["queries"][name], benches[-1]["queries"][name]
        decades = math.log10(sfs[-1] / sfs[0])
        exponent = round(math.log10(hi / lo) / decades, 3)
        queries[name] = {"warm_sec": warm, "exponent": exponent}
    doc = {
        "sfs": sfs,
        "runs": benches[0]["runs"],
        "note": ("warm (min-of-%d) seconds per registered bench query at three "
                 "scale factors (100x data range); exponent = "
                 "log10(t(sf%g)/t(sf%g))/%g, i.e. the per-decade growth rate of "
                 "runtime: 0 = constant (overhead-bound at these sizes), 1 = "
                 "linear in data. Same JVM config per run, one JVM per SF."
                 % (benches[0]["runs"], sfs[-1], sfs[0],
                    math.log10(sfs[-1] / sfs[0]))),
        "queries": queries,
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    worst = sorted(queries.items(), key=lambda kv: -kv[1]["exponent"])[:5]
    print("wrote", out)
    for name, q in worst:
        print(f"  {name}: exponent {q['exponent']:+.3f} warm {q['warm_sec']}")


if __name__ == "__main__":
    main()
