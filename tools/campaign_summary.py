#!/usr/bin/env python3
"""Summarize a Bench campaign artifact (the SPARK_GRAFT_BENCH_FULL_OUT
file): per-pair efficiency vs same-minute ceilings, GC shares, 2v8 pairs,
flatness — the numbers the BASELINE targets are judged on.

Usage: tools/campaign_summary.py bench_runs/campaign_*.json
"""
import json
import sys


def pct(x, y):
    return f"{100.0 * x / y:.0f}%" if y else "-"


def main(paths):
    for path in paths:
        d = json.load(open(path))
        c = d.get("crawl", {})
        c28 = d.get("crawl_2v8", {})
        fl = d.get("flatness", {})
        print(f"== {path}")
        print(f"   8v32 n={c.get('n_urls')}  "
              f"best={c.get('scaling_efficiency')}  "
              f"median={c.get('scaling_efficiency_median')}  "
              f"work={c.get('work_scaling_efficiency')}")
        for i, p in enumerate(c.get("pairs", [])):
            w8, w32 = p["local8_wall_sec"], p["local32_wall_sec"]
            g8, g32 = p.get("local8_gc_sec", 0), p.get("local32_gc_sec", 0)
            print(f"   pair{i} [{p.get('order','?'):>4}] raw={p['efficiency']:.3f} "
                  f"work={p.get('work_efficiency', 0):.3f} "
                  f"ceil(cpu/mem)={p.get('cpu_ceiling_8v32')}/{p.get('mem_ceiling_8v32')} "
                  f"vsCeil={p.get('efficiency_vs_ceiling')} "
                  f"wall8={w8:.0f}s(gc {pct(g8, w8)}) "
                  f"wall32={w32:.0f}s(gc {pct(g32, w32)})")
        print(f"   2v8  n={c28.get('n_urls')}  "
              f"best-of-pairs={max((q['efficiency'] for q in c28.get('pairs', [])), default=None)}")
        for i, q in enumerate(c28.get("pairs", [])):
            w2, w8b = q["local2_wall_sec"], q["local8_wall_sec"]
            print(f"   2v8 pair{i} raw={q['efficiency']:.3f} "
                  f"wall2={w2:.0f}s(gc {pct(q.get('local2_gc_sec', 0), w2)}) "
                  f"wall8={w8b:.0f}s(gc {pct(q.get('local8_gc_sec', 0), w8b)})")
        if fl:
            print(f"   flatness: {fl.get('late_vs_early_wall_ratio')}x late/early "
                  f"under {fl.get('frontier_growth_x')}x frontier growth")
        t32 = c.get("local32_urls_per_sec")
        if t32:
            print(f"   throughput: local[32] {t32:.0f} urls/s "
                  f"(local[8] {c.get('local8_urls_per_sec', 0):.0f})")


if __name__ == "__main__":
    main(sys.argv[1:] or ["bench_runs/bench_full_latest.json"])
