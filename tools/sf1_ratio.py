#!/usr/bin/env python3
"""Compare two graft.Bench JSON lines (e.g. sf0.1 vs sf1) and print the
per-query cold/warm ratio table for the scale audit in PLANS.md.

Usage: python3 tools/sf1_ratio.py /tmp/bench_sf01.json /tmp/bench_sf1.json
"""
import json
import sys

base = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
flag_at = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0

rows = []
for q, t1 in big["queries"].items():
    t0 = base["queries"].get(q)
    w0 = base.get("queries_warm", {}).get(q)
    w1 = big.get("queries_warm", {}).get(q)
    if t0 is None or t0 <= 0 or t1 <= 0:
        rows.append((q, t0, t1, None, w0, w1, None))
        continue
    rows.append((q, t0, t1, t1 / t0, w0, w1,
                 (w1 / w0) if (w0 and w1 and w0 > 0 and w1 > 0) else None))

rows.sort(key=lambda r: -(r[3] or 0))
print(f"{'query':28} {'sf0.1':>7} {'sf1':>8} {'ratio':>7} {'warm0.1':>8} {'warm1':>8} {'wratio':>7}")
for q, t0, t1, r, w0, w1, wr in rows:
    fl = "  <-- >%.0fx" % flag_at if (r or 0) > flag_at else ""
    print(f"{q:28} {t0 or -1:7.2f} {t1 or -1:8.2f} "
          f"{('%7.1f' % r) if r else '      -'} "
          f"{w0 or -1:8.2f} {w1 or -1:8.2f} {('%7.1f' % wr) if wr else '      -'}{fl}")
print(f"\ntotals: cold {base['value']:.1f}s -> {big['value']:.1f}s | "
      f"warm {base.get('warm_total', -1):.1f}s -> {big.get('warm_total', -1):.1f}s")
