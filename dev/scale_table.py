#!/usr/bin/env python3
"""Render the SCALE table: per-query cold/warm seconds at 10x and 100x from
two Bench JSONs, with the warm 100x/10x ratio (rows = 10x everywhere, so a
ratio near 10 is linear consumption; far above flags a superlinear rung).

Usage: python3 dev/scale_table.py /tmp/bench_10x.json /tmp/bench_100x.json
"""
import json
import sys


def main(p10, p100):
    j10 = json.load(open(p10))
    j100 = json.load(open(p100))
    rows = []
    for q in sorted(j10["queries"]):
        c10, w10 = j10["queries"][q], j10["warm"].get(q)
        c100, w100 = j100["queries"].get(q), j100["warm"].get(q)
        ratio = (w100 / w10) if (w10 and w100 and w10 > 0) else None
        rows.append((q, c10, w10, c100, w100, ratio))
    print("| query | 10x cold | 10x warm | 100x cold | 100x warm | warm 100x/10x |")
    print("|---|---|---|---|---|---|")
    for q, c10, w10, c100, w100, r in rows:
        f = lambda v: f"{v:.2f}" if v is not None else "—"
        print(f"| {q} | {f(c10)} | {f(w10)} | {f(c100)} | {f(w100)} | "
              f"{f(r) if r else '—'} |")
    t10 = sum(v for v in j10["warm"].values())
    t100 = sum(v for v in j100["warm"].values())
    print(f"\nwarm totals: 10x {t10:.1f}s, 100x {t100:.1f}s "
          f"(ratio {t100 / t10:.1f}; failed: {j100.get('failed')})")
    worst = sorted((r for r in rows if r[5]), key=lambda r: -r[5])[:5]
    print("top warm ratios: " + ", ".join(f"{q}={r:.1f}" for q, *_, r in worst))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
