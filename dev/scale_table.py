#!/usr/bin/env python3
"""Render the SCALE table: per-query cold/warm seconds at 10x and 100x from
two Bench JSONs, with the warm 100x/10x ratio (rows = 10x everywhere, so a
ratio near 10 is linear consumption; far above flags a superlinear rung).

Session-sensitive queries (cold > 2x warm at either SF) are flagged with a
trailing ! and listed after the table: their cold number swings with JIT +
page-cache state (q42 spanned 23.8-111.5 s across four same-code 100x runs,
SCALE_r10 §5), so the WARM column is the primary comparison number for them
— compare warm-to-warm or solo-probe before calling a regression.

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
        sens = any(c and w and w > 0.5 and c > 2 * w
                   for c, w in ((c10, w10), (c100, w100)))
        rows.append((q, c10, w10, c100, w100, ratio, sens))
    print("| query | 10x cold | 10x warm | 100x cold | 100x warm | warm 100x/10x |")
    print("|---|---|---|---|---|---|")
    for q, c10, w10, c100, w100, r, sens in rows:
        f = lambda v: f"{v:.2f}" if v is not None else "—"
        mark = " !" if sens else ""
        print(f"| {q}{mark} | {f(c10)} | {f(w10)} | {f(c100)} | {f(w100)} | "
              f"{f(r) if r else '—'} |")
    t10 = sum(v for v in j10["warm"].values())
    t100 = sum(v for v in j100["warm"].values())
    print(f"\nwarm totals: 10x {t10:.1f}s, 100x {t100:.1f}s "
          f"(ratio {t100 / t10:.1f}; failed: {j100.get('failed')})")
    worst = sorted((r for r in rows if r[5]), key=lambda r: -r[5])[:5]
    print("top warm ratios: " + ", ".join(f"{r[0]}={r[5]:.1f}" for r in worst))
    sensitive = [q for q, *_, sens in rows if sens]
    if sensitive:
        print("session-sensitive (cold > 2x warm; compare WARM or solo-probe "
              "— q42 convention, SCALE_r10 §5): " + ", ".join(sensitive))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
