#!/usr/bin/env python3
"""Min-over-reps record builder + r15 comparison (the r14/r15 convention)."""
import json, sys, glob

reps = [json.load(open(f)) for f in sorted(glob.glob('/root/repo/dev/r16/sf01_rep*.json'))]
qs = {}
for r in reps:
    for q, s in r['queries'].items():
        qs[q] = min(qs.get(q, 1e18), s)
rec = {"metric": "sf01_min_over_%d" % len(reps), "value": sum(qs.values()),
       "unit": "sec", "queries": qs, "sf": reps[0]['sf']}
json.dump(rec, open('/root/repo/dev/r16/sf01_min4.json', 'w'), indent=1)
print("r16 min-over-%d: %.1f s over %d queries" % (len(reps), sum(qs.values()), len(qs)))

old = json.load(open('/root/repo/dev/r15/sf01_107_min4_head.json'))
oq = old['queries']
shared = sorted(set(qs) & set(oq))
print("shared %d: r16 %.1f s vs r15 %.1f s (%.3fx)" % (
    len(shared), sum(qs[q] for q in shared), sum(oq[q] for q in shared),
    sum(qs[q] for q in shared) / sum(oq[q] for q in shared)))
reg = [(q, oq[q], qs[q]) for q in shared if qs[q] > oq[q] * 1.25 and qs[q] - oq[q] > 0.5]
print("regressions >25%% & >0.5s: %d" % len(reg))
for q, a, b in sorted(reg, key=lambda x: x[1]-x[2]):
    print("  %s: %.2f -> %.2f" % (q, a, b))
imp = sorted(((q, oq[q], qs[q]) for q in shared if oq[q] - qs[q] > 0.5), key=lambda x: x[2]-x[1])
print("top improvements:")
for q, a, b in imp[:8]:
    print("  %s: %.2f -> %.2f" % (q, a, b))
new = sorted(set(qs) - set(oq))
print("new queries:", ", ".join("%s %.2fs" % (q, qs[q]) for q in new))
