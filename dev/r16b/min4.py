#!/usr/bin/env python3
"""r16 FINAL min-over-reps record (post-optimization) + comparisons against
the inherited mid-build record (dev/r16/sf01_min4.json, the round's
"before") and the r15 verdict record."""
import json, glob

reps = [json.load(open(f)) for f in sorted(glob.glob('/root/repo/dev/r16b/final_rep*.json'))]
qs = {}
for r in reps:
    for q, s in r['queries'].items():
        qs[q] = min(qs.get(q, 1e18), s)
rec = {"metric": "sf01_min_over_%d" % len(reps), "value": sum(qs.values()),
       "unit": "sec", "queries": qs, "sf": reps[0]['sf']}
json.dump(rec, open('/root/repo/dev/r16b/sf01_min4_final.json', 'w'), indent=1)
print("r16-final min-over-%d: %.1f s over %d queries" % (len(reps), sum(qs.values()), len(qs)))

for label, path in [("inherited r16 mid-build", '/root/repo/dev/r16/sf01_min4.json'),
                    ("r15 verdict", '/root/repo/dev/r15/sf01_107_min4_head.json')]:
    old = json.load(open(path))['queries']
    shared = sorted(set(qs) & set(old))
    print("vs %s — shared %d: %.1f s vs %.1f s (%.3fx)" % (
        label, len(shared), sum(qs[q] for q in shared), sum(old[q] for q in shared),
        sum(qs[q] for q in shared) / sum(old[q] for q in shared)))
    reg = [(q, old[q], qs[q]) for q in shared if qs[q] > old[q] * 1.25 and qs[q] - old[q] > 0.5]
    print("  regressions >25%% & >0.5s: %d" % len(reg))
    for q, a, b in sorted(reg, key=lambda x: x[1] - x[2]):
        print("    %s: %.2f -> %.2f" % (q, a, b))
    imp = sorted(((q, old[q], qs[q]) for q in shared if old[q] - qs[q] > 0.5),
                 key=lambda x: x[2] - x[1])
    print("  top improvements:")
    for q, a, b in imp[:10]:
        print("    %s: %.2f -> %.2f" % (q, a, b))
