#!/usr/bin/env python3
"""Fold several Bench JSON reps of the SAME query subset into one JSON with
the per-query minimum, honoring the failure contract: a rep's time counts
only if that rep did not fail the query (a fast crash must not read as a
fast bench). Exits nonzero if any query lacks at least one clean cold AND
one clean warm rep.

Big-SF convention (NOTES round-8): this box swings +-2x run-to-run on
scan-heavy rungs at 100x, so scale artifacts report min-over-reps —
the same convention as the sf0.1 record.

Input files must be FULL per-query maps — Bench's own artifacts
(BENCH.out.json / SPARK_GRAFT_BENCH_OUT files). The driver's BENCH_rNN.json
round artifacts are head-TRUNCATED past a window (r9: "parsed": null, tail
starts mid-query) and are records, not tool inputs.

Usage: python3 dev/min_reps.py out.json rep1.json rep2.json ...
"""
import json
import sys


def load(p):
    try:
        return json.load(open(p))
    except json.JSONDecodeError as e:
        sys.exit(f"{p}: not parseable JSON ({e}) — driver BENCH_rNN.json "
                 "artifacts are head-truncated; pass the committed "
                 "BENCH.out.json-style full maps instead")


def main(out, reps):
    loaded = [load(p) for p in reps]
    names = set()
    for j in loaded:
        names |= set(j["queries"])
    merged = {"metric": "total", "value": 0.0, "unit": "sec", "queries": {},
              "warm": {}, "first_computation": {}, "failed": [],
              "reps": reps, "sf": loaded[0].get("sf")}
    bad = []
    for q in sorted(names):
        colds = [j["queries"][q] for j in loaded
                 if q in j["queries"] and q not in j.get("failed", [])]
        warms = [j["warm"][q] for j in loaded
                 if q in j.get("warm", {}) and q not in j.get("failed", [])]
        if not colds or not warms:
            bad.append(q)
            continue
        merged["queries"][q] = min(colds)
        merged["warm"][q] = min(warms)
    if bad:
        sys.exit(f"no clean rep for: {bad}")
    merged["value"] = sum(merged["queries"].values())
    json.dump(merged, open(out, "w"))
    print(f"{out}: {len(merged['queries'])} queries, "
          f"cold {merged['value']:.1f}s, warm {sum(merged['warm'].values()):.1f}s "
          f"(min over {len(reps)} reps)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
