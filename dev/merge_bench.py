#!/usr/bin/env python3
"""Merge chunked Bench JSONs (SPARK_GRAFT_ONLY runs) into one suite JSON.

A 100x full-suite pass is driven as several SPARK_GRAFT_ONLY chunks so one
multi-hour rung can't zero the whole run; each chunk writes its own
SPARK_GRAFT_BENCH_OUT file. This merges them back into the single-JSON shape
dev/scale_table.py consumes (queries/warm/first_computation/failed unioned,
"value" = summed cold).

Chunk files must be FULL per-query maps (SPARK_GRAFT_BENCH_OUT files, not
the driver's head-truncated BENCH_rNN.json round artifacts — see
min_reps.py's note).

Usage: python3 dev/merge_bench.py out.json chunk1.json chunk2.json ...
"""
import json
import sys


def load(p):
    try:
        return json.load(open(p))
    except json.JSONDecodeError as e:
        sys.exit(f"{p}: not parseable JSON ({e}) — pass full "
                 "BENCH.out.json-style maps, not driver BENCH_rNN.json tails")


def main(out, chunks):
    merged = {"metric": "total", "value": 0.0, "unit": "sec", "queries": {},
              "warm": {}, "first_computation": {}, "failed": [], "sf": None}
    for p in chunks:
        j = load(p)
        for k in ("queries", "warm", "first_computation"):
            dup = set(merged[k]) & set(j.get(k, {}))
            if dup:
                sys.exit(f"duplicate {k} entries across chunks: {sorted(dup)}")
            merged[k].update(j.get(k, {}))
        merged["failed"].extend(j.get("failed", []))
        merged["sf"] = merged["sf"] or j.get("sf")
    merged["value"] = sum(merged["queries"].values())
    merged["failed"] = sorted(set(merged["failed"]))
    json.dump(merged, open(out, "w"))
    print(f"{out}: {len(merged['queries'])} queries, cold {merged['value']:.1f}s, "
          f"warm {sum(merged['warm'].values()):.1f}s, failed {merged['failed']}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
