#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tool only — the
engine itself has no Python dependency). Usage:

    python3 dev/oracle_check.py /root/testdata/sf0.01 /tmp/vout

Registers each testdata parquet as a view, runs every oracle_sql.json query,
and diffs it against the Spark output parquet under <outdir>/<name>/.

An optional third arg skips named queries (comma-separated): at 10x data
q45's recursive-closure formulation is infeasible in DuckDB (>2h; its
scale oracle is the independent union-find in dev/cc_check.py), so the
standing scale gate runs

    python3 dev/oracle_check.py /tmp/sf1 /tmp/vout10 q45_dedup_components
    python3 dev/cc_check.py /tmp/sf1 /tmp/vout10
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


def main(sfdir, outdir, skip=()):
    con = duckdb.connect()
    # Bound the engine explicitly: at 10x the heavier oracles (q71's
    # recursive curation + rebuild) overcommit under the default
    # (80%-of-RAM) limit and get OOM-killed by the OS mid-run. A cap
    # under physical RAM plus a spill directory makes DuckDB spill
    # instead of dying; 32 GB is too tight for q67's anchor-join
    # expansion (hard OOM error), 80 GB fits every oracle at 10x on the
    # harness box. Derive it from physical RAM (~70%, ceiling 80 GB) so a
    # smaller host keeps the cap under RAM instead of reinstating the OS
    # OOM-kill (ADVICE r9); override via GRAFT_DUCKDB_MEM.
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem is None:
        try:
            phys = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
            mem = f"{min(80, max(1, int(phys * 0.7 / 2**30)))}GB"
        except (ValueError, OSError):
            mem = "80GB"
    con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET threads=16")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    # GRAFT_ORACLE_ONLY=q1,q2 restricts the gate to named queries — the
    # oracle SQL runs BEFORE the dump check, so a subset Verify dump at a
    # big scale factor would otherwise still pay every heavy oracle (the
    # q71-class recursive ones are minutes at 10x, hours at 100x).
    only = os.environ.get("GRAFT_ORACLE_ONLY")
    only = set(x.strip() for x in only.split(",") if x.strip()) if only else None
    for name in sorted(set(oracle) & set(skip)):
        print(f"skip {name} (separate oracle)")
    for name, sql in sorted(oracle.items()):
        if name in skip:
            continue
        if only is not None and name not in only:
            continue
        try:
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchall()
            got_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failures += 1
            continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols want={want_cols} got={got_cols}")
            failures += 1
            continue
        # driver sorts columns by name before hashing; do the same
        wi = [want_cols.index(c) for c in sorted(want_cols)]
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        w = [tuple(norm(r[i]) for i in wi) for r in want]
        g = [tuple(norm(r[i]) for i in gi) for r in got]
        if len(w) != len(g):
            print(f"FAIL {name}: rows want={len(w)} got={len(g)}")
            failures += 1
            continue
        bad = [(a, b) for a, b in zip(w, g) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(w)} rows differ; first: "
                  f"want={bad[0][0]} got={bad[0][1]}")
            failures += 1
        else:
            print(f"ok   {name}: {len(w)} rows")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3].split(",") if len(sys.argv) > 3 else ()))
