#!/usr/bin/env python3
"""Exact oracle for q45_dedup_components at scale factors where DuckDB's
recursive-CTE closure is infeasible (the closure materializes O(component^2)
rows; a 10x corpus produced a 2010-doc LSH bucket and the CTE ran >30 min).

Recomputes the SAME edge set linearly (band-bucket equi-join, exactly the
q45 LSH parameters: 2-word shingles, 16 md5 minhashes, 4 bands x 4 rows),
then runs union-find (path compression + union by size — a different
algorithm from the engine's pointer-jumped min-label propagation, so this is
an independent check), derives min-id labels, and compares against the Spark
output parquet row-for-row.

Usage: python3 dev/cc_check.py <sfDir> <verifyOutDir>
"""
import sys

import duckdb

PAIRS_SQL = """
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
           FROM '{sf}/documents.parquet'),
sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(ws)-1, 1)),
  i -> array_to_string(ws[i:i+1], ' '))) AS s FROM w),
sig AS (SELECT doc_id, list_transform(generate_series(0, 15),
  k -> list_aggregate(list_transform(s, x -> md5(concat(k, ':', x))), 'min')) AS g FROM sh),
bands AS (SELECT doc_id, list_transform(generate_series(0, 3),
  b -> md5(array_to_string(g[b*4+1:b*4+4], '|'))) AS bl FROM sig),
bexp AS (SELECT doc_id, t.b AS band, bl[t.b] AS bucket
  FROM bands, generate_series(1, 4) t(b))
SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
FROM bexp a JOIN bexp b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


def main(sfdir, outdir):
    con = duckdb.connect()
    ids = [r[0] for r in con.execute(
        f"SELECT doc_id FROM '{sfdir}/documents.parquet'").fetchall()]

    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    # Stream the pair set in batches: at 100x it is hundreds of millions of
    # rows and a fetchall() would hold them all as Python tuples at once.
    # Union-find folds each batch immediately, so peak memory is one batch
    # plus the (num_docs-sized) parent map.
    res = con.execute(PAIRS_SQL.format(sf=sfdir))
    npairs = 0
    while True:
        batch = res.fetchmany(2_000_000)
        if not batch:
            break
        npairs += len(batch)
        for a, b in batch:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    print(f"docs={len(ids)} candidate_pairs={npairs}")
    # min-id label per root: roots are minimal by construction (we always
    # attach the larger root beneath the smaller), so label == find(x)
    want = {x: find(x) for x in ids}

    got = dict(con.execute(
        f"SELECT doc_id, comp FROM '{outdir}/q45_dedup_components/*.parquet'")
        .fetchall())
    if set(got) != set(want):
        print(f"FAIL q45: id sets differ (got {len(got)}, want {len(want)})")
        return 1
    bad = [(k, got[k], want[k]) for k in want if got[k] != want[k]]
    if bad:
        print(f"FAIL q45: {len(bad)}/{len(want)} labels differ; first: "
              f"doc={bad[0][0]} got={bad[0][1]} want={bad[0][2]}")
        return 1
    n_comp = len(set(want.values()))
    print(f"ok   q45_dedup_components: {len(want)} rows, {n_comp} components "
          f"(union-find oracle)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
