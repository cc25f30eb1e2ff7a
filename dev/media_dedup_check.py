#!/usr/bin/env python3
"""Exact oracle for q85_image_dedup at scale factors where DuckDB's
recursive-CTE closure is infeasible (the same O(component^2) reach
materialization that rules out q45's CTE at 10x — SCALE_r08; q85's 10x
pair graph is 8.7M edges over ~195-member hamming-0 cliques).

Recomputes the SAME pair set linearly (the q80 closed-form hash + banded
join + hamming <= 6 verify — row-identical to the engine at 10x,
SCALE_r12 §2b), then runs union-find (path compression + union by size —
a different algorithm from the engine's pointer-jumped min-label
propagation, so this is an independent check), keeps the min id per
component as the survivor, and compares against the engine's
q85_image_dedup dump row-for-row.

Usage: python3 dev/media_dedup_check.py <sfDir> <verifyOutDir>
"""
import sys

import duckdb

PAIRS_SQL = """
WITH px AS (
  SELECT doc_id, UNNEST(generate_series(0, 63)) AS pos
  FROM '{sf}/documents.parquet'
), v AS (
  SELECT doc_id, pos, (doc_id * (2*pos + 1)) % 256 AS val FROM px
), s AS (
  SELECT doc_id, SUM(val) AS total FROM v GROUP BY doc_id
), b AS (
  SELECT v.doc_id, v.pos, CASE WHEN 64*v.val > s.total THEN 1 ELSE 0 END AS bit
  FROM v JOIN s USING (doc_id)
), hashes AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN pos >= 32 THEN bit * (1::BIGINT << (pos-32))
      ELSE 0 END) AS BIGINT) AS hi,
    CAST(SUM(CASE WHEN pos < 32 THEN bit * (1::BIGINT << pos)
      ELSE 0 END) AS BIGINT) AS lo
  FROM b GROUP BY doc_id
), bands AS (
  SELECT doc_id, hi, lo, band_idx,
    CASE band_idx WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
                  WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS band_val
  FROM hashes, (SELECT UNNEST(generate_series(0, 3)) AS band_idx)
)
SELECT DISTINCT a.doc_id AS id1, c.doc_id AS id2
FROM bands a JOIN bands c
  ON a.band_idx = c.band_idx AND a.band_val = c.band_val
  AND a.doc_id < c.doc_id
WHERE bit_count(xor(a.hi, c.hi)) + bit_count(xor(a.lo, c.lo)) <= 6
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

    size = {}
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
                if size.get(ra, 1) < size.get(rb, 1):
                    ra, rb = rb, ra
                parent[rb] = ra
                size[ra] = size.get(ra, 1) + size.get(rb, 1)

    # survivor = min id per component (the engine's min-label rule)
    comp_min = {}
    for i in ids:
        r = find(i)
        if r not in comp_min or i < comp_min[r]:
            comp_min[r] = i
    survivors = sorted(i for i in ids if comp_min[find(i)] == i)

    got = sorted(r[0] for r in con.execute(
        f"SELECT doc_id FROM '{outdir}/q85_image_dedup/*.parquet'").fetchall())
    ok = got == survivors
    print(f"pairs={npairs} survivors_expected={len(survivors)} "
          f"survivors_engine={len(got)} -> {'OK' if ok else 'MISMATCH'}")
    if not ok:
        exp, gs = set(survivors), set(got)
        print("  missing:", sorted(exp - gs)[:10])
        print("  extra:  ", sorted(gs - exp)[:10])
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
