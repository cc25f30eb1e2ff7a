#!/usr/bin/env python3
"""100x-scale identity check for the guard-ACTIVE pair queries (q87 image /
q90 audio) against the same star-collapse mirror their oracle SQL encodes.

Why not oracle_check.py: DuckDB inlines (re-evaluates) a CTE per
reference, and the guard mirror references its fingerprint chain through
~10 downstream CTEs — at 100x the 80M-row audio chain is recomputed
concurrently ~10x and spills past the box's 75 GB of free disk
(measured: >47 GB spill before ENOSPC on q90; q87's lighter 32M-row
chain squeaked through in ~13 min). Materializing the per-doc
fingerprints into a temp table once collapses every downstream CTE to
507-to-2M-row work. Semantics are IDENTICAL to the committed oracle SQL —
this is the same mirror with explicit materialization, the
dev/media_dedup_check.py convention.

Usage: python3 dev/guarded_pairs_check.py <sfDir> <verifyOutDir>
"""
import sys

import duckdb

FP_AUDIO = """
CREATE TEMP TABLE fp AS
WITH s AS (
  SELECT doc_id, UNNEST(generate_series(0, 159)) AS i
  FROM '{sf}/documents.parquet'
), v AS (
  SELECT doc_id, i // 5 AS w, (doc_id * (i + 3)) % 256 AS val FROM s
), e AS (
  SELECT doc_id, w, SUM(val) AS ew FROM v GROUP BY doc_id, w
), t AS (
  SELECT doc_id, SUM(ew) AS total FROM e GROUP BY doc_id
)
SELECT e.doc_id AS doc_id,
  CAST(SUM(CASE WHEN 32*e.ew > t.total THEN (1::BIGINT << w)
    ELSE 0 END) AS BIGINT) AS afp
FROM e JOIN t ON e.doc_id = t.doc_id GROUP BY e.doc_id
"""

FP_IMAGE = """
CREATE TEMP TABLE fp AS
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
)
SELECT doc_id,
  CAST(SUM(CASE WHEN pos >= 32 THEN bit * (1::BIGINT << (pos-32))
    ELSE 0 END) AS BIGINT) AS hi,
  CAST(SUM(CASE WHEN pos < 32 THEN bit * (1::BIGINT << pos)
    ELSE 0 END) AS BIGINT) AS lo
FROM b GROUP BY doc_id
"""

# the star-collapse mirror over the materialized fingerprints; {bands}
# explodes per modality, {ham} is the verify expression, 6 the bucket cap
MIRROR = """
CREATE TEMP TABLE mirror AS
WITH bands AS ({bands}),
bcnt AS (SELECT band_idx, band_val, COUNT(*) AS n FROM bands GROUP BY 1, 2),
small AS (SELECT b2.* FROM bands b2 JOIN bcnt USING (band_idx, band_val) WHERE n <= 6),
normal AS (
  SELECT a.doc_id AS id1, c.doc_id AS id2
  FROM small a JOIN small c USING (band_idx, band_val) WHERE a.doc_id < c.doc_id),
big AS (SELECT b2.* FROM bands b2 JOIN bcnt USING (band_idx, band_val) WHERE n > 6),
grp AS (SELECT band_idx, band_val, {fpcols}, MIN(doc_id) AS rep
  FROM big GROUP BY ALL),
stars AS (
  SELECT g.rep AS id1, b2.doc_id AS id2
  FROM big b2 JOIN grp g USING (band_idx, band_val, {fpcols})
  WHERE b2.doc_id <> g.rep),
rcnt AS (SELECT band_idx, band_val, COUNT(*) AS r FROM grp GROUP BY 1, 2),
reps AS (SELECT g.* FROM grp g JOIN rcnt USING (band_idx, band_val) WHERE r <= 6),
reppairs AS (
  SELECT a.rep AS id1, c.rep AS id2
  FROM reps a JOIN reps c USING (band_idx, band_val) WHERE a.rep < c.rep),
cand AS (SELECT DISTINCT id1, id2 FROM (
  SELECT id1, id2 FROM normal
  UNION ALL SELECT id1, id2 FROM stars
  UNION ALL SELECT id1, id2 FROM reppairs))
SELECT cand.id1, cand.id2, CAST({ham} AS INTEGER) AS hamming
FROM cand
JOIN fp f1 ON f1.doc_id = cand.id1
JOIN fp f2 ON f2.doc_id = cand.id2
WHERE {ham} <= {maxham}
"""

AUDIO_BANDS = ("SELECT doc_id, afp, band_idx, "
               "(afp // (1::BIGINT << (8*band_idx))) % 256 AS band_val "
               "FROM fp, (SELECT UNNEST(generate_series(0, 3)) AS band_idx)")
IMAGE_BANDS = ("SELECT doc_id, hi, lo, band_idx, "
               "CASE band_idx WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536 "
               "WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS band_val "
               "FROM fp, (SELECT UNNEST(generate_series(0, 3)) AS band_idx)")


def check(con, sfdir, outdir, name, fp_sql, bands, fpcols, ham, maxham):
    con.execute("DROP TABLE IF EXISTS fp")
    con.execute("DROP TABLE IF EXISTS mirror")
    con.execute(fp_sql.format(sf=sfdir))
    con.execute(MIRROR.format(bands=bands, fpcols=fpcols, ham=ham, maxham=maxham))
    diff1 = con.execute(
        f"SELECT count(*) FROM (SELECT * FROM mirror EXCEPT ALL "
        f"SELECT * FROM '{outdir}/{name}/*.parquet')").fetchone()[0]
    diff2 = con.execute(
        f"SELECT count(*) FROM (SELECT * FROM '{outdir}/{name}/*.parquet' "
        f"EXCEPT ALL SELECT * FROM mirror)").fetchone()[0]
    n = con.execute("SELECT count(*) FROM mirror").fetchone()[0]
    ok = diff1 == 0 and diff2 == 0
    print(f"{name}: mirror={n} rows, symmetric diff {diff1}+{diff2} "
          f"-> {'OK' if ok else 'MISMATCH'}")
    return ok


def main(sfdir, outdir):
    con = duckdb.connect()
    con.execute("SET memory_limit='60GB'")
    con.execute("SET threads=16")
    con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
    ok = check(con, sfdir, outdir, "q87_guarded_image_neardup", FP_IMAGE,
               IMAGE_BANDS, "hi, lo",
               "bit_count(xor(f1.hi, f2.hi)) + bit_count(xor(f1.lo, f2.lo))", 6)
    ok &= check(con, sfdir, outdir, "q90_guarded_audio_neardup", FP_AUDIO,
                AUDIO_BANDS, "afp", "bit_count(xor(f1.afp, f2.afp))", 3)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
