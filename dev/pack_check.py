#!/usr/bin/env python3
"""Compositional check for q75 (prep -> pack) at scale factors where the
monolithic stitched oracle exceeds DuckDB's capacity (the q73 convention,
SCALE_r10): given the ENGINE's q73 artifact (the clean corpus, itself
oracle-verified compositionally at 10x) DuckDB recomputes the packing tail
alone — re-tokenize clean_text, join documents for the lang shard, apply
the cumulative-sum bin rule at 1024 tokens — and the result must be
row-identical to the engine's q75 artifact.

Usage: python3 dev/pack_check.py <sfDir> <verifyOutDir>
  (expects <verifyOutDir>/q73_train_prep and /q75_prep_pack parquet dirs)
"""
import sys

import duckdb


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW clean AS SELECT * FROM '{out_dir}/q73_train_prep/*.parquet'")
    con.execute(f"CREATE VIEW docs AS SELECT * FROM '{sf_dir}/documents.parquet'")
    con.execute(f"CREATE VIEW engine AS SELECT * FROM '{out_dir}/q75_prep_pack/*.parquet'")
    expected = """
      WITH packd AS (
        SELECT c.doc_id, d.lang,
          CASE WHEN c.clean_text = '' THEN 0
               ELSE len(regexp_split_to_array(c.clean_text, '\\s+')) END AS n_tokens
        FROM clean c JOIN docs d ON c.doc_id = d.doc_id)
      SELECT doc_id, lang, n_tokens,
        CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING) - n_tokens) / 1024.0) AS BIGINT) AS bin_id
      FROM packd"""
    diff1 = con.execute(f"SELECT count(*) FROM (({expected}) EXCEPT (SELECT * FROM engine))").fetchone()[0]
    diff2 = con.execute(f"SELECT count(*) FROM ((SELECT * FROM engine) EXCEPT ({expected}))").fetchone()[0]
    n_eng = con.execute("SELECT count(*) FROM engine").fetchone()[0]
    n_exp = con.execute(f"SELECT count(*) FROM ({expected})").fetchone()[0]
    ok = diff1 == 0 and diff2 == 0 and n_eng == n_exp
    print(f"{'ok  ' if ok else 'FAIL'} q75 pack tail: engine {n_eng} rows, "
          f"recomputed {n_exp}, symmetric diff {diff1}+{diff2}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
