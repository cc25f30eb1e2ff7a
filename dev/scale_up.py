#!/usr/bin/env python3
"""Deterministic scale-up of a testdata dir (dev tool only — the engine has
no Python dependency). Usage:

    python3 dev/scale_up.py /root/testdata/sf0.1 /tmp/sf1 10

Replicates the FACT tables `factor` times with id-space offsets (dimension
tables stay fixed — the realistic shape: facts grow, dims don't):
  - orders.o_orderkey / lineitem.l_orderkey share the same offset so join
    integrity holds across replicas;
  - events.event_id, documents.doc_id, embeddings.vec_id offset likewise;
  - documents.text gets a per-replica suffix token (replica 0 unchanged), so
    replicas are near-duplicates of each other, not exact duplicates — the
    LSH/Jaccard pipeline sees 10x the unique corpus with 10x-sized near-dup
    clusters, a genuine stress of candidate generation;
  - everything else is byte-identical per replica.

pyarrow (not Spark/DuckDB) so physical parquet types survive exactly —
events.ts is TIMESTAMP(NANOS) and must stay that way for engine + oracle
parity.
"""
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 10**9  # far above any sf's key range, keeps int64 comfortable

DIMS = ["region", "nation", "customer", "supplier", "part"]


def scaled(src, dst, name, factor, offset_cols, text_col=None):
    tbl = pq.read_table(f"{src}/{name}.parquet")
    parts = []
    for r in range(factor):
        t = tbl
        if r > 0:
            for c in offset_cols:
                i = t.schema.get_field_index(c)
                t = t.set_column(i, t.schema.field(i),
                                 pc.add(t.column(c), r * OFFSET))
            if text_col is not None:
                i = t.schema.get_field_index(text_col)
                suffixed = pc.binary_join_element_wise(
                    pc.cast(t.column(text_col), pa.string()),
                    pa.scalar(f"r{r}"), pa.scalar(" "))
                t = t.set_column(i, t.schema.field(i),
                                 pc.cast(suffixed, t.schema.field(i).type))
        parts.append(t)
    out = pa.concat_tables(parts)
    # Realistic row-group granularity for the row-heavy-but-byte-small
    # tables: pyarrow's default (1Mi rows/group) packs 500k documents into
    # ONE row group, and Spark can never split a scan below a row group —
    # every map-heavy text/embedding query then runs its whole scan stage
    # in a single task no matter how many cores the executor has (caught at
    # 100x: q56 measured single-thread regex throughput on a 32-core box).
    # A real corpus gets its scan parallelism from file count / 128MB row
    # groups; these fixed row counts give the single-file harness corpus
    # the same splittability (~2MB/group) without changing a byte of data.
    rg = {"documents": 16384, "embeddings": 8192}.get(name)
    if rg:
        pq.write_table(out, f"{dst}/{name}.parquet", row_group_size=rg)
    else:
        pq.write_table(out, f"{dst}/{name}.parquet")
    print(f"{name}: {len(tbl)} -> {len(out)} rows"
          + (f" (rg={rg})" if rg else ""))


def main(src, dst, factor):
    import os
    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"{t}: copied (dim)")
    scaled(src, dst, "orders", factor, ["o_orderkey"])
    scaled(src, dst, "lineitem", factor, ["l_orderkey"])
    scaled(src, dst, "events", factor, ["event_id"])
    scaled(src, dst, "documents", factor, ["doc_id"], text_col="text")
    scaled(src, dst, "embeddings", factor, ["vec_id"])


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
