#!/usr/bin/env python3
"""Synthesize an N-times scale probe fixture from an sf dir (driver-side
tooling, not part of the shipped library).

Method (matches the round-6 sf1 probe documented in SCALE.md): each copy
c > 0 shifts ids; `documents` get a deterministic token-order rotation per
copy so no fake cross-copy near-dups are planted; `embeddings` get a
dimension roll + alternating sign flip per copy (norm-preserving,
direction-decorrelating) so no fake cosine near-dups. Relational tables
shift EVERY key column (…_id and …key — both primary keys like
c_custkey/p_partkey and the foreign keys that point at them) so each copy
is a self-contained universe: a fact-dim join scales linearly with the
copy count instead of fanning out ~N^2 across copies with duplicated
dimension PKs.

Usage: python3 tools/synth_scale.py <src_sf_dir> <out_dir> <copies> [tables...]
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq

ID_SHIFT = 10_000_000


def permute_text(text: str, c: int) -> str:
    toks = text.split(" ")
    k = c % max(1, len(toks))
    return " ".join(toks[k:] + toks[:k])


def rotate_vec(vec, c: int):
    n = len(vec)
    k = c % n
    rolled = list(vec[k:]) + list(vec[:k])
    return [(-v if (i + c) % 2 else v) for i, v in enumerate(rolled)]


def synth(src: str, out: str, copies: int, tables):
    import os
    os.makedirs(out, exist_ok=True)
    for t in tables:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        parts = [tbl]
        for c in range(1, copies):
            cols = {}
            for name in tbl.column_names:
                col = tbl.column(name)
                # every key column: _id suffixes (events/documents) and the
                # TPC-H *key family (custkey, orderkey, partkey, suppkey,
                # nationkey, regionkey) on both the PK and FK side
                if name.endswith(("_id", "key")):
                    if pa.types.is_integer(col.type):
                        cols[name] = pa.compute.add(col, c * ID_SHIFT)
                        continue
                if t == "documents" and name == "text":
                    cols[name] = pa.array(
                        [permute_text(v.as_py(), c) for v in col])
                    continue
                if t == "embeddings" and name == "embedding":
                    cols[name] = pa.array(
                        [rotate_vec(v.as_py(), c) for v in col],
                        type=col.type)
                    continue
                cols[name] = col
            parts.append(pa.table({n: cols[n] for n in tbl.column_names}))
        merged = pa.concat_tables(parts)
        pq.write_table(merged, f"{out}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} -> {merged.num_rows}")


if __name__ == "__main__":
    src, out, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    tables = sys.argv[4:] or ["documents", "embeddings", "events", "orders",
                              "customer", "lineitem", "region", "nation",
                              "supplier", "part"]
    synth(src, out, copies, tables)
