#!/usr/bin/env python3
"""Synthesize an N-times scale probe fixture from an sf dir (driver-side
tooling, not part of the shipped library).

Method: each copy c > 0 shifts ids; `documents` get a per-copy token TAG
so copies share no shingles (an earlier token-order rotation preserved
the shingle SET, planting c-way true near-dup clusters — round-8
adjudication in SCALE.md); `embeddings` get a dimension roll + a
per-(copy, dim) hash-derived sign flip (norm-preserving,
direction-decorrelating, APERIODIC in c — the earlier roll+parity scheme
repeated every 64 copies, planting exact duplicates past 64 copies).
Relational tables shift EVERY key column (…_id and …key — both primary
keys like c_custkey/p_partkey and the foreign keys that point at them) so
each copy is a self-contained universe: a fact-dim join scales linearly
with the copy count instead of fanning out ~N^2 across copies with
duplicated dimension PKs.

Usage: python3 tools/synth_scale.py <src_sf_dir> <out_dir> <copies> [tables...]
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq

ID_SHIFT = 10_000_000


def copy_tag(c: int) -> str:
    # Alphabetic-only copy tag (round 9): the earlier "_<digits>" suffix
    # was 3 extra pieces under text_tokens' BPE-ish regex
    # ([a-z]+|[0-9]+|[^a-z0-9\s]) — underscore + digit-run — inflating the
    # probe's per-token piece count 3x (round-8 adjudication, SCALE.md).
    # A lowercase base-26 tag PREPENDED to the token merges into the
    # token's own leading letter run, so the regex counts it once and the
    # probe measures the operator, not the tag.
    s = ""
    n = c
    while True:
        s = chr(97 + n % 26) + s
        n //= 26
        if n == 0:
            return s


def permute_text(text: str, c: int) -> str:
    # Per-copy token TAG, not rotation: a rotation preserves the word
    # w-gram shingle SET (only the wrap seam changes), so rotated copies
    # were 100-way TRUE near-dup clusters — pair-output dedup on such a
    # fixture is output-bound (Omega(#true pairs), ~n*copies pairs), which
    # measures the corpus, not the operator (round-8 adjudication in
    # SCALE.md). Tagging every token with the copy index makes copies
    # shingle-disjoint self-contained universes (the same discipline as
    # the key-column shift) while preserving within-copy duplicate
    # structure and whitespace/BPE-ish token counts (character lengths grow
    # by the tag width, so only token-based length metrics are
    # scale-comparable).
    toks = text.split(" ")
    tag = copy_tag(c)
    return " ".join(f"{tag}{t}" for t in toks)


def distinct_name(name: str, partkey: int, c: int) -> str:
    # Per-(copy, row) SUFFIX WORD for `part.p_name` (round 10, the
    # ER-family probe): part copies previously kept p_name verbatim, so
    # the ER queries' leading distinct() collapsed any scaled fixture back
    # to the base vocabulary (this testdata's p_name universe is 64
    # two-word names) and the probe measured nothing. Appending one
    # alphabetic word — the copy tag + the base-26 spelling of the row's
    # base partkey — makes every copy-c row a DISTINCT name, so the
    # resolved universe grows to ~rows·copies while the HEAD vocabulary
    # (the first words, and with them the prefix-q-gram skew that drives
    # the family's block purging) stays exactly the base distribution —
    # the realistic head-word/discriminative-tail name shape. Within a
    # copy, rows sharing a base name get suffix words differing in ≥1
    # base-26 digit; across copies the tag differs — so true lev≤2
    # matches stay the IN-QUERY derived dirty variants, not planted
    # cross-row pairs (the round-8 output-bound-fixture adjudication).
    # Copy 0 is verbatim (the tool's identity-at-c=0 invariant), a
    # vanishing fraction of any scaled fixture.
    #
    # The suffix spells a HASH of the partkey, fixed-width (6 base-26
    # chars), not the partkey itself: consecutive integers spelled in
    # base-26 share all but their trailing 1-2 digits, so a first cut of
    # this tool planted ~20 lev<=2 neighbors per row — 300-strong
    # near-cliques per base name, ~10^8 true edges at 5M names, an edge
    # density no dirty corpus has (duplicates per entity run 2-5). A real
    # ER probe wants O(n) true matches (each dirty row resolving to its
    # clean source, plus rare accidents), which a uniform 6-char suffix
    # delivers: P(lev<=2) between two random 6-char strings is
    # negligible, and the Knuth-multiplicative hash is deterministic, so
    # fixtures rebuild identically.
    # Mix the COPY INDEX into the hash: a first cut hashed the base
    # partkey alone, so all copies shared one 20k-suffix set and names
    # across copies differed only in the 1-2-char copy tag — 250-way
    # lev<=2 cliques (~6*10^8 true edges at 250 copies) and every
    # suffix-block sitting just under the purge cap. With the copy mixed
    # in, cross-copy suffixes are unrelated 6-char strings (lev > 2), so
    # the true-match structure stays the in-query derived variants.
    h = ((int(partkey) + c * 20011) * 2654435761) % (26 ** 6)
    s = ""
    for _ in range(6):
        s = chr(97 + h % 26) + s
        h //= 26
    return f"{name} {copy_tag(c)}{s}"


def _signs(c: int, n: int):
    # Per-(copy, dim) ±1 from md5 — aperiodic in c. The previous scheme
    # (roll k=c%n, sign (i+c)%2 with n even) depended only on c%n, so
    # copies c and c+n carried byte-identical embeddings: at 500 copies of
    # a 64-dim corpus every vector had ~7 exact cross-copy duplicates at
    # cosine 1.0, and similarity probes measured the planted duplicates,
    # not the operator (round-8 adjudication in SCALE.md).
    import hashlib
    digest = hashlib.md5(f"signs:{c}".encode()).digest()
    # stretch 16 bytes to n bits deterministically
    bits = []
    block = digest
    while len(bits) < n:
        for byte in block:
            for j in range(8):
                bits.append(1 if (byte >> j) & 1 else -1)
        block = hashlib.md5(block).digest()
    return bits[:n]


_SIGN_CACHE = {}


def rotate_vec(vec, c: int):
    n = len(vec)
    k = c % n
    if (c, n) not in _SIGN_CACHE:
        _SIGN_CACHE[(c, n)] = _signs(c, n)
    sg = _SIGN_CACHE[(c, n)]
    rolled = list(vec[k:]) + list(vec[:k])
    return [sg[i] * v for i, v in enumerate(rolled)]


def synth(src: str, out: str, copies: int, tables):
    import os
    os.makedirs(out, exist_ok=True)
    for t in tables:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        # upcast every integer key column to int64 ONCE — copy 0 included,
        # so all copies share one schema and concat never refuses (the
        # earlier same-type shift kept int32 keys int32, where c*ID_SHIFT
        # overflows past c=214: pa.compute.add wraps silently, colliding
        # keys across copies and breaking the self-contained-universe
        # property this tool exists to guarantee)
        tbl = pa.table({
            name: (pa.compute.cast(tbl.column(name), pa.int64())
                   if name.endswith(("_id", "key"))
                   and pa.types.is_integer(tbl.column(name).type)
                   else tbl.column(name))
            for name in tbl.column_names})
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
                        # add_checked: any future overflow fails loudly
                        # instead of silently wrapping into key collisions
                        cols[name] = pa.compute.add_checked(
                            col, pa.scalar(c * ID_SHIFT, type=pa.int64()))
                        continue
                if t == "documents" and name == "text":
                    cols[name] = pa.array(
                        [permute_text(v.as_py(), c) for v in col])
                    continue
                if t == "part" and name == "p_name":
                    pk = tbl.column("p_partkey")
                    cols[name] = pa.array(
                        [distinct_name(v.as_py(), pk[i].as_py(), c)
                         for i, v in enumerate(col)])
                    continue
                if t == "embeddings" and name == "embedding":
                    cols[name] = pa.array(
                        [rotate_vec(v.as_py(), c) for v in col],
                        type=col.type)
                    continue
                cols[name] = col
            parts.append(pa.table({n: cols[n] for n in tbl.column_names}))
        merged = pa.concat_tables(parts)
        # multiple row groups, or the file can never split across Spark
        # tasks: a single-row-group file pins every scan (and any map-heavy
        # expression over it, e.g. the shingle explode) to ONE core no
        # matter what spark.sql.files.maxPartitionBytes says
        pq.write_table(merged, f"{out}/{t}.parquet", row_group_size=32768)
        print(f"{t}: {tbl.num_rows} -> {merged.num_rows}")


if __name__ == "__main__":
    src, out, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    tables = sys.argv[4:] or ["documents", "embeddings", "events", "orders",
                              "customer", "lineitem", "region", "nation",
                              "supplier", "part"]
    synth(src, out, copies, tables)
