#!/usr/bin/env python3
"""One-off ~3x scale slice for the r15 heavy-kernel probe (VERDICT r14
item 6). NOT gate data — a wall-time-scaling probe for the five kernels
whose 100x claims rest on plan shape (q108/q100/q22/q20/q160).

Construction: three replicas of sf0.1's documents/embeddings with
remapped ids. A naive union would be pathological for NEAR-DUP kernels —
every doc would gain two exact copies, inflating candidate density
quadratically and measuring the data, not the engine — so each replica
is vocabulary-isolated:

- documents: every token gets a per-replica suffix (t -> t_rK), so
  replicas share no n-gram and the duplicate/near-dup pair structure is
  exactly 3x sf0.1's (same density, 3x volume — the linear-scaling null
  hypothesis a fair probe needs).
- embeddings: replica K applies a signed cyclic coordinate rotation
  (rotate by 21*K dims; negate for K=1). Signed permutations are
  orthogonal, so every within-replica inner product — and hence the
  whole cosine/k-means/near-dup structure the kernels probe — is
  EXACTLY sf0.1's, while cross-replica cosines decorrelate and create
  no new near-dup pairs: 3x volume at identical density. (A naive
  translation like +10 on one dim is NOT cosine-preserving — it
  collapses a replica onto one dominant direction and manufactures
  quadratic near-dup mass.)

Usage: python3 tools/make_sf03.py [outDir=/tmp/graft_sf03]
Writes documents.parquet and embeddings.parquet (plus passthrough copies
of the star-schema tables some Tables() loaders touch are NOT needed —
the probed kernels read only these two).
"""
import sys
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf03"
src = "/root/testdata/sf0.1"

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

docs_sql = " UNION ALL ".join(
    f"SELECT doc_id + {k * 1000000} AS doc_id, "
    f"CASE WHEN text IS NULL THEN NULL WHEN text = '' THEN '' ELSE "
    f"array_to_string(list_transform(string_split(text, ' '), t -> t || '_r{k}'), ' ') END AS text, "
    f"lang, source, n_chars "
    f"FROM read_parquet('{src}/documents.parquet')"
    for k in range(3))
con.execute(f"COPY ({docs_sql}) TO '{out}/documents.parquet' (FORMAT parquet)")

emb_sql = " UNION ALL ".join(
    f"SELECT vec_id + {k * 1000000} AS vec_id, "
    f"list_transform(range(64), i -> {'-' if k == 1 else ''}embedding[((i + {21 * k}) % 64) + 1])::FLOAT[] AS embedding, "
    f"label FROM read_parquet('{src}/embeddings.parquet')"
    for k in range(3))
con.execute(f"COPY ({emb_sql}) TO '{out}/embeddings.parquet' (FORMAT parquet)")

# customer triples too (q160's Ed-Join input): per-replica name suffixes
# whose PAIRWISE length gaps exceed tau ('', 'qq', 'qqqq') keep every
# within-replica edit distance unchanged while pushing every cross-replica
# distance past tau=1 — 3x volume at identical match density (suffix
# lengths 0/1/2 left adjacent replicas at distance 1 and manufactured
# 30k cross-replica matches; measured before this comment existed)
cust_sql = " UNION ALL ".join(
    f"SELECT c_custkey + {k * 1000000} AS c_custkey, "
    f"c_name || '{'q' * (2 * k)}' AS c_name, "
    "c_nationkey, c_acctbal, c_mktsegment "
    f"FROM read_parquet('{src}/customer.parquet')"
    for k in range(3))
con.execute(f"COPY ({cust_sql}) TO '{out}/customer.parquet' (FORMAT parquet)")

for t in ("region nation supplier part orders lineitem").split():
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
        f"TO '{out}/{t}.parquet' (FORMAT parquet)")

# events triples for the grouped-statistic cards (r17 VERDICT item 3:
# q293/q300/q249-family probes were blind on a passthrough copy):
# replica K suffixes event_type (3x sources, each with sf0.1's exact
# per-source daily/value structure — the linear null hypothesis for
# group-keyed cards) and offsets event_id by an EVEN constant so
# q220/q293's even/odd event_id split is preserved within each replica.
# ts/value/user_id pass through: same days, same distributions.
ev_sql = " UNION ALL ".join(
    f"SELECT event_id + {k * 2000000} AS event_id, ts, user_id, "
    f"event_type || '{'' if k == 0 else f'_r{k}'}' AS event_type, "
    "value, props "
    f"FROM read_parquet('{src}/events.parquet')"
    for k in range(3))
con.execute(f"COPY ({ev_sql}) TO '{out}/events.parquet' (FORMAT parquet)")

for t in ("documents", "embeddings"):
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
    print(t, n)
print("wrote", out)
