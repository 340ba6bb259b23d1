#!/usr/bin/env python3
"""Generate sf1-scale (10x sf0.1) parquet tables for SCALING measurement.

The driver's fixture generator is not available in-repo, so sf1 is built
by 10x replication of the read-only sf0.1 fixtures with
structure-preserving, content-disjoint transforms per replica k:

  - documents: doc_id offset; every whitespace token gets a replica
    suffix ("the" -> "thek3"). Token-level bijection => within-replica
    shingle/jaccard structure is EXACTLY the base corpus's; cross-replica
    shingle overlap is zero. Dedup/cluster workloads therefore scale
    linearly in structure (10x clusters, same size distribution), which
    is the honest null hypothesis a scaling curve should test.
  - embeddings: vec_id offset; vector components circularly shifted by k
    (a permutation = orthogonal transform: ALL within-replica dot
    products and norms are preserved exactly; cross-replica pairs
    decorrelate). Banded/ANN workloads scale 10x candidates with the
    identical per-replica geometry.
  - events: event_id/user_id offset per replica; timestamps, types,
    values unchanged => same bounded hourly grid, 10x users at the same
    per-user density (interval joins scale linearly by key count).
  - lineitem/orders/customer/part/supplier: all synthetic keys offset by
    replica * (max+1) => the PPR/triangle bipartite graph becomes 10
    disjoint copies of the sf0.1 graph; joins keep FK integrity.
  - nation/region: fixed dims, copied as-is.

Used ONLY for scaling curves (PLANS.md); correctness stays gated on the
driver's sf0.01 fixtures. Deterministic: no randomness anywhere.
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
K = int(__import__("os").environ.get("GRAFT_SCALE_K", "10"))  # replicas

def main(out_dir: str) -> None:
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT * FROM range(0, {K}) t(k)")

    def gen(name: str, select_sql: str) -> None:
        src = f"read_parquet('{SRC}/{name}.parquet')"
        q = f"COPY ({select_sql.format(src=src)}) TO '{out_dir}/{name}.parquet' (FORMAT parquet)"
        con.execute(q)
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out_dir}/{name}.parquet')").fetchone()[0]
        print(f"{name}: {n} rows", flush=True)

    # fixed dims: straight copies
    for dim in ("nation", "region"):
        gen(dim, "SELECT * FROM {src}")

    gen("documents", """
        SELECT doc_id + k * 1000000 AS doc_id,
               array_to_string(list_transform(string_split(text, ' '),
                                              t -> t || 'k' || k), ' ') AS text,
               lang, source,
               CAST(length(array_to_string(list_transform(string_split(text, ' '),
                                           t -> t || 'k' || k), ' ')) AS BIGINT) AS n_chars
        FROM {src}, reps""")

    gen("embeddings", """
        SELECT vec_id + k * 1000000 AS vec_id,
               list_transform(range(1, len(embedding) + 1),
                              i -> embedding[((i - 1 + k) % len(embedding)) + 1]) AS embedding,
               label
        FROM {src}, reps""")

    gen("events", """
        SELECT event_id + k * 100000000 AS event_id, ts,
               user_id + k * 100000 AS user_id, event_type, value, props
        FROM {src}, reps""")

    gen("lineitem", """
        SELECT l_orderkey + k * 150000 AS l_orderkey,
               l_partkey + k * 20000 AS l_partkey,
               l_suppkey + k * 1000 AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM {src}, reps""")

    gen("orders", """
        SELECT o_orderkey + k * 150000 AS o_orderkey,
               o_custkey + k * 15000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src}, reps""")

    gen("customer", """
        SELECT c_custkey + k * 15000 AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {src}, reps""")

    gen("part", """
        SELECT p_partkey + k * 20000 AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM {src}, reps""")

    gen("supplier", """
        SELECT s_suppkey + k * 1000 AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM {src}, reps""")

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graftscale/sf1"
    import os
    os.makedirs(out, exist_ok=True)
    main(out)
