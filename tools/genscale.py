#!/usr/bin/env python3
"""Generate sf1-scale (10x sf0.1) parquet tables for SCALING measurement.

The driver's fixture generator is not available in-repo, so sf1 is built
by 10x replication of the read-only sf0.1 fixtures with
structure-preserving, content-disjoint transforms per replica k:

  - documents: doc_id offset; whitespace tokens get a replica suffix
    ("the" -> "thek3") EXCEPT the retrieval query vocabulary (QVOCAB
    below), which is preserved so the boolean/bm25/phrase/lookup family
    has non-degenerate result sets at every scale point (the r7 audit
    found the suffix-everything transform made retrieval vacuously
    0 = 0 at sf1). Preservation is RUN-BROKEN: a QVOCAB token is still
    suffixed when the two preceding tokens were both preserved, so no
    3-token window is ever all-preserved => the dedup families' 3-gram
    shingles keep ZERO cross-replica overlap (the guarantee the old
    transform gave), while ~90% of each query term's occurrences
    survive per replica (at ~47% QVOCAB mass the all-preserved-window
    rate is ~0.47^3 ~ 10%). The run-break decision depends only on the
    base document, so all replicas of a doc preserve/suffix the SAME
    positions; within-replica shingle structure is no longer exactly
    the base corpus's (run-broken positions split a token type into
    preserved+suffixed forms) but near-dup geometry is preserved to
    within the ~10% of windows the break touches, and correctness at
    every scale point remains exact by construction (the oracle
    recomputes on the same transformed data).
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

# The union of every registered retrieval query's terms
# (InvertedIndex.scala: retrievalQuery/retrievalQueries, bm25Terms,
# phraseTerms, index_term_lookup's isin). Keep in sync with the Scala.
QVOCAB = {"key", "value", "spark", "stream", "big", "data", "hash", "dup",
          "fast", "slow", "query", "window", "sort", "order", "scan"}


# phrase_retrieval's registered phrase needs token ADJACENCY, i.e. a
# preserved 3-run — the one thing the run-break forbids. Exact
# occurrences of the phrase are therefore FORCE-preserved: the ~1/31^3
# base trigram rate (~9 docs per replica at sf0.1) means the handful of
# shingle windows overlapping a phrase run are the ONLY cross-replica
# shingle collisions, each with frequency ~9*K docs — far under the
# stop-shingle cap and with cross-replica Jaccard still ~0. The
# generator prints the measured collision count so the bound is
# checked, not assumed.
PHRASE = ("big", "order", "scan")


def doc_text(text: str, k: int) -> str:
    """Replica-k transform of one document: suffix every token except
    run-broken QVOCAB occurrences (max preserved run = 2 < shingle
    width 3) and force-preserved exact PHRASE runs. Deterministic,
    position-aligned across replicas."""
    ts = text.split(" ")
    n = len(ts)
    forced = [False] * n
    for i in range(n - 2):
        if tuple(ts[i:i + 3]) == PHRASE:
            forced[i] = forced[i + 1] = forced[i + 2] = True
    out, run = [], 0
    for i, t in enumerate(ts):
        if forced[i] or (t in QVOCAB and run < 2):
            out.append(t)
            run += 1
        else:
            out.append(t + "k" + str(k))
            run = 0
    return " ".join(out)

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

    # documents: the run-broken transform is sequential per doc, so it
    # runs in Python (50k rows at K=10 — trivial) and lands via a
    # registered pandas frame
    import pandas as pd
    base = con.execute(
        f"SELECT doc_id, text, lang, source FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchdf()
    frames = []
    for k in range(K):
        f = base.copy()
        f["doc_id"] = f["doc_id"] + k * 1000000
        f["text"] = f["text"].map(lambda t, k=k: doc_text(t, k))
        frames.append(f)
    docs = pd.concat(frames, ignore_index=True)
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    con.register("docs_py", docs)
    con.execute(f"COPY (SELECT * FROM docs_py) TO '{out_dir}/documents.parquet' (FORMAT parquet)")
    print(f"documents: {len(docs)} rows", flush=True)
    # check, don't assume: the cross-replica 3-shingle collision set must
    # stay tiny (only windows overlapping force-preserved PHRASE runs)
    coll, worst = con.execute(f"""
        WITH toks AS (
          SELECT doc_id // 1000000 AS rep, string_split(text, ' ') ts
          FROM read_parquet('{out_dir}/documents.parquet')),
        sh AS (
          SELECT rep, unnest([ts[i] || '|' || ts[i+1] || '|' || ts[i+2]
                              for i in range(1, greatest(len(ts) - 1, 1))]) AS s
          FROM toks),
        x AS (SELECT s, count(*) f FROM sh GROUP BY s HAVING count(DISTINCT rep) > 1)
        SELECT count(*), coalesce(max(f), 0) FROM x""").fetchone()
    print(f"documents: {coll} cross-replica shingles (max freq {worst})", flush=True)
    # ENFORCED, not just printed (r8 advice): a QVOCAB token adjacent to
    # a force-preserved PHRASE run extends the preserved run past 3, so
    # all-preserved windows beyond the phrase-only set CAN exist — the
    # fixture is only valid while they stay a handful (the dedup
    # families' cross-replica-disjointness argument) and far under the
    # engine's stop-shingle cap (graft.operators.Dedup.maxShingleFreq =
    # 1000, where the ngram-jaccard self-join would start dropping
    # them). Measured at K=10: 5 shingles, max freq 100.
    MAX_COLLISION_SHINGLES = 64
    STOP_SHINGLE_CAP = 1000  # mirror of Dedup.maxShingleFreq
    assert coll <= MAX_COLLISION_SHINGLES, (
        f"{coll} cross-replica shingles > {MAX_COLLISION_SHINGLES}: the "
        "preserved-run break is leaking beyond phrase windows; fixture invalid")
    assert worst * 2 <= STOP_SHINGLE_CAP, (
        f"max collision frequency {worst} is within 2x of the stop-shingle "
        f"cap {STOP_SHINGLE_CAP}: the retrieval fixture would start "
        "interacting with the dedup families' frequency guard")

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
