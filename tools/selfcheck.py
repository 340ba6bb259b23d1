#!/usr/bin/env python3
"""Dev-only self-check (not part of the Scala library).

Mirrors the driver's correctness gate: runs graft.Verify's parquet dumps
against the DuckDB oracle SQL in oracle_sql.json and diffs them with
columns sorted by name and rows sorted by all columns.

Usage:  python3 tools/selfcheck.py <verify_out_dir> <sf_dir> [--scale]

--scale (r14): resolve the declared at-scale contract
(scale_contract.json, written by graft.Verify) instead of requiring
every oracle hash-exact — the sf0.01 driver gate NEVER uses this flag.
Two declared classes:
  * float_rollups: the float-revenue rollups are checked to an ulp
    tolerance AND their named integer-cents twin must pass exact in the
    same sweep (the cents twin is the any-scale-exact form by design).
  * brute_delegates: queries whose oracles are deliberately brute
    all-pairs (hours-by-construction in DuckDB at sf1) are passed iff
    their named bounded-sample twin — the IDENTICAL brute oracle on a
    deterministic residue slice — passes exact and the query's own dump
    is non-empty.
Every sweep row therefore resolves mechanically: exact pass, contract
pass (with its witness named in the output), or fail.
"""
import json
import sys
import tempfile
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes that differ only in representation
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
        elif df[c].dtype == "float32":
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype) in ("int32", "int16", "int8", "uint32"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    args = [a for a in sys.argv[1:] if a != "--scale"]
    scale_mode = "--scale" in sys.argv[1:]
    out_dir, sf_dir = Path(args[0]), args[1]
    contract = {"float_rollups": {}, "brute_delegates": {}}
    if scale_mode:
        cpath = out_dir / "scale_contract.json"
        if not cpath.exists():
            sys.exit("--scale requires scale_contract.json in the dump dir "
                     "(written by graft.Verify since r14)")
        contract = json.loads(cpath.read_text())
    con = duckdb.connect()
    # Spill outside the repo: an earlier audit run left 25 GB of
    # duckdb_temp_* scratch under ./.tmp and it got committed.
    tmp = Path(tempfile.gettempdir()) / "graft_duckdb_tmp"
    tmp.mkdir(parents=True, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = n_noop = 0
    exact_passed = set()  # witnesses for deferred contract rows
    deferred = []  # (kind, name, twin, detail) resolved after the loop
    seen = set()
    for name in sorted(p.name for p in out_dir.iterdir() if p.is_dir()):
        seen.add(name)
        env_marker = out_dir / name / "_ENVELOPE.json"
        if env_marker.exists():
            # a DECLARED refusal (graft.ScaleEnvelopeExceeded): the exact
            # baseline was driven past its compute envelope; its claim is
            # carried by the bounded-sample twin
            reason = json.loads(env_marker.read_text()).get("reason", "")
            if scale_mode and name in contract["brute_delegates"]:
                deferred.append(("envelope", name,
                                 contract["brute_delegates"][name], reason))
            else:
                n_fail += 1
                print(f"FAIL {name:32s} out-of-envelope refusal with no "
                      f"applicable contract: {reason}")
            continue
        spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if scale_mode and name in contract["brute_delegates"]:
            # the brute all-pairs oracle is hours-by-construction at this
            # scale BY DESIGN; the declared bounded-sample twin carries
            # the same per-pair completeness claim and is checked exact
            deferred.append(("brute", name, contract["brute_delegates"][name],
                             len(spark_df)))
            continue
        if name not in oracle:
            status = "rows-only"
            ok = len(spark_df) > 0
            if ok:
                n_noop += 1
            else:
                n_fail += 1  # an empty rows-only result must fail the gate
            print(f"{'PASS' if ok else 'FAIL'} {name:32s} ({status}, {len(spark_df)} rows)")
            continue
        try:
            rel = con.sql(oracle[name])
            # Precise lint for the HUGEINT landmine: DuckDB integer sum()
            # widens to HUGEINT, which pandas coerces to float64/object and
            # the driver's dtype-sensitive hash then diverges from Spark's
            # int64. Any HUGEINT output column means a missing ::BIGINT cast.
            huge = [c for c, t in zip(rel.columns, rel.types) if str(t) == "HUGEINT"]
            if huge:
                n_fail += 1
                print(f"FAIL {name:32s} oracle emits HUGEINT column(s) "
                      f"{huge} — add ::BIGINT cast to the sum()")
                continue
            oracle_df = rel.df()
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name:32s} oracle SQL error: {e}")
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            n_fail += 1
            print(f"FAIL {name:32s} columns differ: spark={list(a.columns)} oracle={list(b.columns)}")
            continue
        if len(a) != len(b):
            n_fail += 1
            print(f"FAIL {name:32s} rowcount differs: spark={len(a)} oracle={len(b)}")
            continue
        # The driver's hash is dtype-sensitive: int64 1 != float64 1.0.
        # DuckDB HUGEINT (e.g. an uncast windowed sum) lands in pandas as
        # float64 or object, so any int-vs-float kind divergence between the
        # Spark dump and the oracle is a guaranteed driver hash mismatch —
        # fail it here even though the values compare equal.
        kind_clash = [
            c for c in a.columns
            if {a[c].dtype.kind, b[c].dtype.kind} == {"i", "f"}
            or {a[c].dtype.kind, b[c].dtype.kind} == {"i", "O"}
        ]
        if kind_clash:
            n_fail += 1
            for c in kind_clash:
                print(f"FAIL {name:32s} dtype kind clash on '{c}': "
                      f"spark={a[c].dtype} oracle={b[c].dtype} "
                      f"(cast the oracle expression, e.g. ::BIGINT)")
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            n_pass += 1
            exact_passed.add(name)
            print(f"PASS {name:32s} ({len(a)} rows)")
        except AssertionError:
            # retry with tolerance to distinguish float-noise from real bugs
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-9, atol=1e-9)
                if scale_mode and name in contract["float_rollups"]:
                    # the declared float-rollup contract: ulp-only delta is
                    # expected past the gate scale; the named cents twin
                    # must exact-pass in this same sweep
                    deferred.append(
                        ("ulp", name, contract["float_rollups"][name], len(a)))
                    continue
                n_fail += 1
                print(f"FAIL {name:32s} float-noise only (would fail exact hash!) — round harder")
            except AssertionError as e2:
                n_fail += 1
                msg = str(e2).splitlines()[0]
                print(f"FAIL {name:32s} {msg}")
                diff = a.compare(b) if a.shape == b.shape else None
                if diff is not None and not diff.empty:
                    print(diff.head(5).to_string())
    # completeness: a query that crashed upstream writes no dump dir and
    # would otherwise vanish from the sweep silently. Only meaningful for
    # a FULL sweep (--scale); plain mode is also used on name-filtered
    # Verify dumps during development, where most oracles are absent by
    # construction.
    if scale_mode:
        for name in sorted(set(oracle) - seen):
            n_fail += 1
            print(f"FAIL {name:32s} registered oracle but no dump written "
                  f"(query failed upstream? check the Verify log)")
    # resolve deferred contract rows against their exact-passed witnesses
    n_contract = 0
    for kind, name, twin, detail in deferred:
        if kind == "brute":
            ok = twin in exact_passed and detail > 0
            label = (f"scale-contract: brute oracle delegated to exact-passed "
                     f"{twin}; dump {detail} rows")
        elif kind == "envelope":
            ok = twin in exact_passed
            label = (f"scale-contract: exact baseline out of declared "
                     f"envelope; witness {twin}")
        else:
            ok = twin in exact_passed
            label = f"scale-contract: ulp-only float delta ({detail} rows); exact via {twin}"
        if ok:
            n_contract += 1
            print(f"PASS {name:32s} ({label})")
        else:
            n_fail += 1
            print(f"FAIL {name:32s} contract witness {twin} did not exact-pass"
                  + ("" if kind != "brute" or detail else "; empty dump"))
    tail = f", {n_contract} contract-pass" if scale_mode else ""
    print(f"\n{n_pass} exact-pass, {n_fail} fail, {n_noop} rows-only{tail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
