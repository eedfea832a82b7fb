#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare against the Verify parquet
dump (columns sorted by name, exact value equality — floats must be
bit-identical, mirroring the driver's hash compare).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# DuckDB result types with no engine-portable twin: the driver's hash is
# type-sensitive, so an oracle emitting any of these fails hash_match even
# when every value is identical (r10: window SUM(BIGINT) -> HUGEINT broke
# q_rolling/q_running/q_rolling_time while this script said OK). Declared
# types are checked BEFORE fetchdf(), which silently coerces HUGEINT to
# float64 and hides the drift.
NON_PORTABLE = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT", "UINTEGER",
                "USMALLINT", "UTINYINT", "INT128", "UINT")


def type_drift(s, d, duck_types):
    """Return a human-readable drift description, or None if the result
    types are portable and consistent between the two engines."""
    for c, t in zip(d.columns, duck_types):
        tu = str(t).upper()
        if any(tu.startswith(x) for x in NON_PORTABLE):
            return f"oracle col={c} non-portable duckdb type {t}"
    for c in s.columns:
        a, b = s[c].dtype, d[c].dtype
        if a.kind != b.kind:
            return f"col={c} dtype kind spark={a} duck={b}"
        # Integer width drift is driver-tolerated (q_value_mixed: spark
        # int64 vs duck int32 was hash-green in CORRECTNESS_r10); float
        # width is not known-safe, so keep it strict. datetime64 unit
        # (ns vs us) is a pandas artifact, not an engine type.
        if a.kind == "f" and a.itemsize != b.itemsize:
            return f"col={c} dtype width spark={a} duck={b}"
    return None


def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # sf10-scale oracle replays can exceed the box (q_winnow_cluster hit
    # 117 GB RSS before being killed, r20): GRAFT_DUCKDB_MEM caps the
    # buffer pool so DuckDB spills to disk instead of OOMing the host,
    # GRAFT_DUCKDB_THREADS bounds CPU when sharing the box.
    if os.environ.get("GRAFT_DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
    if os.environ.get("GRAFT_DUCKDB_MEM") or os.environ.get("GRAFT_DUCKDB_TMP"):
        con.execute(f"SET temp_directory='{os.environ.get('GRAFT_DUCKDB_TMP', '/tmp/graft_duckdb_spill')}'")
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written tables (e.g. the ScaleUp sf1 image) are
            # directories of part files; driver testdata is single files
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(outdir)):
        if not os.path.isdir(f"{outdir}/{name}"):
            continue
        if only and name not in only:
            continue
        spark = load_spark(outdir, name)
        if name not in oracle:
            print(f"{name:24s} NO_ORACLE rows={len(spark) if spark is not None else '?'}")
            n_skip += 1
            continue
        try:
            rel = con.sql(oracle[name])
            duck_types = list(rel.types)
            duck = rel.fetchdf()
        except Exception as e:
            print(f"{name:24s} ORACLE_ERR {str(e)[:120]}")
            n_fail += 1
            continue
        # Sort rows by all columns before the positional compare: queries
        # without a total output order (no trailing arrange, multi-part
        # parquet reads) would otherwise spuriously VALUE_MISMATCH. Mirrors
        # the driver's sorted-hash compare.
        s = spark[sorted(spark.columns)]
        d = duck[sorted(duck.columns)]
        s = s.sort_values(list(s.columns), kind="mergesort").reset_index(drop=True)
        d = d.sort_values(list(d.columns), kind="mergesort").reset_index(drop=True)
        if list(s.columns) != list(d.columns):
            print(f"{name:24s} SCHEMA_MISMATCH spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"{name:24s} ROWS_MISMATCH spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        # Reorder duck_types to the name-sorted column order used below.
        duck_types = [duck_types[list(duck.columns).index(c)] for c in d.columns]
        drift = type_drift(s, d, duck_types)
        if drift:
            print(f"{name:24s} TYPE_MISMATCH {drift}")
            n_fail += 1
            continue
        bad = None
        for c in s.columns:
            a, b = s[c].to_numpy(), d[c].to_numpy()
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                a, b = a.astype('float64'), b.astype('float64')
                eq = (a == b) | (np.isnan(a) & np.isnan(b))
            else:
                eq = pd.Series(a).astype(str).to_numpy() == pd.Series(b).astype(str).to_numpy()
            if not eq.all():
                i = int(np.argmin(eq))
                bad = (c, i, s[c].iloc[i], d[c].iloc[i])
                break
        if bad:
            print(f"{name:24s} VALUE_MISMATCH col={bad[0]} row={bad[1]} spark={bad[2]!r} duck={bad[3]!r}")
            n_fail += 1
        else:
            print(f"{name:24s} OK rows={len(s)}")
            n_pass += 1
    print(f"\npass={n_pass} fail={n_fail} no_oracle={n_skip}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
