#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each <name>.parquet under verifyOutDir (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB over views of the sfDir
parquet tables, sorts columns by name, sorts rows, and compares values
exactly (with a tiny float report to show how close near-misses are).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def load_result_dir(d: Path):
    files = sorted(d.glob("*.parquet"))
    if not files:
        return None
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return tbl


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    out = Path(out_dir)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads((out / "oracle_sql.json").read_text())
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(p for p in out.iterdir() if p.is_dir()):
        name = qdir.name
        got_t = load_result_dir(qdir)
        if got_t is None:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: rows={got_t.num_rows} (no oracle)")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracles[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got_cols = sorted(got_t.column_names)
        exp_cols = sorted(exp.column_names)
        if got_cols != exp_cols:
            print(f"FAIL {name}: schema {got_cols} vs {exp_cols}")
            n_fail += 1
            continue
        sort_key = lambda row: tuple((v is None, str(v)) for v in row)
        got_rows = sorted(
            [tuple(norm_cell(c) for c in r) for r in
             zip(*[got_t.column(c).to_pylist() for c in got_cols])],
            key=sort_key)
        exp_rows = sorted(
            [tuple(norm_cell(c) for c in r) for r in
             zip(*[exp.column(c).to_pylist() for c in exp_cols])],
            key=sort_key)
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rowcount {len(got_rows)} vs {len(exp_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            if g != e:
                # measure float distance for diagnostics
                close = all(
                    (a == b) or (isinstance(a, float) and isinstance(b, float)
                                 and abs(a - b) < 1e-9 * max(1.0, abs(b)))
                    for a, b in zip(g, e))
                bad = (i, g, e, close)
                break
        if bad:
            i, g, e, close = bad
            tag = "FAIL(close)" if close else "FAIL"
            print(f"{tag} {name}: row {i}\n  got {g}\n  exp {e}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(got_rows)} cols={len(got_cols)}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
