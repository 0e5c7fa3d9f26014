#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

For each <name>.parquet under verifyOutDir (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB against the sfDir
tables and compares: row count, column names, and a hash of values with
columns sorted by name and rows sorted canonically. Queries with no oracle
entry get a rows-only check (>0 rows).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 9)
        if r == 0.0:
            r = 0.0  # normalize -0.0 (projection outputs can round to it)
        return repr(r)
    return str(v)


def frame_sig(df):
    # df: pandas DataFrame
    cols = sorted(df.columns)
    rows = [tuple(canon(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort()
    import hashlib
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return len(rows), cols, h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional: --json PATH dumps driver-format per-query records
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    # optional: --skip a,b,c marks queries ORACLE-INFEASIBLE at this scale
    # (e.g. a brute-force N^2 oracle at sf1) — recorded as skipped, not
    # silently green
    skip = set()
    if "--skip" in sys.argv:
        skip = set(sys.argv[sys.argv.index("--skip") + 1].split(","))
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():
            # Spark-written table dir (the FullScaleGen sf1 set): glob
            # its part files instead of the single-file driver layout
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results = {}
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        try:
            spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        if name in skip:
            results[name] = ("ORACLE-INFEASIBLE (skipped at this scale; "
                             f"spark rows {len(spark_df)})" +
                             (" OK" if len(spark_df) > 0 else " EMPTY!"))
            continue
        import time as _t
        _t0 = _t.time()
        if name not in oracles:
            results[name] = f"rows-only ({len(spark_df)} rows)" + \
                (" OK" if len(spark_df) > 0 else " EMPTY!")
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {e}"
            continue
        sn, sc, sh = frame_sig(spark_df)
        on, oc, oh = frame_sig(oracle_df)
        if sc != oc:
            results[name] = f"COLS-MISMATCH spark={sc} oracle={oc}"
        elif sn != on:
            results[name] = f"ROWS-MISMATCH spark={sn} oracle={on}"
        elif sh != oh:
            # locate first differing row for debugging
            results[name] = "HASH-MISMATCH"
            scols = sorted(spark_df.columns)
            a = sorted(tuple(canon(v) for v in r)
                       for r in spark_df[scols].itertuples(index=False))
            b = sorted(tuple(canon(v) for v in r)
                       for r in oracle_df[scols].itertuples(index=False))
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    results[name] += f" first-diff@{i} spark={x} oracle={y}"
                    break
        else:
            results[name] = f"OK ({sn} rows)"
        print(f"[progress] {name}: {results[name].split()[0]} "
              f"({_t.time() - _t0:.1f}s)", file=sys.stderr, flush=True)
    n_ok = sum(1 for v in results.values() if v.startswith("OK") or "rows-only" in v and "EMPTY" not in v)
    n_skip = sum(1 for v in results.values()
                 if v.startswith("ORACLE-INFEASIBLE") and "EMPTY" not in v)
    for k in sorted(results):
        print(f"{results[k].split()[0]:>14}  {k}: {results[k]}")
    print(f"\n{n_ok}/{len(results)} passing" +
          (f" ({n_skip} oracle-infeasible, rows>0 only)" if n_skip else ""))
    if json_out:
        rec = {}
        for k, v in sorted(results.items()):
            ok = v.startswith("OK")
            rows = None
            if ok:
                rows = int(v.split("(")[1].split()[0])
            rec[k] = {"rows_match": ok or not v.startswith("ROWS-MISMATCH"),
                      "schema_match": ok or not v.startswith("COLS-MISMATCH"),
                      "hash_match": ok,
                      "spark_rows": rows, "oracle_rows": rows,
                      "err": None if ok else v}
        Path(json_out).write_text(json.dumps(rec, indent=1))
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
