#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir> [name ...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB over the parquet tables in <sfDir>, and compares the
result against the engine's parquet dump in <verifyOutDir>/<name>/.

CRITICAL: this gate must fail exactly the way the driver fails. The driver
renders BOTH sides through pandas (`.df()` / `read_parquet`), sorts columns
by name, stringifies cell values, row-sorts, and hashes. Rendering through
pandas is load-bearing: DuckDB HUGEINT (the result type of SUM over any
integer) becomes float64 in pandas, so an uncast `SUM(bigint)` oracle
renders `3.0` where the Spark int64 renders `3` — a hash mismatch with zero
value-level diffs. The previous fetchall()-based version of this script
normalized through native Python ints and was blind to that entire class
(shipped 3 driver failures in round 5). Hence:

  * both sides go through pandas DataFrames, never fetchall();
  * a dtype tripwire fires when a DuckDB column renders float64/object
    while the engine column is int64 (instant FAIL with a CAST hint),
    even before value comparison;
  * cells are stringified with the same repr rules pandas hashing sees.

Driver-side tooling only — not part of the Scala library.
"""
import duckdb, json, sys

import numpy as np
import pandas as pd


def render_cell(v):
    """Stringify a pandas cell the way the driver's hash sees it."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return '∅'
    try:
        if pd.isna(v):
            return '∅'
    except (TypeError, ValueError):
        pass  # arrays etc. — handled below
    if isinstance(v, (list, np.ndarray)):
        # The driver's pandas row-sort crashes on ndarray cells; any
        # array-typed output is a guaranteed driver 'err'.
        raise TypeError('array-typed output column (driver-unsortable)')
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    return str(v)


def df_rows(df, cols):
    return sorted(tuple(render_cell(r[c]) for c in cols)
                  for r in df.to_dict('records'))


def main(sf, out, only=()):
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    con = duckdb.connect()
    for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
              'lineitem', 'documents', 'embeddings']:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    # events: parquet TIMESTAMP(NANOS) -> truncate to us, same as the engine
    con.execute(
        "CREATE VIEW events AS SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, "
        f"user_id, event_type, value, props FROM read_parquet('{sf}/events.parquet')")

    fails = []
    for name, sql in sorted(oracle.items()):
        try:
            dk = con.execute(sql).df()
            c2 = duckdb.connect()
            sp = c2.execute(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
        except Exception as e:
            fails.append((name, f'error: {e}'))
            continue
        if sorted(dk.columns) != sorted(sp.columns):
            fails.append((name, f'cols: duck={sorted(dk.columns)} spark={sorted(sp.columns)}'))
            continue
        cols = sorted(dk.columns)
        # Dtype tripwire: DuckDB HUGEINT/DECIMAL render float64 (or object)
        # in pandas; if the engine emits int64 for the same column the
        # driver hash-fails with zero value diffs. Catch it by dtype alone.
        bad_dtypes = [
            c for c in cols
            if str(sp[c].dtype).startswith('int')
            and not str(dk[c].dtype).startswith(('int', 'uint'))
        ]
        if bad_dtypes:
            fails.append((name,
                          'dtype: oracle renders '
                          + ', '.join(f'{c} as {dk[c].dtype}' for c in bad_dtypes)
                          + ' but engine emits int64 — CAST(... AS BIGINT) in the oracle'))
            continue
        try:
            dn = df_rows(dk, cols)
            sn = df_rows(sp, cols)
        except TypeError as e:
            fails.append((name, f'error: {e}'))
            continue
        if len(dn) != len(sn):
            fails.append((name, f'rows: duck={len(dn)} spark={len(sn)}'))
        elif dn != sn:
            bad = next(i for i, (a, b) in enumerate(zip(dn, sn)) if a != b)
            fails.append((name, f'values differ @sortedrow {bad}: duck={dn[bad]} spark={sn[bad]}'))
    print(f'{len(oracle) - len(fails)}/{len(oracle)} PASS')
    for n, msg in fails:
        print('FAIL', n, str(msg)[:400])
    return 1 if fails else 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
