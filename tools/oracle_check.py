#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB over the parquet tables in <sfDir>, and compares the
result (column-name-sorted, value-normalized, row-sorted) against the
engine's parquet dump in <verifyOutDir>/<name>/.

Driver-side tooling only — not part of the Scala library.
"""
import duckdb, json, sys, decimal

def main(sf, out):
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    con = duckdb.connect()
    for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
              'lineitem', 'documents', 'embeddings']:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    # events: parquet TIMESTAMP(NANOS) -> truncate to us, same as the engine
    con.execute(
        "CREATE VIEW events AS SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, "
        f"user_id, event_type, value, props FROM read_parquet('{sf}/events.parquet')")

    # Driver-strict rendering: the driver compares pandas-rendered values,
    # where a DuckDB DECIMAL arrives as float64 but a Spark parquet decimal
    # arrives as decimal.Decimal ('141.7' vs '141.70'). No normalization —
    # a decimal-typed engine output must fail here exactly as it fails the
    # driver, so queries cast decimal outputs to DOUBLE in their final
    # projection.
    def norm(v):
        if v is None:
            return '∅'
        if isinstance(v, decimal.Decimal):
            return str(v)
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, list):
            # The driver's pandas row-sort crashes on ndarray cells; any
            # array-typed output is a guaranteed driver 'err'.
            raise TypeError('array-typed output column (driver-unsortable)')
        return str(v)

    fails = []
    for name, sql in sorted(oracle.items()):
        try:
            dk = con.execute(sql).fetchall()
            dcols = [d[0] for d in con.description]
            c2 = duckdb.connect()
            sp = c2.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchall()
            scols = [d[0] for d in c2.description]
        except Exception as e:
            fails.append((name, f'error: {e}'))
            continue
        if sorted(dcols) != sorted(scols):
            fails.append((name, f'cols: duck={sorted(dcols)} spark={sorted(scols)}'))
            continue
        dmap = {c: i for i, c in enumerate(dcols)}
        smap = {c: i for i, c in enumerate(scols)}
        cols = sorted(dcols)
        try:
            dn = sorted(tuple(norm(r[dmap[c]]) for c in cols) for r in dk)
            sn = sorted(tuple(norm(r[smap[c]]) for c in cols) for r in sp)
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
    sys.exit(main(sys.argv[1], sys.argv[2]))
