#!/usr/bin/env python3
"""Local stand-in for the driver's t2 check: run each oracle SQL in DuckDB
over the sf tables, compare with the Verify parquet dump (columns sorted by
name, values compared row-by-row). Build-time tool only — the engine itself
is pure Scala/Spark.

Comparison is EXACT, mirroring the driver's hash semantics: every cell is
rendered to a canonical string with no float coercion anywhere (the round-1
local checker coerced both sides through astype(float), which masked the
Spark-vs-DuckDB DECIMAL(18,2) cast divergence the driver's hash caught).
DuckDB results are fetched via Arrow so DECIMAL stays Decimal, matching the
pyarrow-read parquet side."""
import duckdb, json, sys, glob
from decimal import Decimal
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))

def norm(df):
    return df.reindex(sorted(df.columns), axis=1)

def cell(v):
    """Canonical exact string for one value. Never routes through float
    unless the value IS a float; Decimal compared at normalized scale
    (24.10 == 24.1) because driver schema_match covers scale separately."""
    if v is None:
        return 'NULL'
    if isinstance(v, Decimal):
        return format(v.normalize(), 'f') if v != 0 else '0'
    if isinstance(v, (float, np.floating)):
        f = float(v)
        # NaN is a VALUE, distinct from SQL NULL: both sides arrive via
        # Arrow to_pylist(), where null is None and NaN is a real nan —
        # conflating them here would mask a NaN-vs-NULL engine divergence
        return 'NaN' if f != f else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, np.ndarray):
        return '[' + ','.join(cell(x) for x in v.tolist()) + ']'
    if isinstance(v, (list, tuple)):
        return '[' + ','.join(cell(x) for x in v) + ']'
    try:
        if pd.isna(v):
            return 'NULL'
    except (TypeError, ValueError):
        pass
    return str(v)

fails = []
for name in sorted(oracle):
    try:
        # Arrow end-to-end: DECIMAL stays Decimal, null stays None, NaN
        # stays nan — no pandas dtype coercion (float64 would fold null
        # int/double columns into NaN and break the NULL/NaN distinction).
        exp_tbl = con.execute(oracle[name]).arrow()
        got_tbl = pa.concat_tables(
            [pq.read_table(f) for f in sorted(glob.glob(f'{out}/{name}/*.parquet'))],
            promote_options='permissive')
        exp_cols, got_cols = sorted(exp_tbl.column_names), sorted(got_tbl.column_names)
        if exp_cols != got_cols:
            fails.append((name, f'cols exp={exp_cols} got={got_cols}')); continue
        if exp_tbl.num_rows != got_tbl.num_rows:
            fails.append((name, f'rows exp={exp_tbl.num_rows} got={got_tbl.num_rows}')); continue
        bad = None
        for c in exp_cols:
            ec = [cell(v) for v in exp_tbl.column(c).to_pylist()]
            gc = [cell(v) for v in got_tbl.column(c).to_pylist()]
            if ec != gc:
                i = next(i for i, (a, b) in enumerate(zip(ec, gc)) if a != b)
                bad = (c, i, ec[i], gc[i])
                break
        if bad: fails.append((name, f'col {bad[0]} row {bad[1]}: exp={bad[2]!r} got={bad[3]!r}'))
        else: print(f'OK    {name} ({exp_tbl.num_rows} rows)')
    except Exception as ex:
        fails.append((name, f'EXC {str(ex)[:200]}'))
nooracle = [d.split('/')[-1] for d in glob.glob(f'{out}/*')
            if '.' not in d.split('/')[-1] and d.split('/')[-1] not in oracle]
for n in sorted(nooracle):
    try:
        rows = len(pd.concat([pd.read_parquet(f) for f in glob.glob(f'{out}/{n}/*.parquet')]))
        print(f'ROWS  {n} ({rows} rows, no oracle)')
    except Exception as ex:
        print(f'ROWS? {n} read fail: {str(ex)[:100]}')
print()
for n, msg in fails: print(f'FAIL  {n}: {msg}')
print(f'\n{len(oracle)-len(fails)}/{len(oracle)} oracle matches')
sys.exit(1 if fails else 0)
