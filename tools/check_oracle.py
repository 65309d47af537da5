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
        return 'NULL' if f != f else repr(f)
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
        # Arrow path keeps DECIMAL as decimal128 -> object-dtype Decimal.
        exp = norm(con.execute(oracle[name]).arrow().to_pandas())
        got = norm(pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f'{out}/{name}/*.parquet'))]))
        if list(exp.columns) != list(got.columns):
            fails.append((name, f'cols exp={list(exp.columns)} got={list(got.columns)}')); continue
        if len(exp) != len(got):
            fails.append((name, f'rows exp={len(exp)} got={len(got)}')); continue
        exp = exp.reset_index(drop=True); got = got.reset_index(drop=True)
        bad = None
        for c in exp.columns:
            ec = [cell(v) for v in exp[c].tolist()]
            gc = [cell(v) for v in got[c].tolist()]
            if ec != gc:
                i = next(i for i, (a, b) in enumerate(zip(ec, gc)) if a != b)
                bad = (c, i, ec[i], gc[i])
                break
        if bad: fails.append((name, f'col {bad[0]} row {bad[1]}: exp={bad[2]!r} got={bad[3]!r}'))
        else: print(f'OK    {name} ({len(exp)} rows)')
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
