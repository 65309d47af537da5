#!/usr/bin/env python3
"""Local stand-in for the driver's t2 check: run each oracle SQL in DuckDB
over the sf tables, compare with the Verify parquet dump (columns sorted by
name, values compared row-by-row). Build-time tool only — the engine itself
is pure Scala/Spark."""
import duckdb, json, sys, glob
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
def norm(df):
    return df.reindex(sorted(df.columns), axis=1)
fails = []
for name in sorted(oracle):
    try:
        exp = norm(con.execute(oracle[name]).fetchdf())
        got = norm(pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f'{out}/{name}/*.parquet'))]))
        if list(exp.columns) != list(got.columns):
            fails.append((name, f'cols exp={list(exp.columns)} got={list(got.columns)}')); continue
        if len(exp) != len(got):
            fails.append((name, f'rows exp={len(exp)} got={len(got)}')); continue
        exp = exp.reset_index(drop=True); got = got.reset_index(drop=True)
        bad = None
        for c in exp.columns:
            e, g = exp[c], got[c]
            try:
                ef, gf = e.astype(float), g.astype(float)
                eq = ((ef == gf) | (ef.isna() & gf.isna())).all()
            except (ValueError, TypeError):
                eq = ((e.astype(str) == g.astype(str)) | (e.isna() & g.isna())).all()
            if not eq:
                try:
                    m = ~((e.astype(str) == g.astype(str)) | (e.isna() & g.isna()))
                    idx = int(m.idxmax()); bad = (c, idx, e.iloc[idx], g.iloc[idx])
                except Exception: bad = (c, '?', '?', '?')
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
