import duckdb, json, sys, glob, math
import pandas as pd
out = sys.argv[1] if len(sys.argv)>1 else '/tmp/verify_out'
d = sys.argv[2] if len(sys.argv)>2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['lineitem','orders','customer','documents','embeddings','events','nation','part','region','supplier']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
sqls = json.load(open(f'{out}/oracle_sql.json'))
names = sorted([p.split('/')[-1] for p in glob.glob(f'{out}/*') if not p.endswith('.json')])
ok = fail = 0
for name in names:
    try:
        spark_df = pd.read_parquet(f'{out}/{name}')
    except Exception as e:
        print(f'{name}: SPARK-READ-FAIL {e}'); fail+=1; continue
    if name not in sqls:
        print(f'{name}: rows-only ({len(spark_df)} rows)'); continue
    try:
        ora = con.execute(sqls[name]).df()
    except Exception as e:
        print(f'{name}: ORACLE-FAIL {str(e)[:200]}'); fail+=1; continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = ora.reindex(sorted(ora.columns), axis=1)
    if list(a.columns) != list(b.columns):
        print(f'{name}: COLS-MISMATCH spark={list(a.columns)} oracle={list(b.columns)}'); fail+=1; continue
    a = a.sort_values(list(a.columns)).reset_index(drop=True)
    b = b.sort_values(list(b.columns)).reset_index(drop=True)
    if len(a) != len(b):
        print(f'{name}: ROWS-MISMATCH spark={len(a)} oracle={len(b)}'); fail+=1; continue
    mismatch = None
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind in 'fc' or bv.dtype.kind in 'fc':
                if not ((av.astype(float) - bv.astype(float)).abs() < 1e-9).all():
                    mismatch = c; break
            else:
                if not (av.astype(str) == bv.astype(str)).all():
                    mismatch = c; break
        except Exception as e:
            mismatch = f'{c} ({e})'; break
    if mismatch:
        print(f'{name}: VALUE-MISMATCH col={mismatch}')
        merged = a.compare(b) if a.shape==b.shape else None
        try: print(merged.head(5))
        except Exception: pass
        fail+=1
    else:
        print(f'{name}: MATCH ({len(a)} rows)'); ok+=1
print(f'== {ok} match, {fail} fail, {len(names)} total')
