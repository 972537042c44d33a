import importlib.util, sys, time
spec = importlib.util.spec_from_file_location('__spark_entry__', '/root/repo/__spark_entry__.py')
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master('local[8]').appName('driver-sim')
         .config('spark.ui.enabled','false').getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
df = mod.entry(spark); print('entry rows:', len(df.collect()), flush=True)
import duckdb
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")
qs, osql = mod.queries(), mod.oracle_sql()
bad = []
t0=time.time()
for name in qs:  # registry order: window first
    t1=time.time()
    try:
        pdf = qs[name](spark, '/root/testdata/sf0.01').toPandas()
    except Exception as e:
        print(name, 'ERROR', repr(e)[:200], flush=True); bad.append(name); continue
    if name not in osql:
        print(f'{name} rows-only: {len(pdf)} [{time.time()-t1:.1f}s]', flush=True); continue
    try:
        d = con.execute(osql[name]); dcols=[c[0] for c in d.description]; drows=d.fetchall()
    except Exception as e:
        print(name, 'ORACLE-ERROR', repr(e)[:200], flush=True); bad.append(name); continue
    scols=list(pdf.columns)
    sidx=sorted(range(len(scols)), key=lambda i:scols[i]); didx=sorted(range(len(dcols)), key=lambda i:dcols[i])
    sn=sorted(tuple(repr(r[i]) for i in sidx) for r in pdf.itertuples(index=False,name=None))
    dn=sorted(tuple(repr(r[i]) for i in didx) for r in drows)
    ok = sn==dn and sorted(scols)==sorted(dcols)
    if not ok: bad.append(name)
    print(f'{name} match: {ok} {len(sn)} rows [{time.time()-t1:.1f}s]', flush=True)
print('TOTAL', time.time()-t0, 'BAD:', bad, flush=True)
sys.exit(1 if bad else 0)
