import sys, math
sys.path.insert(0, '/root/repo')
import duckdb, pandas as pd, numpy as np
from naruhodo_spark.session import get_spark
from naruhodo_spark import queries as Q

SF = "/root/testdata/sf0.1"
spark = get_spark(master="local[32]", shuffle_partitions=32)
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

fails = []
for name, sql in Q.ORACLES.items():
    try:
        sdf = Q.QUERIES[name](spark, SF).toPandas()
        odf = con.execute(sql).df()
        cols = sorted(sdf.columns)
        assert cols == sorted(odf.columns), f"schema {cols} vs {sorted(odf.columns)}"
        sdf, odf = sdf[cols], odf[cols]
        if len(sdf) != len(odf):
            raise AssertionError(f"rows {len(sdf)} vs {len(odf)}")
        # sort rows by all columns (stringify floats rounded for sort stability)
        def key(df):
            k = df.copy()
            for c in cols:
                if k[c].dtype.kind == 'f':
                    k[c] = k[c].round(6)
            return k.sort_values(cols).reset_index(drop=True)
        a, b = key(sdf), key(odf)
        for c in cols:
            if a[c].dtype.kind == 'f' or b[c].dtype.kind == 'f':
                av = a[c].astype(float).to_numpy(); bv = b[c].astype(float).to_numpy()
                ok = np.allclose(av, bv, rtol=1e-9, atol=1e-6, equal_nan=True)
            else:
                ok = (a[c].astype(str).to_numpy() == b[c].astype(str).to_numpy()).all()
            if not ok:
                raise AssertionError(f"column {c} differs")
        print(f"OK   {name} ({len(sdf)} rows)", flush=True)
    except Exception as e:
        fails.append((name, str(e)[:200]))
        print(f"FAIL {name}: {str(e)[:200]}", flush=True)
print("\n==== SUMMARY:", len(Q.ORACLES) - len(fails), "ok,", len(fails), "fail")
for n, e in fails: print(" ", n, e)
