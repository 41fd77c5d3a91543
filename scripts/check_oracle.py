#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify output parquet
per query, run the oracle SQL in DuckDB over the same sf dir, and compare
(sorted columns, row-by-row values). Usage: check_oracle.py OUTDIR SFDIR
"""
import json, math, sys, glob, os
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def canon(df):
    df = df[sorted(df.columns)]
    return df

fails, passes, skips = [], [], []
for name in sorted(oracle):
    pq = f"{outdir}/{name}"
    if not os.path.isdir(pq):
        fails.append((name, "no spark output")); continue
    try:
        got = canon(pd.read_parquet(pq))
        exp = canon(con.sql(oracle[name]).df())
    except Exception as e:
        fails.append((name, f"read/oracle error: {str(e)[:200]}")); continue
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"cols differ: spark={list(got.columns)} duck={list(exp.columns)}")); continue
    if len(got) != len(exp):
        fails.append((name, f"rowcount {len(got)} vs {len(exp)}")); continue
    bad = None
    for c in got.columns:
        g, e = got[c], exp[c]
        try:
            if str(g.dtype).startswith("datetime") or str(e.dtype).startswith("datetime"):
                g = pd.to_datetime(g).astype("datetime64[us]")
                e = pd.to_datetime(e).astype("datetime64[us]")
            if g.dtype != e.dtype:
                # dtype diff is a schema mismatch worth flagging
                bad = f"col {c} dtype {g.dtype} vs {e.dtype}"
                # still try value compare after casting
            gl, el = g.tolist(), e.tolist()
            for i, (a, b) in enumerate(zip(gl, el)):
                na = a is None or (isinstance(a, float) and math.isnan(a))
                nb = b is None or (isinstance(b, float) and math.isnan(b))
                if na and nb:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if a != b:
                        bad = f"col {c} row {i}: {a!r} != {b!r} (delta {abs(a-b)})"; break
                elif a != b:
                    bad = f"col {c} row {i}: {a!r} != {b!r}"; break
            if bad and "dtype" not in bad:
                break
        except Exception as ex:
            bad = f"col {c} compare error: {str(ex)[:150]}"; break
    if bad:
        fails.append((name, bad))
    else:
        passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"FAIL {len(fails)}:")
for n, r in fails:
    print(f"  {n}: {r}")
# queries without oracle
no_oracle = [q for q in (os.path.basename(p) for p in glob.glob(f"{outdir}/*")
             ) if q != "oracle_sql.json" and q not in oracle]
print(f"NO-ORACLE {len(no_oracle)}: {' '.join(sorted(no_oracle))}")
sys.exit(1 if fails else 0)
