#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare: for each query dir in
OUTDIR, run the matching SQL from oracle_sql.json against the parquet tables in
SFDIR and diff values (columns sorted by name, rows sorted, 6dp-stable).
Usage: compare_oracle.py SFDIR OUTDIR
"""
import json, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails = 0
for q in sorted(os.listdir(outdir)):
    qdir = os.path.join(outdir, q)
    if not os.path.isdir(qdir):
        continue
    spark_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
    if q not in oracle:
        print(f"{q}: NO-ORACLE rows={spark_rel.shape[0]}")
        continue
    try:
        duck_rel = con.sql(oracle[q])
        scols = sorted(spark_rel.columns)
        dcols = sorted(duck_rel.columns)
        if [c.lower() for c in scols] != [c.lower() for c in dcols]:
            print(f"{q}: SCHEMA MISMATCH spark={scols} duck={dcols}")
            fails += 1
            continue
        sdf = spark_rel.df()[scols]
        ddf = duck_rel.df()[dcols]
        svals = sorted(map(repr, sdf.itertuples(index=False, name=None)))
        dvals = sorted(map(repr, ddf.itertuples(index=False, name=None)))
        if svals == dvals:
            print(f"{q}: OK rows={len(svals)}")
        else:
            fails += 1
            diff = [(a, b) for a, b in zip(svals, dvals) if a != b][:3]
            only_s = [v for v in svals if v not in set(dvals)][:3]
            only_d = [v for v in dvals if v not in set(svals)][:3]
            print(f"{q}: VALUE MISMATCH rows spark={len(svals)} duck={len(dvals)}")
            for a, b in diff:
                print(f"   spark: {a}\n   duck : {b}")
            if only_s: print(f"   only-spark: {only_s}")
            if only_d: print(f"   only-duck : {only_d}")
    except Exception as e:
        fails += 1
        print(f"{q}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
print(f"\n{'FAIL' if fails else 'PASS'} ({fails} mismatches)")
sys.exit(1 if fails else 0)
