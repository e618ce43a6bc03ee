#!/usr/bin/env python3
"""Driver-style oracle compare: run each oracle_sql.json query in DuckDB over
the sf-dir parquet tables and diff against the Spark result parquet written by
graft.Verify. Columns are sorted by name before value-hashing, mirroring the
grading driver. Usage: compare_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fail = 0
for q in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, q)
    if not os.path.isdir(qdir):
        continue
    spark_df = con.execute(
        f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
    if q not in oracle:
        print(f"{q:35s} no_oracle rows={len(spark_df)}")
        continue
    try:
        ora_df = con.execute(oracle[q]).fetchdf()
    except Exception as e:
        print(f"{q:35s} ORACLE SQL ERROR: {e}")
        fail += 1
        continue
    rows = len(spark_df) == len(ora_df)
    s_cols, o_cols = sorted(spark_df.columns), sorted(ora_df.columns)
    schema = s_cols == o_cols
    if rows and schema:
        # numeric columns compare with an absolute tolerance (round-then-
        # stringify produced spurious FAILs on float-repr edge cases);
        # everything else compares as strings. A per-column dtype mismatch
        # (float vs non-numeric strings) is itself a FAIL, not a crash.
        import numpy as np
        match = True
        for c in s_cols:
            sv, ov = spark_df[c], ora_df[c]
            if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
                try:
                    col_ok = bool(np.isclose(sv.astype(float).values, ov.astype(float).values,
                                             rtol=0.0, atol=1e-9, equal_nan=True).all())
                except (ValueError, TypeError):
                    col_ok = False
            else:
                col_ok = sv.astype(str).values.tolist() == ov.astype(str).values.tolist()
            if not col_ok:
                match = False
        a = spark_df[s_cols].astype(str).values.tolist()
        b = ora_df[o_cols].astype(str).values.tolist()
    else:
        match = False
    status = "OK " if (rows and schema and match) else "FAIL"
    if status == "FAIL":
        fail += 1
        print(f"{q:35s} {status} rows={len(spark_df)}/{len(ora_df)} schema={schema} cols={s_cols} vs {o_cols}")
        if rows and schema:
            import numpy as np
            shown = 0
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print(f"   row {i}: spark={x} oracle={y}")
                    shown += 1
                    if shown > 3:
                        break
            if shown == 0:
                # a numeric column can fail only beyond the 1e-9 tolerance while
                # its string forms compare equal — print the actual deltas
                for c in s_cols:
                    sv, ov = spark_df[c], ora_df[c]
                    if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
                        try:
                            d = np.abs(sv.astype(float).values - ov.astype(float).values)
                            bad = np.where(~np.isclose(sv.astype(float).values, ov.astype(float).values,
                                                       rtol=0.0, atol=1e-9, equal_nan=True))[0]
                            for i in bad[:4]:
                                print(f"   col {c} row {i}: spark={sv.iloc[i]} oracle={ov.iloc[i]} |delta|={d[i]}")
                        except (ValueError, TypeError):
                            print(f"   col {c}: non-numeric values prevented delta print")
    else:
        print(f"{q:35s} {status} rows={len(spark_df)}")
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
