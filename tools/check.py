#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [queryName...]

Mimics the driver: for each query result parquet written by graft.Verify,
run the matching oracle SQL from oracle_sql.json in DuckDB over views named
after the fixture tables, then compare rows/schema/values (worst case:
order-sensitive, column-name-sorted).
"""
import sys, json, os, math, decimal, datetime
import duckdb
import pyarrow.dataset as pads

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = n_noracle = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        # Read the Spark result the way the driver harness does — pyarrow,
        # NOT through DuckDB. The distinction matters: DuckDB coerces
        # DECIMAL to float64 on fetch while pyarrow yields Decimal objects,
        # so a decimal column that only LOOKS equal numerically (2547.40 vs
        # 2547.4) passes a DuckDB-read compare but fails the driver's
        # representation-level hash (the r3 fn_cast lesson).
        spark_df = pads.dataset(
            os.path.join(out_dir, name), format="parquet").to_table().to_pandas()
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(spark_df)} rows")
            continue
        try:
            ora_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-oracle-sql] {name}: {str(e).splitlines()[0][:160]}")
            continue
        s = spark_df[sorted(spark_df.columns)]
        o = ora_df[sorted(ora_df.columns)]
        if list(s.columns) != list(o.columns):
            n_fail += 1
            print(f"  [FAIL-cols] {name}: spark={list(s.columns)} oracle={list(o.columns)}")
            continue
        if len(s) != len(o):
            n_fail += 1
            print(f"  [FAIL-rows] {name}: spark={len(s)} oracle={len(o)}")
            continue
        bad = None
        bad_kind = "val"
        for c in s.columns:
            sv, ov = list(s[c]), list(o[c])
            for i, (a, b) in enumerate(zip(sv, ov)):
                if a is None and b is None:
                    continue
                try:
                    # Decimal-vs-float across readers hashes differently at
                    # the driver even when numerically equal — hard-fail,
                    # tagged as a TYPE mismatch (the values may print equal).
                    if isinstance(a, decimal.Decimal) != isinstance(b, decimal.Decimal):
                        bad = (c, i, a, b); bad_kind = "type"; break
                    # pyarrow yields datetime.date for DATE columns while
                    # DuckDB fetchdf yields midnight datetime64 — the driver
                    # treats these as equal (fn_datetime is hash-green), so
                    # coerce date -> midnight datetime before comparing.
                    if type(a) is datetime.date:
                        a = datetime.datetime.combine(a, datetime.time())
                    if type(b) is datetime.date:
                        b = datetime.datetime.combine(b, datetime.time())
                    if isinstance(a, float) or isinstance(b, float):
                        an = a is None or (isinstance(a, float) and math.isnan(a))
                        bn = b is None or (isinstance(b, float) and math.isnan(b))
                        if an and bn:
                            continue
                        if an != bn or float(a) != float(b):
                            bad = (c, i, a, b); break
                    elif str(a) != str(b):
                        bad = (c, i, a, b); break
                except Exception:
                    bad = (c, i, a, b); break
            if bad:
                break
        if bad:
            n_fail += 1
            c, i, a, b = bad
            print(f"  [FAIL-{bad_kind}] {name}: col={c} row={i} "
                  f"spark={a!r} ({type(a).__name__}) oracle={b!r} ({type(b).__name__})")
        else:
            n_pass += 1
            print(f"  [PASS] {name}: {len(s)} rows, {len(s.columns)} cols")
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
