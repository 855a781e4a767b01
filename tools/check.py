#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py /tmp/vout /root/testdata/sf0.01 [query ...]

Reads oracle_sql.json from the verify output dir, registers the sf
tables as DuckDB views, runs each oracle, loads the corresponding Spark
parquet result, canonicalizes both (columns sorted by name, rows sorted
by all columns), and compares cell-by-cell.
"""
import json, math, sys
import duckdb

def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [colnames[i] for i in order], out

def cell_eq(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b and math.copysign(1, a) == math.copysign(1, b)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(cell_eq(x, y) for x, y in zip(a, b))
    return a == b

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    npass = nfail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            scols, srows = spark_rel.columns, spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            nfail += 1
            continue
        try:
            rel = con.sql(oracles[name])
            ocols, orows = rel.columns, rel.fetchall()
            otypes = [str(t) for t in rel.types]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            nfail += 1
            continue
        # Round 6 lesson: the driver's hash canonicalization distinguishes
        # DuckDB HUGEINT (what an uncast SUM() returns) from BIGINT even
        # when every value is equal — 7 queries failed hash-only on this.
        # Flag it locally so the oracle gets a CAST(... AS BIGINT).
        wide = [c for c, t in zip(ocols, otypes) if "HUGEINT" in t.upper()]
        if wide:
            print(f"FAIL {name}: oracle columns {wide} are HUGEINT "
                  f"(uncast SUM?) — driver hash will mismatch; CAST AS BIGINT")
            nfail += 1
            continue
        sc, sr = canon(srows, scols)
        oc, orr = canon(orows, ocols)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            nfail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL {name}: rowcount spark={len(sr)} oracle={len(orr)}")
            nfail += 1
            continue
        bad = None
        for i, (r1, r2) in enumerate(zip(sr, orr)):
            if not all(cell_eq(a, b) for a, b in zip(r1, r2)):
                bad = (i, r1, r2)
                break
        if bad:
            i, r1, r2 = bad
            print(f"FAIL {name}: row {i} differs\n  cols : {sc}\n  spark: {r1}\n  oracle: {r2}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            npass += 1
    print(f"\n{npass} passed, {nfail} failed")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
