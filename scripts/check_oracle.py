#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped library is pure Scala/Spark; this script just lets the builder
self-check before committing).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet result produced by graft.Verify, runs
the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
same sf tables, and compares values exactly (column names sorted, rows
sorted, exact equality — the strictest plausible version of the driver's
hash compare).
"""
import sys, os, json, math
import decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    # The real driver round-trips through pandas sort_values/factorize,
    # which CRASHES on list/dict cells (unhashable numpy.ndarray/dict).
    # Mirror that here so nested output columns fail locally too.
    if isinstance(v, (list, dict, tuple, set)):
        raise TypeError(
            f"nested value {type(v).__name__} — driver comparator would "
            "crash; serialize with array_join/to_json in the query")
    if isinstance(v, decimal.Decimal):
        # The real driver's pandas round-trip turns DuckDB decimals into
        # float64 but Spark parquet decimals into Decimal objects — the two
        # sides can NEVER hash-match. Reject here so decimal-typed output
        # columns fail locally before commit (project BIGINT cents instead).
        raise TypeError(
            "decimal-typed output column — driver comparator converts the "
            "two sides to different dtypes (float64 vs Decimal); project "
            "CAST(x*100 AS BIGINT) cents in the final SELECT on both sides")
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def fetch_sorted(rel):
    # The real driver's pandas round-trip turns DuckDB HUGEINT (the result
    # type of sum() over BIGINT) into float64 while Spark's long stays
    # int64 — the two sides can NEVER hash-match even when values are
    # equal ints here. Reject so the trap fails locally before commit
    # (CAST(sum(x) AS BIGINT) in the oracle).
    for c, t in zip(rel.columns, rel.types):
        if str(t) in ("HUGEINT", "UHUGEINT"):
            raise TypeError(
                f"column {c} is {t} — driver comparator turns it into "
                "float64 vs Spark int64; CAST(... AS BIGINT) in the oracle")
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return [cols[i] for i in order], out


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        res_dir = os.path.join(outdir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir")
            n_bad += 1
            continue
        try:
            spark_cols, spark_rows = fetch_sorted(
                con.sql(f"SELECT * FROM '{res_dir}/*.parquet'"))
            duck_cols, duck_rows = fetch_sorted(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns {spark_cols} vs {duck_cols}")
            n_bad += 1
            continue
        if spark_rows == duck_rows:
            # also check declared types roughly via duckdb describe
            n_ok += 1
            print(f"ok   {name} ({len(spark_rows)} rows)")
        else:
            n_bad += 1
            print(f"FAIL {name}: {len(spark_rows)} vs {len(duck_rows)} rows")
            for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
                if a != b:
                    print(f"     first diff row {i}:\n      spark={a}\n      duck ={b}")
                    break
            if len(spark_rows) != len(duck_rows):
                only_s = set(map(str, spark_rows[:5]))
                print(f"     spark head: {spark_rows[:2]}")
                print(f"     duck  head: {duck_rows[:2]}")
    # queries with no oracle: rows-only check
    for name in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = con.sql(f"SELECT COUNT(*) FROM '{p}/*.parquet'").fetchone()[0]
                status = "ok  " if n > 0 else "FAIL"
                print(f"{status} {name} (rows-only: {n} rows)")
                if n == 0:
                    n_bad += 1
                else:
                    n_ok += 1
            except Exception as e:
                print(f"FAIL {name} (rows-only): {e}")
                n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
