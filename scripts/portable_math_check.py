#!/usr/bin/env python3
"""DuckDB half of the PortableMath cross-engine bit-equality probe.

Usage: python3 scripts/portable_math_check.py /tmp/pm_probe
(after `sbt "runMain graft.tools.PortableMathProbe /tmp/pm_probe"`)

Re-evaluates the probe's generated SQL in DuckDB over the same inputs
Spark consumed and asserts EXACT equality (bit-level for doubles via
IEEE total comparison on the float64 values; integer equality for the
e9-quantized columns). Zero mismatches = the portable series is
engine-identical on every probed input.
"""
import sys

import duckdb


def check(con, sql_path, spark_parquet, key, cols):
    sql = open(sql_path).read()
    con.execute(f"CREATE OR REPLACE TEMP TABLE duck AS ({sql})")
    con.execute(
        "CREATE OR REPLACE TEMP TABLE spark AS "
        f"SELECT * FROM read_parquet('{spark_parquet}/*.parquet')")
    bad_total = 0
    for c in cols:
        n = con.sql(
            f"SELECT COUNT(*) FROM spark s JOIN duck d USING ({key}) "
            f"WHERE s.{c} IS DISTINCT FROM d.{c}").fetchone()[0]
        rows = con.sql(f"SELECT COUNT(*) FROM spark").fetchone()[0]
        print(f"  {c}: {rows} rows, {n} mismatches")
        bad_total += n
    return bad_total


def main(root):
    con = duckdb.connect()
    bad = 0
    print("[ln]")
    bad += check(con, f"{root}/ln.sql", f"{root}/ln", "v", ["ln_v"])
    print("[exp/logistic]")
    bad += check(con, f"{root}/exp.sql", f"{root}/exp", "x",
                 ["exp_x", "sig_e9"])
    print("PASS" if bad == 0 else f"FAIL ({bad} mismatches)")
    sys.exit(0 if bad == 0 else 1)


if __name__ == "__main__":
    main(sys.argv[1])
