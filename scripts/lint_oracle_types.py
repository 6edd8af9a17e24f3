#!/usr/bin/env python3
"""Oracle output-type lint (VERDICT r9 item 2).

The driver's hash canonicalization diverges from Spark's on DuckDB
extended numeric types: `sum(INTEGER/BIGINT)` in DuckDB yields HUGEINT
(int128), which hash-mismatches even when every value compares exactly
(the q160/q163 round-9 failure class). This lint runs every oracle SQL
in SparkEntry.oracleSql against the sf tables and asserts each output
column's DuckDB type is in the portable allow-set. Run it whenever an
oracle is added or edited:

    python3 scripts/lint_oracle_types.py /root/testdata/sf0.001 <verifyOutDir>

(<verifyOutDir> only needs oracle_sql.json — pass any directory written
by `graft.Verify`.) Exit 1 on any violation.
"""
import json, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types whose parquet round-trip + hash canonicalization is identical
# between Spark and DuckDB. Notably ABSENT: HUGEINT/UHUGEINT (int128 —
# no Spark equivalent), DECIMAL (scale canonicalization differs),
# TINYINT/SMALLINT/UTINYINT/... (Spark emits int/bigint; dtype coerce
# can mask sign issues), FLOAT (binary32 vs the double hash path).
ALLOWED = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "DATE",
           "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "BOOLEAN"}


def base_type(t):
    s = str(t)
    # DOUBLE[] / VARCHAR[] list payloads are allowed iff the element is
    if s.endswith("[]"):
        return base_type(s[:-2])
    return s


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    bad = []
    for name in sorted(oracles):
        try:
            rel = con.sql(oracles[name])
            cols = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:
            bad.append((name, "*", f"ORACLE-SQL-ERROR {e}"))
            continue
        for c, t in cols:
            if base_type(t) not in ALLOWED:
                bad.append((name, c, t))
    if bad:
        for name, c, t in bad:
            print(f"BAD-TYPE  {name}.{c} :: {t}")
        print(f"-- {len(bad)} violation(s) across "
              f"{len(set(n for n, _, _ in bad))} key(s)")
        sys.exit(1)
    print(f"-- all {len(oracles)} oracles emit only {sorted(ALLOWED)}")


main()
