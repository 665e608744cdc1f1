#!/usr/bin/env python3
"""Arrow-representation lint for the oracle registry (r11 verdict #3).

The driver's correctness gate hashes BOTH result sets through arrow, so a
DuckDB column that exports as decimal128(38,0) (HUGEINT — e.g. any un-cast
SUM over an integer) hash-mismatches a Spark int64 even when every value is
equal. That bug class shipped three times (r1 casts, r9-r11 q_more_like_this,
r11 q_effective_tokens) because nothing checked REPRESENTATIONS before the
driver ran. This lint closes the hole at commit time:

  - input: JSON {"sf": <dir>, "oracles": {name: sql},
                 "spark": {name: {col: <spark DataType.sql string>}}}
    (written by OracleTypeLintSpec from the ANALYZED Spark plans — no
    execution on either side)
  - every oracle is DESCRIBEd in DuckDB over views of the sf tables
    (type inference only, never executed — the whole registry lints in
    milliseconds)
  - each column's DuckDB type and Spark type collapse to an arrow
    REPRESENTATION CLASS; any class mismatch is a violation.

Classes (what the driver's arrow hash distinguishes):
  int        TINYINT/SMALLINT/INT/BIGINT           <- widths hash alike after
                                                      the driver's pandas load
  decimal    DECIMAL(p,s)/HUGEINT (arrow decimal128) — NEVER equal to int
  float      FLOAT/DOUBLE
  string, bool, date, timestamp, binary, array<class>, struct

Usage: python3 tools/lint_oracle_types.py <spec.json>
Prints one line per violation; exit 1 if any.
"""
import sys, json, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(t: str) -> str:
    """DuckDB or Spark SQL type string -> arrow representation class."""
    t = t.strip().upper()
    if t.endswith("[]"):                     # duckdb array syntax
        return f"ARRAY<{canon(t[:-2])}>"
    m = re.match(r"^ARRAY<(.*)>$", t)        # spark array syntax
    if m:
        return f"ARRAY<{canon(m.group(1))}>"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "INT", "BIGINT", "INT1",
             "INT2", "INT4", "INT8", "UTINYINT", "USMALLINT", "UINTEGER",
             "UBIGINT"):
        return "INT"
    if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL"):
        return "DECIMAL"
    if t in ("FLOAT", "REAL", "DOUBLE", "FLOAT4", "FLOAT8"):
        return "FLOAT"
    if t in ("VARCHAR", "TEXT", "STRING", "CHAR", "BPCHAR"):
        return "STRING"
    if t.startswith("TIMESTAMP"):
        return "TIMESTAMP"
    if t.startswith("STRUCT"):
        return "STRUCT"
    if t in ("BLOB", "BYTEA", "BINARY", "VARBINARY"):
        return "BINARY"
    return t                                  # BOOLEAN, DATE, ...


def main() -> int:
    spec = json.load(open(sys.argv[1]))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{spec['sf']}/{t}.parquet')")
    violations = []
    for name, sql in sorted(spec["oracles"].items()):
        spark_types = spec["spark"].get(name)
        if spark_types is None:
            violations.append(f"{name}: no Spark schema in spec")
            continue
        try:
            duck = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        except Exception as e:
            violations.append(f"{name}: oracle does not DESCRIBE: {e}")
            continue
        if set(duck) != set(spark_types):
            violations.append(
                f"{name}: column sets differ — oracle {sorted(duck)} "
                f"vs spark {sorted(spark_types)}")
            continue
        for col in sorted(duck):
            dc, sc = canon(duck[col]), canon(spark_types[col])
            if dc != sc:
                violations.append(
                    f"{name}.{col}: oracle {duck[col]} ({dc}) vs "
                    f"spark {spark_types[col]} ({sc}) — these arrow "
                    f"representations hash differently at the driver")
    for v in violations:
        print(f"VIOLATION {v}")
    print(f"{len(violations)} violations over {len(spec['oracles'])} oracles")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
