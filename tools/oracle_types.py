#!/usr/bin/env python3
"""Type-pinning sweep over the registered oracles (r16 VERDICT item 2).

The r16 root cause for the four driver-red queries was an oracle OUTPUT
TYPE the value-level checks structurally cannot see: DuckDB `sum()` over
integers returns HUGEINT, the driver's hash is type-sensitive, and Spark
emits int64 — so every row hashed differently while rows/schema passed.

This script runs `DESCRIBE <sql>` for every oracle against views over a
small scale-factor directory and reports any output column whose DuckDB
type is HUGEINT / UHUGEINT / DECIMAL — types a final select must pin away
with an explicit CAST. OraclePortabilitySpec shells out to it, so an
un-cast `sum(c) AS n` fails `sbt test` instead of failing two rounds
later in a driver whose DuckDB version we cannot see.

Usage: python3 tools/oracle_types.py <sfDir> <oracle_sql.json>
Prints one line per offender: "<query>\t<column>\t<type>". Exit 1 if any.
"""
import json
import sys

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")

# Oracles whose Spark side deliberately emits a matching DecimalType may
# be listed here with the exact (query, column) pair. Empty by design:
# PlanGuardSpec bans fractional-DECIMAL Spark schemas corpus-wide.
EXEMPT = set()


def main(sf_dir: str, oracle_json: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(oracle_json))
    offenders = []
    for name in sorted(oracles):
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:  # noqa: BLE001 - report, don't mask
            offenders.append((name, "<describe-failed>", str(e)[:120]))
            continue
        for col, typ, *_ in desc:
            if any(typ.upper().startswith(b) for b in BANNED) \
                    and (name, col) not in EXEMPT:
                offenders.append((name, col, typ))
    for name, col, typ in offenders:
        print(f"{name}\t{col}\t{typ}")
    return 1 if offenders else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
