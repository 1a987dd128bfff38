#!/usr/bin/env python3
"""Type-parity audit between Spark outputs and DuckDB oracles.

The driver's correctness hash is TYPE-sensitive: round 12's only red
rows had bitwise-identical VALUES but an int128 (DuckDB HUGEINT) vs
int64 column — a class `check_oracle.py`'s value compare cannot see.
This audit compares the arrow schema of every Spark result parquet in
a Verify dump against the DuckDB oracle's result types and flags any
divergence (most commonly an un-CAST `sum(...)` reaching an output
column — CLAUDE.md's float-determinism invariant).

Usage: python3 dev/check_types.py <sf_dir> <verify_out_dir>
Exit 0 iff no mismatches.
"""
import json
import os
import sys

import duckdb
import pyarrow.dataset as ds

DUCK_TO_ARROW = {
    'BIGINT': 'int64', 'INTEGER': 'int32', 'DOUBLE': 'double',
    'VARCHAR': 'string', 'BOOLEAN': 'bool', 'FLOAT': 'float',
    'SMALLINT': 'int16', 'TINYINT': 'int8',
    'DATE': 'date32[day]',
    'HUGEINT': 'HUGEINT(un-CAST sum?)',
}


def duck_to_arrow(t):
    """Map a DuckDB type string to its arrow parquet spelling, covering
    parametrized types a flat dict can't (DECIMAL(p,s), TIMESTAMP)."""
    t = str(t)
    if t in DUCK_TO_ARROW:
        return DUCK_TO_ARROW[t]
    if t.startswith('DECIMAL(') and t.endswith(')'):
        return 'decimal128(' + t[len('DECIMAL('):-1].replace(',', ', ') + ')'
    if t == 'TIMESTAMP':
        return 'timestamp[us]'
    if t == 'TIMESTAMP WITH TIME ZONE':
        return 'timestamp[us, tz=UTC]'
    return t

TABLES = ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']


def main(sf, out):
    sql = json.load(open(os.path.join(out, 'oracle_sql.json')))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f'{t}.parquet')
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    bad = 0
    for name, q in sorted(sql.items()):
        d = os.path.join(out, f'{name}.parquet')
        if not os.path.exists(d):
            continue
        spark = [(f.name, str(f.type))
                 for f in ds.dataset(d, format='parquet').schema
                 if not f.name.startswith('_')]
        rel = con.sql(q)
        duck = [(c, duck_to_arrow(t))
                for c, t in zip(rel.columns, rel.types)]
        if [x[0] for x in spark] != [x[0] for x in duck]:
            print(f'COLS {name}: spark={spark} duckdb={duck}')
            bad += 1
            continue
        for (n1, t1), (_, t2) in zip(spark, duck):
            if t1 != t2:
                print(f'TYPE {name}.{n1}: spark={t1} duckdb={t2}')
                bad += 1
    print(f'== type parity: {len(sql)} oracles, {bad} mismatches ==')
    return 1 if bad else 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
