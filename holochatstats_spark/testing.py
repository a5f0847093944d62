"""Oracle-compare utilities shared by tests and tools/check_oracle.py.

Mirrors the driver's correctness gate: row count + sorted column names +
order-insensitive value comparison. Values are compared exactly — the
query library's contract is that both engines produce identical doubles
(identical op order + portable half-up rounding), so no tolerance is used.
"""

from __future__ import annotations

import math

import duckdb

from holochatstats_spark.tables import TABLES


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon_value(v):
    if v is None:
        return (0, "")
    if isinstance(v, bool):
        return (1, repr(int(v)))
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "nan")
        return (1, repr(v + 0.0))  # collapse -0.0
    return (1, repr(v))


def normalize(rows, cols):
    """Order-insensitive canonical form: columns sorted by name, then rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_value(r[i]) for i in order) for r in rows)


def compare_query(spark, con, query, sf_dir: str) -> list[str]:
    """Run one registered Query both ways; return a list of problems."""
    sdf = query.build(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if query.oracle is None:
        return []  # rows-only query: Spark ran without error, nothing to diff
    res = con.execute(query.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    problems: list[str] = []
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
    if sorted(scols) != sorted(dcols):
        problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
    if not problems:
        sn, dn = normalize(srows, scols), normalize(drows, dcols)
        if sn != dn:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b]
            problems.append(
                f"values differ in {len(diffs)}/{len(sn)} rows; first: "
                f"{diffs[0] if diffs else '?'}"
            )
    return problems
