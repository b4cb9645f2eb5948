"""Local replica of the driver's DuckDB-oracle compare.

Runs a workload query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive value multiset (columns sorted by name, rows sorted).
"""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / float-noise to a stable representation
        return round(v, 9)
    if v.__class__.__name__ == "Decimal":
        return round(float(v), 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normalized = [tuple(_norm(r[i]) for i in order) for r in rows]
    # NULLs (rollup/cube subtotals) aren't comparable to values — sort on
    # a (is_null, stringified) key; equality still compares raw tuples
    return sorted(normalized, key=lambda row: [(v is None, str(v)) for v in row])


def rows_only_check(spark, query_fn, sf_dir: str) -> int:
    """Replicate the driver's rows-only canonicalization for queries
    without an oracle: collect the result and push it through a pandas
    sort_values over every column — the exact step where the driver
    crashed in round 1 on an array<long> output column (pandas cannot
    factorize Python lists). A `.count()`-only check never materializes
    values driver-side and silently misses that class of failure.

    Returns the row count; raises (failing the test) if the output shape
    would crash the driver's canonicalizer."""
    import pandas as pd

    sdf = query_fn(spark, sf_dir)
    assert sdf.columns, "query returned no columns"
    rows = [tuple(r) for r in sdf.collect()]
    pdf = pd.DataFrame(rows, columns=sdf.columns)
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf.sort_values(by=cols, key=lambda s: s.map(lambda v: (v is None, str(v))))
        # the driver sorts without a key func — exercise hashability too
        for c in cols:
            pd.factorize(pdf[c])
    return len(rows)


def compare(spark, query_fn, oracle: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty ⇒ match)."""
    sdf = query_fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    duck_cols, duck_rows = duckdb_run(oracle, sf_dir)

    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duckdb={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duckdb={len(duck_rows)}")
    a, b = _multiset(spark_cols, spark_rows), _multiset(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        only_a = [r for r in a if r not in set(map(tuple, b))][:3]
        problems.append(f"value mismatch; first diffs={diffs} spark-only={only_a}")
    return problems
