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
    """Fetch the oracle result THROUGH pandas (`.df()`), exactly like the
    driver does. This is load-bearing for type parity: DuckDB's pandas
    conversion coerces DECIMAL → float64 and HUGEINT (windowed integer
    sums) → float64, while the Spark side arrives as raw collected Python
    objects. Round 2's three hash-only FAILs were precisely this
    asymmetry (Spark Decimal vs oracle float; Spark bigint vs oracle
    float) — a fetchall()-based replica can never see them, and a
    symmetric-strict replica flags greens (driver-green
    alert_threshold_frame emits DECIMAL literals oracle-side)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    df = con.execute(sql).df()
    con.close()
    return list(df.columns), _pdf_rows(df)


def _pdf_rows(df):
    """Extract rows from a pandas frame as plain-Python tuples (numpy
    scalars unboxed, list/array cells tupled) so both sides normalize
    through the identical code path."""
    import numpy as np

    def _cell(v):
        if isinstance(v, np.ndarray):
            return tuple(_cell(x) for x in v.tolist())
        if isinstance(v, (list, tuple)):
            return tuple(_cell(x) for x in v)
        if hasattr(v, "item") and not isinstance(v, (str, bytes)):
            try:
                return v.item()
            except (ValueError, AttributeError):
                return v
        return v

    return [tuple(_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]


def _norm(v):
    """Driver-strict normalization. The driver's value hash is typed:
    Decimal('757703674.730000') != 757703674.73 and bigint 3 != float 3.0
    (this is exactly how the three round-2 hash-only FAILs escaped the
    round-2 local harness, which coerced Decimal→float and relied on
    Python's 3 == 3.0). Keep float-noise tolerance WITHIN a type
    (round to 9 places, exponent-normalize decimals) but never across
    types — tag each numeric family so cross-type equality is impossible."""
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        # collapse -0.0 / float-noise to a stable representation
        return ("f", round(v, 9))
    if v.__class__.__name__ == "Decimal":
        return ("d", str(v.normalize()))
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
    # Fetch the Spark side through toPandas(), like the driver: a
    # nullable bigint column becomes float64 + NaN on BOTH sides
    # (driver-green cube/rollup/lag queries depend on this), while a
    # no-null bigint stays int64 and a DecimalType stays object(Decimal)
    # — exactly the asymmetries the driver's typed hash sees.
    spark_rows = _pdf_rows(sdf.toPandas())
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
