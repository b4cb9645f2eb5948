"""Unit tests for operators/linalg.py — exact distributed Gram,
integer power iteration, and broadcast projection."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_pipeline_spark.operators.linalg import (
    power_iteration_top,
    project_quantized,
    quantized_gram,
)

DIM = 6
SCALE = 1 << 12


def _random_vectors(n: int, seed: int = 11) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.uniform(-0.6, 0.6) for _ in range(DIM)] for _ in range(n)]


def _numpy_gram(vecs: list[list[float]], scale: int) -> dict[tuple[int, int], int]:
    """Brute-force exact reference: quantize half-up, integer G = n·S − m·mᵀ."""
    Q = np.floor(np.array(vecs, dtype=np.float64) * scale + 0.5).astype(object)
    n = len(vecs)
    out = {}
    for i in range(DIM):
        for j in range(i, DIM):
            s = int(sum(int(Q[r, i]) * int(Q[r, j]) for r in range(n)))
            mi = int(sum(int(Q[r, i]) for r in range(n)))
            mj = int(sum(int(Q[r, j]) for r in range(n)))
            out[(i, j)] = n * s - mi * mj
    return out


def test_quantized_gram_matches_bruteforce_and_partitioning(spark):
    vecs = _random_vectors(40)
    expected = _numpy_gram(vecs, SCALE)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    for parts in (1, 7):
        got = {
            (r["i"], r["j"]): int(r["g"])
            for r in quantized_gram(df.repartition(parts), scale=SCALE).collect()
        }
        assert got == expected, f"partitioning {parts} diverged"


def test_quantized_gram_skips_null_vectors(spark):
    vecs = _random_vectors(10)
    rows = [(i, v) for i, v in enumerate(vecs)] + [(99, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["i"], r["j"]): int(r["g"])
        for r in quantized_gram(
            df.filter(F.col("embedding").isNotNull()), scale=SCALE
        ).collect()
    }
    assert got == _numpy_gram(vecs, SCALE)


def test_power_iteration_aligns_with_numpy_eigh():
    # Build an integer symmetric matrix with a clearly dominant direction.
    rng = random.Random(3)
    u = np.array([rng.uniform(-1, 1) for _ in range(DIM)])
    u /= np.linalg.norm(u)
    M = 100000 * np.outer(u, u) + np.diag([rng.uniform(0, 1000) for _ in range(DIM)])
    M = ((M + M.T) / 2).astype(np.int64)
    rows = [(i, j, int(M[i, j])) for i in range(DIM) for j in range(i, DIM)]
    v = power_iteration_top(rows, dim=DIM, iters=12, v_scale=4096)
    vv = np.array(v, dtype=np.float64)
    cos = abs(vv @ u) / (np.linalg.norm(vv) * np.linalg.norm(u))
    assert cos > 0.99
    assert max(abs(x) for x in v) <= 4096
    first = next((x for x in v if x != 0), 0)
    assert first >= 0  # sign fix: first nonzero entry is positive


def test_power_iteration_zero_and_empty_matrices():
    assert power_iteration_top([], dim=4) == [0, 0, 0, 0]
    # all-zero matrix: start vector e_r (r = argmax over equal diag -> 0)
    zero_rows = [(i, j, 0) for i in range(4) for j in range(i, 4)]
    assert power_iteration_top(zero_rows, dim=4, v_scale=64) == [64, 0, 0, 0]


def test_power_iteration_matches_oracle_division_semantics():
    """Negative w components must renormalize identically to the DuckDB
    replay: sign split out, division on non-negative operands only."""
    rows = [(0, 0, -5), (0, 1, 3), (1, 1, -5)]
    v = power_iteration_top(rows, dim=2, iters=1, v_scale=100)
    # v0 = [100, 0] (diag tie -5 -> index 0); w = [-500, 300]
    # renorm: [-(500*100//500), 300*100//500] = [-100, 60] -> sign-fix -> [100, -60]
    assert v == [100, -60]


def test_project_quantized_matches_python(spark):
    vecs = _random_vectors(25, seed=5)
    direction = [3, -2, 5, 0, -1, 4]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: r["proj"]
        for r in project_quantized(df, direction, scale=1 << 20).collect()
    }
    for i, v in enumerate(vecs):
        q = [math.floor(x * (1 << 20) + 0.5) for x in v]
        assert got[i] == sum(a * b for a, b in zip(q, direction))


def test_project_quantized_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_random_vectors(8))],
        "vec_id long, embedding array<double>",
    )
    plan = project_quantized(df, [1] * DIM)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quantized_gram_huge_components_fall_back_exact(spark):
    """A single component large enough that q^2 wraps int64 must take
    the object-dtype fallback and still be exact (review finding:
    chunk=1 cannot bound a one-row product)."""
    vecs = [[1.0e6, 0.5], [0.0, -0.25], [2.0, 1.0]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    got = {
        (r["i"], r["j"]): int(r["g"])
        for r in quantized_gram(df, scale=1 << 12).collect()
    }
    q = [[math.floor(x * (1 << 12) + 0.5) for x in v] for v in vecs]
    n = len(vecs)
    for i in range(2):
        for j in range(i, 2):
            s = sum(q[r][i] * q[r][j] for r in range(n))
            mi = sum(q[r][i] for r in range(n))
            mj = sum(q[r][j] for r in range(n))
            assert got[(i, j)] == n * s - mi * mj


def test_quantized_gram_rejects_non_finite(spark):
    df = spark.createDataFrame(
        [(0, [1.0, float("nan")]), (1, [0.5, 0.25])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="non-finite"):
        quantized_gram(df, scale=1 << 12).collect()


def test_pc_residual_matches_python_and_is_nonnegative(spark):
    from cdc_pipeline_spark.operators.linalg import pc_residual

    vecs = _random_vectors(20, seed=9)
    direction = [7, -3, 0, 2, -5, 1]
    vv = sum(c * c for c in direction)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: r["resid"]
        for r in pc_residual(df, direction, scale=1 << 10).collect()
    }
    for i, v in enumerate(vecs):
        q = [math.floor(x * (1 << 10) + 0.5) for x in v]
        xx = sum(a * a for a in q)
        xv = sum(a * b for a, b in zip(q, direction))
        assert got[i] == vv * xx - xv * xv
        assert got[i] >= 0  # Cauchy–Schwarz


def test_pc_residual_zero_for_parallel_vector(spark):
    from cdc_pipeline_spark.operators.linalg import pc_residual

    direction = [2, -1, 3, 0, 1, -2]
    # a vector exactly parallel to the direction at the quant scale
    vec = [c / 4.0 for c in direction]
    df = spark.createDataFrame([(0, vec)], "vec_id long, embedding array<double>")
    assert pc_residual(df, direction, scale=1 << 10).first()["resid"] == 0


def test_dim_moments_match_bruteforce(spark):
    from cdc_pipeline_spark.operators.linalg import dim_moments

    vecs = _random_vectors(30, seed=11)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    n, m, s = dim_moments(df, scale=1 << 10)
    assert n == 30
    q = [[math.floor(x * (1 << 10) + 0.5) for x in v] for v in vecs]
    for d in range(len(vecs[0])):
        assert m[d] == sum(row[d] for row in q)
        assert s[d] == sum(row[d] * row[d] for row in q)


def test_zscore_outlier_topk_planted_outlier_and_invariance(spark):
    """A vector far from the cluster in every dimension must rank
    first; a constant (zero-variance) dimension must contribute 0
    instead of dividing by zero; the ranking must be invariant to
    input partitioning (the decimal-before-sum contract)."""
    from cdc_pipeline_spark.operators.linalg import zscore_outlier_topk

    base = _random_vectors(40, seed=3)
    # pin dimension 0 constant across ALL rows → zero variance
    rows = [(i, [0.25] + v[1:]) for i, v in enumerate(base)]
    rows.append((999, [0.25] + [9.0] * (len(base[0]) - 1)))  # the outlier
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = zscore_outlier_topk(df, scale=1 << 10, k=5).collect()
    assert got[0]["vec_id"] == 999
    assert got[0]["z2_sum"] > got[1]["z2_sum"]
    again = zscore_outlier_topk(df.repartition(7), scale=1 << 10, k=5).collect()
    assert [(r["vec_id"], r["z2_sum"]) for r in got] == [
        (r["vec_id"], r["z2_sum"]) for r in again
    ]


def test_zscore_outlier_topk_zero_variance_everywhere(spark):
    # all-identical corpus: every dim has zero variance → every score
    # is exactly 0.0 and the guard never divides
    from cdc_pipeline_spark.operators.linalg import zscore_outlier_topk

    df = spark.createDataFrame(
        [(i, [0.5, -0.5, 0.25]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    got = zscore_outlier_topk(df, scale=1 << 10, k=3).collect()
    assert [r["z2_sum"] for r in got] == [0.0, 0.0, 0.0]
    assert [r["vec_id"] for r in got] == [0, 1, 2]  # id tie-break


def test_dim_moments_rejects_null_elements(spark):
    # a NULL element would inflate n against m/s (count vs sum
    # disagreement) and silently skew every score — loud refusal,
    # matching the gram partials' non-finite contract (review finding)
    import pytest

    from cdc_pipeline_spark.operators.linalg import dim_moments

    df = spark.createDataFrame(
        [(1, [0.5, 0.5]), (2, [0.5, None])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="null embedding component"):
        dim_moments(df)


def test_dim_moments_rejects_ragged_vector_lengths(spark):
    """Ragged embedding lengths silently skew every z-score on the
    shorter dimensions — the moments pass fails loudly instead."""
    import pytest

    from cdc_pipeline_spark.operators.linalg import dim_moments

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="ragged"):
        dim_moments(df)
