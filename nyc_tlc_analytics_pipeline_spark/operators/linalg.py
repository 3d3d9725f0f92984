"""Distributed linear algebra: power-iteration PCA over an embedding
column.

The 100 TB shape: the covariance matrix is NEVER materialized — each
power iteration computes C·v as two corpus passes fused into one scan
(per row the scalar s = (x−μ)·v, then per-dimension sums of x_i·s),
with μ and v carried as LITERAL arrays (model-sized driver state, the
k-means-centroid precedent).  k iterations = k scans; state is
dim-sized.

Cross-engine determinism follows the repo's iterative-trajectory
convention (q62 k-means, q63 PageRank): every per-iteration artifact
(μ, the raw C·v vector, the normalized v) is nudge-rounded to 9 dp in
BOTH engines, so ulp-level summation-order differences can never
compound across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from ..core.guards import collect_bounded


def _rnd9(x: float) -> float:
    return round(x + 1e-9, 9)


def _dot_lit(vec_col, values: list[float]):
    arr = F.array(*[lit(float(v)) for v in values])
    return F.aggregate(
        F.zip_with(vec_col, arr, lambda a, b: a * b),
        lit(0.0),
        lambda acc, x: acc + x,
    )


def power_iteration_top_pc(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_iter: int = 6,
    deflate: tuple = (),
):
    """Top principal component of an embedding column by power
    iteration: v ← normalize(C·v), C the (uncentered-storage, centered-
    computation) covariance.  Returns ``(loadings, eigenvalue,
    explained_share)`` — all driver-side, model-sized.

    Per iteration ONE scan computes C·v without C:
    ``C·v = Σ_rows (x−μ)·((x−μ)·v) / n``, i.e. a per-row scalar
    ``s = x·v − μ·v`` followed by per-dimension sums of ``x_i·s``
    (posexplode + groupBy pos) and the 1-row Σs.  μ, v are literal
    arrays; nothing dim²-sized exists anywhere.

    Deterministic: v₀ = uniform 1/√dim, every μ/w/v component rounded
    9 dp, and the final sign is fixed so the largest-|loading|
    component (ties → smallest index) is positive.

    ``deflate``: previously-extracted ``(eigenvalue, loadings)`` pairs —
    the iteration then runs on the deflated operator
    ``C' = C − Σ_d λ_d v_d v_dᵀ`` (``C'·v = C·v − Σ λ_d (v_d·v) v_d``),
    yielding the next component.  The correction is dim-sized driver
    arithmetic applied to the collected C·v — the SCAN is identical, so
    k components cost k×iterations scans with no new distributed code."""
    n = df.count()
    if n == 0:
        raise ValueError("empty input")
    v = F.transform(col(vec_col), lambda x: x.cast("double"))
    sums = collect_bounded(
        df.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("s"), F.sum(col("x") * col("x")).alias("s2"))
        .orderBy("i"),
        max(dim, 1),
        "power_iteration_top_pc",
        "a fixed-width vector column (dim-sized driver state)",
    )
    mu = [_rnd9(r.s / n) for r in sums]
    total_var = _rnd9(sum(r.s2 / n - m * m for r, m in zip(sums, mu)))

    vec = [1.0 / dim**0.5] * dim
    vec = [_rnd9(x) for x in vec]
    eig = 0.0
    for _ in range(n_iter):
        c0 = sum(m * x for m, x in zip(mu, vec))
        s = (_dot_lit(v, vec) - lit(c0)).alias("s")
        parts = collect_bounded(
            df.select(s, F.posexplode(v).alias("i", "x"))
            .groupBy("i")
            .agg(
                F.sum(col("x") * col("s")).alias("xs"),
                F.sum("s").alias("ss"),
            )
            .orderBy("i"),
            max(dim, 1),
            "power_iteration_top_pc",
            "a fixed-width vector column (dim-sized driver state)",
        )
        defl = [0.0] * dim
        for lam, vd in deflate:
            dot_d = sum(a * b for a, b in zip(vd, vec))
            for i in range(dim):
                defl[i] += lam * dot_d * vd[i]
        w = [
            _rnd9(r.xs / n - mu[i] * (r.ss / n) - defl[i])
            for i, r in enumerate(parts)
        ]
        nrm = sum(x * x for x in w) ** 0.5
        if nrm == 0:
            break
        eig = _rnd9(nrm)
        vec = [_rnd9(x / nrm) for x in w]
    # deterministic sign: largest-|loading| component positive (plain
    # negation — already-rounded values must NOT be re-nudge-rounded,
    # which would shift exact 9-dp values by the 1e-9 nudge)
    j = max(range(dim), key=lambda i: (abs(vec[i]), -i))
    if vec[j] < 0:
        vec = [-x for x in vec]
    share = _rnd9(eig / total_var) if total_var else 0.0
    return vec, eig, share
