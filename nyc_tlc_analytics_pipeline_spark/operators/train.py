"""Distributed classifier TRAINING: full-batch gradient descent for the
binary logistic quality filter (the trainable face of q79's frozen
filter-tier inference).

The 100 TB shape is the k-means / power-iteration posture
(``cluster.kmeans_fit``, ``linalg.power_iteration_top_pc``): the MODEL is
tiny (|features|+1 doubles) while the DATA is huge, so each GD iteration
is ONE corpus scan producing a (|features|+2)-sized aggregate — the
per-feature gradient components, the bias gradient, and the log-loss —
all map-side partial-aggregated before the single-row reduce.  Driver
state is the weight vector only; iterations = scans; nothing the size of
the corpus ever reaches the driver (``collect_bounded`` enforces the
1-row contract).

Cross-engine determinism follows the repo's iterative-trajectory
convention (q62 / q126): per-row sigmoids, the gradient/loss aggregates,
and the updated weights are ALL nudge-rounded to 6 dp in both engines,
so ulp-level exp()/summation-order differences can never compound across
iterations and the full training trajectory is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

from ..core.guards import collect_bounded
from ..functions.scalar import rnd


def _rnd6(x: float) -> float:
    return round(x + 1e-9, 6)


#: probability clamp inside the log-loss — a 6-dp-rounded sigmoid can be
#: exactly 0.0 or 1.0, and ln(0) would poison the loss aggregate.  A
#: POWER OF TWO on purpose: 2^-20 and 1−2^-20 are exactly representable
#: doubles with finite decimal expansions, so Spark, Python and the
#: DuckDB oracle all hold bit-identical clamp bounds (a 1e-6 literal
#: would differ by ulps between engines, and near the clamp boundary
#: ln(1−p) amplifies a 1-ulp bound difference ~10^6×, far past the
#: nudge margin).
_P_FLOOR = 2.0**-20


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 4,
    lr: float = 2.0,
    init: tuple[list[float], float] | None = None,
) -> list[dict]:
    """Full-batch GD for binary logistic regression over a feature frame.

    Per iteration ONE scan computes, with the current weights carried as
    LITERALS:

    * per row: ``p = rnd6(sigmoid(w·x + b))``
    * aggregate: ``g_j = rnd6(avg((p − y)·x_j))``, ``g_b = rnd6(avg(p − y))``
      and ``loss = rnd6(avg(−y·ln(p̂) − (1−y)·ln(1−p̂)))`` with ``p̂``
      clamped to ``[2⁻²⁰, 1−2⁻²⁰]`` (``_P_FLOOR`` — a power of two, so
      both engines hold the identical clamp constant)
    * update (driver-side, model-sized): ``w_j ← rnd6(w_j − lr·g_j)``.

    Features should already be rounded (6 dp) map-side so the per-row z
    is cross-engine identical.  Returns the trajectory: one dict per
    iteration ``{step, weights, bias, loss}`` where ``loss`` is measured
    at that iteration's PRE-update parameters (it rides the same scan as
    the gradient — no extra pass).
    """
    nf = len(feature_cols)
    if init is None:
        w, b = [0.0] * nf, 0.0
    else:
        w, b = list(init[0]), float(init[1])
    y = col(label_col).cast("double")
    traj: list[dict] = []
    for step in range(1, iters + 1):
        z = lit(float(b))
        for j, fc in enumerate(feature_cols):
            z = z + lit(float(w[j])) * col(fc).cast("double")
        p = rnd(lit(1.0) / (lit(1.0) + F.exp(-z)), 6)
        pc = F.greatest(F.least(p, lit(1.0 - _P_FLOOR)), lit(_P_FLOOR))
        aggs = [
            rnd(F.avg((p - y) * col(fc).cast("double")), 6).alias(f"g{j}")
            for j, fc in enumerate(feature_cols)
        ]
        aggs.append(rnd(F.avg(p - y), 6).alias("gb"))
        aggs.append(
            rnd(
                F.avg(-(y * F.log(pc) + (lit(1.0) - y) * F.log(lit(1.0) - pc))),
                6,
            ).alias("loss")
        )
        row = collect_bounded(
            df.agg(*aggs),
            1,
            "logreg_train",
            "a global aggregate (model-sized 1-row gradient frame)",
        )[0]
        w = [_rnd6(w[j] - lr * row[f"g{j}"]) for j in range(nf)]
        b = _rnd6(b - lr * row["gb"])
        traj.append(
            {"step": step, "weights": list(w), "bias": b, "loss": float(row["loss"])}
        )
    return traj


def trajectory_df(spark, traj: list[dict]) -> DataFrame:
    """Model-sized trajectory as a DataFrame: one row per GD step with
    the post-update weights and the pre-update loss."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    nf = len(traj[0]["weights"]) if traj else 0
    schema = StructType(
        [StructField("step", LongType())]
        + [StructField(f"w{j + 1}", DoubleType()) for j in range(nf)]
        + [StructField("bias", DoubleType()), StructField("loss", DoubleType())]
    )
    rows = [
        tuple([t["step"]] + [float(x) for x in t["weights"]] + [t["bias"], t["loss"]])
        for t in traj
    ]
    return spark.createDataFrame(rows, schema).orderBy("step")
