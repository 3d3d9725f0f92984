"""Connected components over near-duplicate pair graphs → dedup clusters.

A dedup pipeline's pair finders (``dedup.jaccard_pairs``, MinHash/SimHash/
embedding LSH) emit EDGES; what the pipeline actually needs is the
transitive closure — "these 7 docs are all one duplicate group, keep the
canonical one".  The reference has no graph operator (its dedup is
row-level INSERT OR IGNORE, src/transformations/standardize.py:24), so
this is a beyond-reference operator in the LLM-data-pipeline family.

Design for 100 TB:

- **Alternating large-star / small-star contraction** (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14) — the
  shuffle-native CC algorithm: each round is two groupBy/join passes over
  the edge list, and the edge graph contracts toward component-min stars
  in O(log² n) rounds WORST case (naive min-label propagation needs
  O(graph diameter) rounds — a 10⁶-long chain of near-dup docs would need
  10⁶ shuffles; here ~40).
- Each round ends in ``localCheckpoint`` — iterative self-referencing
  plans otherwise grow Catalyst lineage exponentially and re-execute the
  whole history every round.
- Convergence is detected from a one-row aggregate (edge count + an
  order-independent ``bit_xor(xxhash64)`` checksum — XOR, not SUM, which
  would long-overflow under ANSI mode on big edge sets), not a full plan
  comparison.
- No driver-side data: edges never leave the cluster; the driver sees
  only the per-round checksum row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit


def _canonical(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct undirected edges as (u, v), self-loops dropped."""
    return (
        edges.select(col(src).alias("u"), col(dst).alias("v"))
        .filter(col("u") != col("v"))
        .distinct()
    )


def large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node's strictly-larger neighbors are
    re-linked to the minimum of its neighborhood (including itself).
    Output edges {(v, m(u)) : v ∈ Γ(u), v > u}, m(u) = min(Γ(u) ∪ {u})."""
    nbrs = edges.union(edges.select(col("v").alias("u"), col("u").alias("v")))
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
    m = F.least(col("u"), col("mn"))
    return (
        nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").alias("u"), m.alias("v"))
        .filter(col("u") != col("v"))
        .distinct()
    )


def small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: direct each edge from its larger endpoint,
    then link every smaller neighbor AND the center to the neighborhood
    minimum.  Output {(v, m) : v ∈ Γ⁻(u) ∪ {u}, v ≠ m}."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    to_min = directed.join(mins, "u").select(col("v").alias("u"), col("m").alias("v"))
    center = mins.select("u", col("m").alias("v"))
    return to_min.union(center).filter(col("u") != col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``, where
    component = the smallest node id reachable from it.  Alternates
    large-star/small-star until the edge set is stable; at the fixpoint
    every non-root node carries exactly one edge to its component root.

    ``max_iter=25`` covers > 2²⁵-node worst-case chains (rounds needed
    grow with log² of the longest path); real near-dup graphs converge in
    2–4 rounds.  Raises if the graph hasn't converged — returning a wrong
    partial clustering silently would corrupt the dedup downstream."""
    edges = _canonical(pairs, src, dst).localCheckpoint()
    prev: tuple | None = None
    for _ in range(max_iter):
        edges = small_star(large_star(edges)).localCheckpoint()
        n, chk = edges.agg(
            F.count("*"), F.expr("bit_xor(xxhash64(u, v))")
        ).head()
        if (n, chk) == prev:
            break
        prev = (n, chk)
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # converged star graph: every non-root u has edges only to its root;
    # roots never appear on the left (they are each component's minimum)
    assign = edges.groupBy("u").agg(F.min("v").alias("component"))
    roots = assign.select(col("component").alias("u"), col("component")).distinct()
    return assign.union(roots).select(col("u").alias("node"), "component")


def cluster_assignments(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Every row of ``df`` mapped to its duplicate-cluster id: the
    component minimum for paired docs, itself for singletons.  Columns:
    (<id_col>, cluster_id, cluster_size, is_canonical) — is_canonical
    marks the one row per cluster a keep-canonical dedup retains."""
    cc = connected_components(pairs, src, dst)
    out = (
        df.select(col(id_col))
        .join(cc, df[id_col] == cc["node"], "left")
        .select(
            col(id_col),
            F.coalesce(col("component"), col(id_col)).alias("cluster_id"),
        )
    )
    w = Window.partitionBy("cluster_id")
    return out.select(
        id_col,
        "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        (col(id_col) == col("cluster_id")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# Weighted PageRank (fixed-iteration, cross-engine deterministic)
# ---------------------------------------------------------------------------

def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iters: int = 3,
    damping: float = 0.85,
    round_decimals: int = 6,
) -> DataFrame:
    """Weighted PageRank with dangling-mass redistribution, run for a
    fixed ``iters`` Lloyd-style sweeps.

    Scale shape: ranks live as a node-keyed DataFrame (never collected);
    each iteration joins edges⋈ranks on src (the one fact-sized shuffle
    — at cluster scale pre-partition edges by src once and every
    iteration reuses that partitioning), aggregates contributions by
    dst, and folds in the teleport + dangling terms via a broadcast
    1-row aggregate — no driver-side data motion at all.  The node
    count is the single scalar the driver learns (needed as a literal
    in the teleport term).  For tens of iterations, checkpoint ranks
    every ~10 sweeps to cut lineage; at 3 iterations the plan stays
    shallow.

    Cross-engine determinism: ranks are rounded (nudged, 6 dp) after
    every sweep — same trajectory-freezing trick as operators/cluster.py
    — so an external SQL engine replicates the exact values."""
    from ..functions.scalar import rnd

    e = edges.select(
        col(src).alias("e_src"), col(dst).alias("e_dst"), col(weight).alias("e_w")
    )
    # materialize the edge list once: it is referenced by nodes.count(),
    # by outw/e_norm, and by the dangling term of EVERY sweep — without
    # this the caller's (often fact-sized) edge-building join re-executes
    # per reference.  The aggregated edge list is |V|²-bounded, far
    # smaller than the facts it came from.
    e = e.localCheckpoint(eager=False)
    nodes = (
        e.select(col("e_src").alias("node"))
        .union(e.select(col("e_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    outw = e.groupBy("e_src").agg(F.sum("e_w").alias("ow")).localCheckpoint(
        eager=False
    )
    # weight-normalized edges: built once, reused every sweep
    e_norm = e.join(outw, "e_src").select(
        "e_src", "e_dst", (col("e_w") / col("ow")).alias("share")
    ).localCheckpoint(eager=False)
    ranks = nodes.select(
        "node", rnd(lit(1.0) / lit(float(n_nodes)), round_decimals).alias("rank")
    )
    for _ in range(iters):
        contrib = (
            e_norm.join(ranks, e_norm["e_src"] == ranks["node"])
            .select(col("e_dst").alias("node"), (col("rank") * col("share")).alias("x"))
            .groupBy("node")
            .agg(F.sum("x").alias("c"))
        )
        dangling = (
            ranks.join(outw, ranks["node"] == outw["e_src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                rnd(
                    lit((1.0 - damping) / float(n_nodes))
                    + lit(damping)
                    * (F.coalesce(col("c"), lit(0.0)) + col("dm") / lit(float(n_nodes))),
                    round_decimals,
                ).alias("rank"),
            )
        )
    return ranks


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iters: int = 4,
) -> DataFrame:
    """Synchronous weighted label propagation (community detection —
    Raghavan et al. 2007): every node starts labeled with itself; each
    sweep, a node adopts the label with the greatest total incident
    edge weight among its neighbors, ties broken by the SMALLEST label
    (deterministic, no RNG — integer weights + string labels mean the
    whole trajectory is FP-free and oracle-checkable without rounding).

    Scale shape per sweep: one groupBy (node, label) on the undirected
    edge list + a max-equality join (no window); the labels frame
    localCheckpoints each sweep so lineage stays O(1) like the CC and
    PageRank loops.  Returns (node, label) after ``iters`` sweeps."""
    und = (
        edges.select(col(src).alias("e_src"), col(dst).alias("e_dst"), col(weight).alias("w"))
        .unionByName(
            edges.select(
                col(dst).alias("e_src"), col(src).alias("e_dst"), col(weight).alias("w")
            )
        )
        .groupBy("e_src", "e_dst")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    nodes = und.select(col("e_src").alias("node")).distinct()
    labels = nodes.select("node", col("node").alias("label"))
    for _ in range(iters):
        scores = (
            und.join(labels, und["e_dst"] == labels["node"])
            .groupBy(col("e_src").alias("nd"), "label")
            .agg(F.sum("w").alias("s"))
        )
        best = scores.groupBy("nd").agg(F.max("s").alias("ms"))
        labels = (
            scores.join(best, "nd")
            .filter(col("s") == col("ms"))
            .groupBy("nd")
            .agg(F.min("label").alias("label"))
            .select(col("nd").alias("node"), "label")
            .localCheckpoint(eager=False)
        )
    return labels


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Global triangle count + per-node triangle participation over an
    undirected simple graph — the standard cohesion diagnostic for a
    near-dup pair graph (a cluster whose members all pair with each
    other is a true duplicate group; a star around one hub is usually a
    boilerplate template match).

    Compute-optimal MapReduce shape (Suri & Vassilvitskii's node-
    iterator++, WWW'11): orient every edge from the lower-(degree, id)
    endpoint to the higher one — every triangle then has exactly ONE
    wedge whose two oriented edges leave its smallest vertex, so the
    wedge join emits each triangle once, and the number of wedges any
    single vertex generates is bounded by its ORIENTED out-degree
    (≤ √|E| on any graph), which caps the hot-key blowup a raw
    adjacency self-join suffers on hubs.  Three shuffles total: degree
    aggregate, wedge self-join on the pivot, closing-edge equi-join.

    Returns one row per node with ``n_triangles`` (triangles the node
    participates in); the global count is ``sum/3``.

    The canonical edge frame is PINNED (core.pins lazy persist, guide
    §5): five plan branches read it — the degree union reads it twice,
    the orientation join once, the closing-edge side once, and the
    wedge join twice via ``ranked`` — and ``edges`` is typically the
    OUTPUT of a whole near-dup pipeline (minhash chain + verify joins),
    so without the pin that entire upstream lineage re-executed per
    branch (q151 measured 51 s at sf0.001 — ~400 stages — from exactly
    this).  The pinned frame is |E| rows of two longs; the degree frame
    (|V| rows, three consumers: two orientation joins + the final
    report join) is pinned for the same reason."""
    from ..core.pins import pin

    e = pin(
        edges.select(
            F.least(col(src), col(dst)).alias("u"),
            F.greatest(col(src), col(dst)).alias("v"),
        )
        .filter(col("u") < col("v"))
        .distinct()
    )
    deg = pin(
        e.selectExpr("u AS node").unionAll(e.selectExpr("v AS node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # orient: lower (deg, node) → higher (deg, node); total order, so
    # each undirected edge gets exactly one direction
    ranked = (
        e.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
        .select(
            F.when(
                (col("du") < col("dv"))
                | ((col("du") == col("dv")) & (col("u") < col("v"))),
                F.struct(col("u").alias("lo"), col("v").alias("hi")),
            )
            .otherwise(F.struct(col("v").alias("lo"), col("u").alias("hi")))
            .alias("o")
        )
        .select(col("o.lo").alias("lo"), col("o.hi").alias("hi"))
    )
    w1 = ranked.select(col("lo").alias("pivot"), col("hi").alias("a"))
    w2 = ranked.select(col("lo").alias("pivot"), col("hi").alias("b"))
    wedges = w1.join(w2, "pivot").filter(col("a") < col("b"))
    closing = e.selectExpr("u AS a", "v AS b")
    tris = wedges.join(closing, ["a", "b"]).select("pivot", "a", "b")
    per_node = (
        tris.selectExpr("pivot AS node")
        .unionAll(tris.selectExpr("a AS node"))
        .unionAll(tris.selectExpr("b AS node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        col("deg").cast("long").alias("degree"),
        F.coalesce("n_triangles", lit(0)).cast("long").alias("n_triangles"),
    )
