"""Iterative graph algorithms as DataFrame loops.

The link-prediction heuristics (common neighbors, Adamic-Adar, Jaccard,
preferential attachment, resource allocation — queries.py ``graph_*``)
are single-join aggregations; this module holds the genuinely iterative
ones, written as unrolled lazy DataFrame chains: each iteration is one
equi-join + one aggregation, so Catalyst sees the whole loop as a
single plan and AQE re-sizes every shuffle. No RDDs, no driver-side
adjacency, no collect of anything larger than a scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cap_hub_degree(
    edges: DataFrame,
    key_col: str,
    node_col: str,
    *,
    max_degree: int | None,
    strategy: str = "topk",
) -> DataFrame:
    """Hub-degree guard for pair-generating self-joins (common
    neighbors, Adamic-Adar, triangles, neighbor Jaccard): a shared
    neighbor of degree d emits d(d−1)/2 pairs, so ONE celebrity hub on
    a 100 TB graph is an executor-OOM — the same shape the dedup tiers
    cap with ``_drop_hot_buckets`` (operators/dedup.py). ``edges`` must
    be distinct (key, node) rows (every caller dedups first); degree =
    rows per key.

    ``strategy="topk"`` keeps the ``max_degree`` smallest ``node_col``
    values per over-cap key — deterministic, order-independent, and the
    hub still contributes bounded pairs; ``"drop"`` removes over-cap
    keys entirely (mirrors the dedup cap). ``max_degree=None`` is the
    identity (parity pinned in tests/test_operators.py). Under-cap keys
    never touch the window sort: the over-cap key set is isolated with
    one distinct-keys aggregation (map-side partial, like
    ``_drop_hot_buckets``) and only hub rows — a vanishing fraction by
    construction — pay the per-key row_number. Quantify the loss with
    :func:`hub_cap_loss` before choosing a cap; the capped graph is
    then the graph (downstream degree dims are computed AFTER capping).
    """
    if max_degree is None:
        return edges
    if strategy not in ("topk", "drop"):
        raise ValueError(f"unknown hub strategy {strategy!r}")
    over = (
        edges.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__d"))
        .filter(F.col("__d") > max_degree)
        .select(key_col)
    )
    under = edges.join(over, on=key_col, how="left_anti")
    if strategy == "drop":
        return under
    w = Window.partitionBy(key_col).orderBy(node_col)
    trimmed = (
        edges.join(over, on=key_col, how="left_semi")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_degree)
        .drop("__rn")
    )
    return under.unionByName(trimmed)


def hub_cap_loss(
    edges: DataFrame,
    key_col: str,
    *,
    max_degree: int,
    strategy: str = "topk",
) -> DataFrame:
    """One-row loss report for :func:`cap_hub_degree` — the 'loss
    logged' half of the guard: (n_hubs_capped, n_edges_dropped,
    n_wedge_pairs_dropped), where wedge pairs are the d(d−1)/2 −
    k(k−1)/2 pair emissions the cap prevents per hub (k = kept rows:
    ``max_degree`` for topk, 0 for drop). Runs off the same
    distinct-keys degree aggregation as the cap itself."""
    kept = F.lit(max_degree if strategy == "topk" else 0).cast("long")
    d = F.col("__d")
    return (
        edges.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__d"))
        .filter(d > max_degree)
        .agg(
            F.count(F.lit(1)).alias("n_hubs_capped"),
            F.coalesce(F.sum(d - kept), F.lit(0)).alias("n_edges_dropped"),
            # integral halving via shiftright: d·(d−1) and k·(k−1) are
            # both even, so the per-row difference is even and the shift
            # is exact — double-precision division would lose exactness
            # past 2^53, the celebrity-hub-at-100TB regime this guard
            # exists for (ADVICE r08).
            F.coalesce(
                F.sum(F.shiftright(d * (d - 1) - kept * (kept - 1), 1)), F.lit(0)
            ).alias("n_wedge_pairs_dropped"),
        )
    )


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    truncate_lineage_every: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a DIRECTED edge list (symmetrize
    upstream for undirected graphs): r_{k+1}(v) = (1-d)/N + d·Σ_{u→v}
    r_k(u)/outdeg(u).

    Per iteration: one equi-join (ranks ⋈ edges on src) + one
    aggregation (sum contributions by dst) — both shuffle on node id,
    so a cluster co-partitions consecutive iterations on the same key.
    The edge+outdegree join is computed once and cached; N enters the
    plan as a 1-row broadcast cross-join (never a driver scalar).
    Dangling nodes (outdeg 0) keep their base-rank term but leak their
    damped mass, as in the classic formulation without dangling
    redistribution — callers wanting strict mass conservation should
    add sink self-loops upstream.

    ``truncate_lineage_every=k`` materializes the rank frame with an
    eager ``localCheckpoint`` every k iterations: at 3 unrolled
    iterations the single lazy plan is ideal (Catalyst/AQE see it
    whole), but at 20+ the plan tree grows linearly and analysis/
    codegen time — and, on a cluster, recovery cost after executor
    loss — grows with it. Periodic truncation caps plan depth at k
    joins; numerically a no-op (pinned in tests).

    Returns (node, rank). Nodes = every src or dst endpoint.
    """
    e = edges.select(F.col(src).alias("__u"), F.col(dst).alias("__v"))
    nodes = (
        e.select(F.col("__u").alias("node"))
        .unionByName(e.select(F.col("__v").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("__u").agg(F.count(F.lit(1)).alias("__deg"))
    # one cached (src, dst, outdeg) fact table feeds every iteration
    fanout = e.join(outdeg, on="__u").cache()
    n_df = F.broadcast(nodes.agg(F.count(F.lit(1)).cast("double").alias("__n")))

    ranks = nodes.crossJoin(n_df).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for it in range(iterations):
        contribs = (
            fanout.join(ranks, on=fanout["__u"] == ranks["node"])
            .select(F.col("__v").alias("node"), (F.col("rank") / F.col("__deg")).alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            nodes.join(contribs, on="node", how="left")
            .crossJoin(n_df)
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("__n")
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if truncate_lineage_every and (it + 1) % truncate_lineage_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def bfs_min_hops(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_hops: int = 3,
) -> DataFrame:
    """Bounded-depth BFS over a DIRECTED edge list: minimum hop count
    from any seed node, for every node within ``max_hops``.

    Frontier expansion as unrolled DataFrame iterations: hop k's
    frontier joins the edge list once (shuffle keyed on node id, the
    same key every iteration) and the running minimum collapses with
    one distinct-union per level — no driver-side visited set, no
    collect. The frontier is NOT subtracted against the visited set per
    level (that would add an anti-join shuffle per hop); instead the
    final groupBy-min dedups revisits, which is cheaper while levels
    stay within the same order of magnitude — the regime bounded-depth
    neighborhoods (feature extraction, blast-radius queries) live in.
    For unbounded reachability on high-diameter graphs use the
    connected-components operator instead (operators/dedup.py).

    Returns (node, min_hops).
    """
    e = edges.select(F.col(src).alias("__u"), F.col(dst).alias("__v"))
    reached = seeds.select(
        F.col(seed_col).alias("node"), F.lit(0).alias("min_hops")
    ).distinct()
    frontier = reached
    for hop in range(1, max_hops + 1):
        frontier = (
            frontier.join(e, frontier["node"] == e["__u"])
            .select(F.col("__v").alias("node"), F.lit(hop).alias("min_hops"))
            .distinct()
        )
        reached = reached.unionByName(frontier)
    return reached.groupBy("node").agg(F.min("min_hops").alias("min_hops"))
