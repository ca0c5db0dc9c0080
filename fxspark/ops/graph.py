"""Iterative graph algorithms as DataFrame loops.

Connected components (dedup clustering) lives in ``ops/dedup.py``; this
module holds the rank-propagation family. The driver unrolls a FIXED
number of iterations — each is one join + one aggregation, and the frame
is ``localCheckpoint``-ed between iterations so the lineage (and the plan
Catalyst must optimize) stays O(1) instead of growing per iteration, the
standard Spark iterative-algorithm discipline (same pattern as the
label-propagation tier of ``ops/dedup.connected_components``).

Determinism: the per-node contribution sum is decimal-exact (cast to
DECIMAL(38,18), summed, cast back), so the result is bit-identical across
partitionings and engines — an unrolled SQL oracle replays it exactly.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@contextmanager
def _wide_shuffle(sess: SparkSession):
    """Temporarily raise ``spark.sql.shuffle.partitions`` to the session's
    defaultParallelism for an EAGER materialization of a heavy stage, iff
    the session conf is narrower (guide §2.1: size shuffles to the stage's
    data, not one global knob). The bench regime pins 8 partitions for the
    KB-sized rollups; a stage that probes tens of millions of rows should
    run at ≥ cores tasks instead — widening the conf around the
    materializing action widens the EXISTING exchanges without adding one
    (the round-17 keyed-repartition variants added a full extra pass of
    the wedge frame and measured worse). On a cluster whose conf already
    ≥ cores this is a no-op. The conf is restored before downstream
    KB-sized aggregations plan."""
    n = sess.sparkContext.defaultParallelism
    try:
        cur = int(sess.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # e.g. "auto" — leave the conf alone
        cur = None
    if cur is None or cur >= n:
        yield
        return
    sess.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        sess.conf.set("spark.sql.shuffle.partitions", str(cur))


def _spread_iteration_frame(df: DataFrame) -> DataFrame:
    """Rebalance the per-iteration edge frame to the session's full
    parallelism BEFORE it is checkpointed, iff it arrives with fewer
    partitions than cores (guide §2.5: scale-adaptive partitioning, not a
    constant). The rank-propagation iteration stage is CPU-bound — one
    double→DECIMAL(38,18) conversion plus a wide-decimal partial sum per
    edge row, repeated n_iter times — so its task count should track
    cores, not the shuffle-partition setting tuned for the KB-sized
    rollups (the bench pins 8). One extra exchange before the single
    materialization buys n_iter fully-parallel passes; at cluster scale
    the upstream shuffle already yields >= cores partitions and this is a
    no-op (measured: part_copurchase_ppr 8.7 → 7.8 s at sf0.1 under the
    bench regime; micro-bench of the iteration sum alone 0.99 → 0.66 s
    at 2.4M rows, 8 → 32 tasks).

    Only called when the CALLER opts in (``spread_iterations=True`` on the
    rank ops): the op cannot cheaply see the frame's size (a row-count
    probe forces an extra materialization; the rdd partition probe forces
    an extra physical planning pass — both measured regressions), but the
    caller knows whether its graph SCALES WITH THE INPUT. The co-purchase
    graphs grow linearly in orders and opt in; the nation trade graph is
    ≤ 625 edges at any scale factor and must not pay a 32-partition
    shuffle plus n_iter × 32 near-empty tasks (round-17 regression:
    nation_trade_pagerank 1.60 → 2.21 s from an unguarded spread).

    The decision reads the shuffle-partitions CONF — the frame always
    arrives off a shuffle (the out-weight join), so that conf IS its
    partition count — rather than probing ``df.rdd.getNumPartitions()``:
    the rdd probe forces a full extra physical planning of the caller's
    edge-build lineage per query build (+0.6 s on nation_trade_pagerank's
    6-table join lineage, round-17 after-bench regression, reverted)."""
    sess = df.sparkSession
    n = sess.sparkContext.defaultParallelism
    try:
        upstream = int(sess.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # e.g. "auto" — leave the frame alone
        return df
    if upstream < n:
        return df.repartition(n)
    return df


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    n_iter: int = 5,
    damping: float = 0.85,
    spread_iterations: bool = False,
) -> DataFrame:
    """Weighted PageRank, ``n_iter`` synchronous iterations.

    ``rank_{i+1}(v) = (1-d)/N + d * sum_{(u,v) in E} rank_i(u) * w(u,v) / out(u)``

    Nodes are the union of sources and destinations; dangling nodes (no
    out-edges) keep contributing nothing (their mass leaks — the simple
    variant, stated so the oracle can replay it). Every iteration is one
    shuffle on ``dst`` plus a broadcast-sized rank join; at scale the edge
    list is the big side and stays partitioned by ``src`` across
    iterations, so only the (N-row) rank frame moves.

    A NULL endpoint is not a node: edges with a NULL src or dst (or a
    NULL/zero out-weight share) are dropped explicitly — previously they
    fell out incidentally at the out-weight equi-join, which is Spark
    join semantics, not a declared contract.

    ``spread_iterations``: opt-in widening of the per-iteration edge frame
    to full parallelism (see :func:`_spread_iteration_frame`) — pass True
    only for graphs that scale with the input data.

    Returns (node, rank) with rank a raw double — round at the query edge.
    """
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w_col.alias("_w")
    ).filter(
        F.col("_src").isNotNull() & F.col("_dst").isNotNull()
        & F.col("_w").isNotNull()
    )
    out = e.groupBy("_src").agg(F.sum("_w").alias("_out"))
    # Edge frame with precomputed out-weight share: reused every iteration —
    # materialize once so the join/agg per iteration reads a checkpoint, not
    # the full upstream lineage.
    e = e.join(out, "_src").withColumn("_share", F.col("_w") / F.col("_out"))
    e = e.select("_src", "_dst", "_share")
    if spread_iterations:
        e = _spread_iteration_frame(e)
    e = e.localCheckpoint()
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # EMPTY edge list ⇒ empty node set ⇒ empty rank frame — the SQL
        # oracles' iteration over zero nodes yields zero rows too
        # (round-14 sf_empty registry sweep; 1/N below would divide by 0).
        return nodes.withColumn("rank", F.lit(0.0))
    teleport = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(n_iter):
        contrib = (
            e.join(F.broadcast(ranks), e["_src"] == ranks["node"])
            .select(
                F.col("_dst").alias("node"),
                (F.col("rank") * F.col("_share")).alias("_c"),
            )
            .groupBy("node")
            .agg(
                F.sum(F.col("_c").cast("decimal(38,18)"))
                .cast("double")
                .alias("_in"),
            )
        )
        ranks = (
            nodes.join(F.broadcast(contrib), "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 4,
    assume_distinct: bool = False,
) -> DataFrame:
    """Multi-source BFS hop distance, ``max_hops`` synchronous frontier
    expansions — the reachability twin of :func:`pagerank`'s iterative
    shape (the reference has no graph operators; its closest analogue is
    the repeated full-store re-join at ``/root/reference/Fx_1min.py:147``,
    which this replaces with frontier-proportional work).

    ``seeds`` is a one-column frame of start nodes (column name = ``src``'s
    name is NOT required; the first column is taken). Iteration ``i`` joins
    the CURRENT frontier (nodes first reached at distance ``i``) against
    the edge list and anti-joins the visited set — so per-iteration cost is
    |frontier| × avg-degree, never |V|². The edge list is localCheckpointed
    once and stays partitioned on ``src`` across iterations (exchange
    reuse); only the frontier/visited frames (≤ |V| rows) move. Distances
    are exact integers — hash-safe against an unrolled or recursive-CTE SQL
    replay.

    Returns (node, hops) for every node reachable within ``max_hops``
    (seeds at 0). Unreached nodes are absent.
    """
    # ``assume_distinct``: the caller certifies the edge list is already
    # deduplicated (e.g. it mirrored a canonical ``u < v`` distinct —
    # dedup on the 1.2M canonical pairs instead of the 2.4M directed rows,
    # and the mirror union then reads a checkpoint instead of re-running
    # the edge build per branch; round 17, q_part_copurchase_bfs).
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    if not assume_distinct:
        e = e.distinct()
    e = e.localCheckpoint()
    visited = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited
    for i in range(1, max_hops + 1):
        nxt = (
            e.join(frontier, e["_src"] == frontier["node"])
            .select(F.col("_dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(i))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        # visited stays a plain union of already-checkpointed frontiers:
        # its lineage is a k-way union of materialized frames (k = hops so
        # far), so re-checkpointing it each iteration would only add a
        # materialization job without shortening any recompute path.
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def triangles_per_node(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    wide_close: bool = False,
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected edge list (rows may arrive in either direction and
    duplicated; they are canonicalized to ``u < v`` and deduped first).

    The scalable shape is DEGREE ORIENTATION (the standard distributed
    triangle algorithm): orient every edge from its (degree, id)-smaller
    endpoint to the larger, enumerate wedges only from ORIENTED
    out-neighbors — every node's out-degree is O(√E) regardless of skew,
    so the wedge join is bounded where a naive neighbor-pair explosion
    on a hub node is quadratic — and close each wedge against the
    oriented edge set with one more join. Each triangle is found exactly
    once and credited to all three corners via a 3-way explode.

    Returns ``(node, degree, triangles, clustering)`` for nodes with
    degree ≥ 2, where ``clustering = 2·T / (deg·(deg−1))`` — plain double
    on exact integers. Plan: three hash joins + two hash-aggs, all keyed;
    nothing global, nothing quadratic in any node's degree.

    ``wide_close``: caller opt-in (the ``spread_iterations`` discipline —
    pass True only for graphs that scale with the input data): eagerly
    materialize the per-node triangle counts with the shuffle-partition
    conf temporarily widened to defaultParallelism, so the wedge
    enumeration + close (the Σ out-deg² stage — 41M rows at sf0.1,
    probed in only 8 tasks under the bench regime) runs at ≥ cores tasks
    with NO extra exchange. Round-18 skew probe first: per-8-bucket wedge
    mass max/median 1.02 (top-20 keys own 0.21%), so the stage is
    parallelism-bound, not skew-bound — salting declined, widening wins
    (interleaved A/B 6.17 → 5.10 s solo; the r17 keyed-repartition
    variants that ADDED an exchange measured worse and stay rejected).
    Counts are exact integers, so the result is partitioning-invariant.
    """
    u, v = F.col(src), F.col(dst)
    e = (
        edges.select(
            F.least(u, v).alias("u"), F.greatest(u, v).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # Materialize the canonical edge frame: the engine consumes it
        # from several branches (degree rollup, orientation join, final
        # join), each of which would otherwise re-run the caller's whole
        # edge build — 34 base-table scans in
        # part_copurchase_clustering's executed plan without this.
        # localCheckpoint, NOT persist: persist registers in the session
        # CacheManager by canonicalized plan, so a REBUILT identical
        # query silently serves cached results (A/B: 0.8 s cache-read vs
        # 4.1 s compute) — corrupting benchmark semantics and
        # accumulating session-lifetime cache entries. The trade is that
        # checkpoint blocks don't survive executor loss; a cluster
        # deployment with executor churn swaps this for
        # persist-with-managed-lifecycle or reliable checkpointing
        # (SCALE.md §1).
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        e.join(deg.withColumnRenamed("n", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("deg", "dv"), "v")
    )
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # Materialized for the same reason as e: three consumers below (lo,
    # hi, and the closing semi-join) would each re-run the degree joins.
    oe = ed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(fwd, F.col("du")).otherwise(F.col("dv")).alias("da"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).localCheckpoint(eager=False)
    # wedges from shared oriented source, ordered by (deg, id) so each
    # unordered out-neighbor pair appears once
    lo = oe.select("a", F.col("b").alias("x"), F.col("db").alias("dx"))
    hi = oe.select("a", F.col("b").alias("y"), F.col("db").alias("dy"))
    wedge = lo.join(hi, "a").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    # The wedge close is the algorithm's largest join: Σ out-deg² wedge
    # rows (83M on the dense sf0.1 fixture) semi-probed against the
    # oriented edge set. The build side carries a SHUFFLE_HASH hint so
    # the wedge frame is HASH-probed, never sorted, under EVERY planner
    # regime. History: round 11 rejected the hint because with AQE's
    # full join ladder (session.py) the runtime pick was already
    # broadcast/SHJ and the hint only pinned AQE (SMJ-initial 3.34 s /
    # SHJ 3.05 s / broadcast 3.01 s, overlapping reps). Round 17
    # re-measured under the bench regime — AQE OFF, 8 shuffle
    # partitions — where the checkpointed edge frame carries no
    # planning-time stats, the static planner never upgrades the join,
    # and the fallback SMJ SORTS the 83M-row wedge frame in 8 tasks:
    # 14.3 s vs 6.2 s hinted (guide §3.1 — pick the strategy
    # deliberately when statistics can't). At cluster scale the edge
    # set outgrows broadcast anyway, so SHJ is the correct pinned
    # strategy, with per-partition build slices bounded by the shuffle
    # partitioning. Pinned by tests/test_plans.py on the runtime-final
    # plan.
    tri = wedge.join(
        oe.select(F.col("a").alias("x"), F.col("b").alias("y")).hint(
            "shuffle_hash"
        ),
        ["x", "y"],
        "left_semi",
    )
    per_node = (
        tri.select(
            F.explode(F.array("a", "x", "y")).alias("n")
        )
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    if wide_close:
        # The lazy e/oe checkpoints materialize inside this job too, so the
        # whole wedge pipeline (orientation joins, wedge join, semi close,
        # count rollup) runs under the widened conf; the final degree join
        # below plans later, back at the session's setting.
        with _wide_shuffle(edges.sparkSession):
            per_node = per_node.localCheckpoint()
    d = F.col("deg").cast("double")
    return (
        deg.filter(F.col("deg") >= 2)
        .join(per_node, "n", "left")
        .fillna(0, subset=["triangles"])
        .select(
            F.col("n").alias("node"),
            "deg",
            "triangles",
            (2.0 * F.col("triangles").cast("double") / (d * (d - 1.0))).alias(
                "clustering"
            ),
        )
    )


def sample_edges_md5(
    edges: DataFrame,
    pct: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """DOULION edge sparsification with DECLARED randomness: keep an edge
    iff ``md5_60(src || '|' || dst) % 100 < pct`` — the same md5-derived
    determinism discipline as the KMV/HLL sketches, so the sparsified
    graph (and every estimate computed on it) is bit-reproducible in any
    engine and hash-verifiable against a SQL oracle, which a
    ``rand()``-based sample never is.

    DOULION (Tsourakakis et al., KDD'09): counting triangles on the
    p-sparsified graph and scaling by ``1/p³`` gives an UNBIASED
    estimate of the true count (each triangle survives with probability
    p³); the wedge-join work — the Ω(Σ out-deg²) information floor of
    exact counting — shrinks by ~p², which is the entire point of the
    scale form. The hash is computed over the CANONICAL orientation
    ``(least, greatest)``, so both directed rows of an undirected edge
    share the same keep/drop fate — required when the caller feeds a
    symmetrized edge list (e.g. for PageRank on the sampled graph).

    NULL endpoints: ``concat`` of a NULL src/dst yields a NULL hash, so
    the keep predicate is NULL and the edge is DROPPED. A NULL endpoint
    is not an edge (there is nothing to connect), so dropping is the
    correct semantics for sampling — but it would also silently mask an
    upstream data problem, so the drop is made explicit and loud here:
    the filter excludes NULLs by construction, and callers who need to
    surface bad rows should anti-join against ``isnull(src) |
    isnull(dst)`` BEFORE sampling (the co-purchase edge builders derive
    endpoints from inner joins on non-null keys, so no NULLs reach this
    in the registered queries).
    """
    u, v = F.col(src), F.col(dst)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.least(u, v).cast("string"),
                    F.lit("|"),
                    F.greatest(u, v).cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    # Explicit, not incidental: NULL endpoints are excluded by a named
    # predicate rather than relying on NULL-hash three-valued logic.
    return edges.filter(u.isNotNull() & v.isNotNull()).filter((h % 100) < pct)


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    n_iter: int = 5,
    damping: float = 0.85,
    prune_eps: float | None = None,
    nodes: DataFrame | None = None,
    spread_iterations: bool = False,
) -> DataFrame:
    """Personalized PageRank: identical recurrence to :func:`pagerank`
    except the teleport mass returns to a SOURCE SET instead of spreading
    uniformly — ``rank_{i+1}(v) = (1-d)·p(v) + d·Σ rank_i(u)·share(u,v)``
    with ``p(v) = 1/|S|`` on the personalization set S (``sources``, one
    column named ``node``) and 0 elsewhere; ``rank_0 = p``. The
    "related items" primitive: mass diffuses outward from S through the
    co-occurrence graph, so high-rank nodes are S's graph neighborhood
    weighted by connectivity, not global popularity.

    Same topology and determinism contract as :func:`pagerank`
    (localCheckpointed O(1) lineage, decimal-exact contribution sums,
    dangling mass leaks by declaration); ``sources`` is broadcast-sized.
    Nodes unreachable from S keep rank exactly 0.0.

    ``prune_eps`` enables the FRONTIER-PRUNED scale form (the
    synchronous cousin of Forward Push / Andersen-Chung-Lang local
    PPR): only nodes with ``rank ≥ prune_eps`` contribute in the next
    iteration. Because ``rank_0 = p`` is non-zero ONLY on S, the
    contribution frontier grows outward from the seed set hop by hop —
    on a power-law graph the join touches the seed neighborhood, not
    all E edges. Error is one-sided and bounded by declaration: pruning
    only REMOVES non-negative contribution mass, so every pruned rank
    is a LOWER bound on the exact rank, short by at most
    ``Σ_{t=1..n_iter} d^t · (pruned mass at iteration t)``
    ≤ ``prune_eps · n_nodes · d/(1−d)`` in the worst case — pick
    ``prune_eps`` several orders below 1/n so the deficit vanishes at
    the output rounding scale. Exact-zero ranks (unreached nodes) are
    always pruned, which is pure savings with zero error.

    ``nodes``: optional one-column frame that must equal EXACTLY the
    union of edge endpoints (a superset would add spurious rank-0 rows;
    a subset silently drops reachable nodes). Callers that already hold
    that set (e.g. off the same checkpointed edge aggregate) pass it in
    to skip this op's full-edge-list distinct; when in doubt, leave it
    None and let the op derive it.

    ``spread_iterations``: opt-in widening of the per-iteration edge
    frame to full parallelism (see :func:`_spread_iteration_frame`) —
    pass True only for graphs that scale with the input data.
    """
    w_col = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w_col.alias("_w")
    )
    out = e.groupBy("_src").agg(F.sum("_w").alias("_out"))
    e = e.join(out, "_src").withColumn("_share", F.col("_w") / F.col("_out"))
    e = e.select("_src", "_dst", "_share")
    if spread_iterations:
        e = _spread_iteration_frame(e)
    e = e.localCheckpoint()
    # ``nodes``: caller-supplied node frame (one column, exactly the union
    # of edge endpoints — the callers that pass it derive it from the SAME
    # checkpointed edge aggregate). Skips this op's full-edge-list distinct,
    # which the registered PPR queries were otherwise paying twice: once
    # here and once caller-side for the seed semi-join (round-17 phase
    # profile: ~1 s each at sf0.1 under the bench regime).
    if nodes is None:
        nodes = (
            e.select(F.col("_src").alias("node"))
            .union(e.select(F.col("_dst").alias("node")))
            .distinct()
        )
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node"))
    s = sources.select("node").distinct()
    n_src = s.count()
    if n_src == 0:
        # No teleport sources (empty input or empty seed set): every
        # node's personalized rank is 0 mass — return the empty frame the
        # SQL oracle produces (round-14 sf_empty registry sweep; 1/n_src
        # below would divide by 0).
        return nodes.withColumn("rank", F.lit(0.0)).limit(0)
    p = 1.0 / n_src
    nodes = (
        nodes.join(
            F.broadcast(s.withColumn("_tele", F.lit(p))), "node", "left"
        )
        .select("node", F.coalesce(F.col("_tele"), F.lit(0.0)).alias("_tele"))
        .localCheckpoint()
    )
    ranks = nodes.select("node", F.col("_tele").alias("rank"))
    for _ in range(n_iter):
        frontier = (
            ranks.filter(F.col("rank") >= prune_eps)
            if prune_eps is not None
            else ranks
        )
        contrib = (
            e.join(F.broadcast(frontier), e["_src"] == frontier["node"])
            .select(
                F.col("_dst").alias("node"),
                (F.col("rank") * F.col("_share")).alias("_c"),
            )
            .groupBy("node")
            .agg(
                F.sum(F.col("_c").cast("decimal(38,18)"))
                .cast("double")
                .alias("_in"),
            )
        )
        ranks = (
            nodes.join(F.broadcast(contrib), "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("_tele")
                    + F.lit(damping)
                    * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
