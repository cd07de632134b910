"""Asset-graph operators (reference §2.3 J2/J3, §2.4 A3/A4).

The reference builds its parent/child/reference graph with linear
``Array.find`` + ``push`` accumulation — O(n²) client-side
(lib/collectServices.ts:125-168, lib/collectPods.ts:90-112).  The Spark
formulation is group-and-collect: derive one edge row per (owner, edge
type, target EAN), then hash-aggregate ``collect_set`` per owner.  One
shuffle, linear, spillable — same result set (SURVEY.md A3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_collect_edges(
    df: DataFrame,
    owner_cols: list[str],
    edge_cols: dict[str, str],
    extra_aggs: dict[str, F.Column] | None = None,
) -> DataFrame:
    """A3/J2/J3: per-owner distinct edge collection.

    ``edge_cols`` maps output column → input EAN column; each becomes
    ``sort_array(collect_set(col))`` — distinct (A4's find-before-push)
    and sorted so downstream hashing is order-insensitive
    (``collect_set`` order is nondeterministic across partitions).
    """
    aggs = [
        F.sort_array(F.collect_set(F.col(f"`{src}`"))).alias(out)
        for out, src in edge_cols.items()
    ]
    for name, agg in (extra_aggs or {}).items():
        aggs.append(agg.alias(name))
    return df.groupBy(*[F.col(f"`{c}`") for c in owner_cols]).agg(*aggs)


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge frame → (node, rank_scaled):
    ``rank_scaled`` is rank × |nodes| (≈1 for an average node) rounded to
    6 dp — the importance signal web-corpus curation uses to weight crawl
    frontiers and training-mix sources (OPIC/Common-Crawl style).

    Exactly ``iters`` synchronous power iterations with teleport
    ``(1−damping)/n`` — deterministic by construction (no convergence
    test, so an oracle can replay the same unrolled recurrence).

    Scale shape per iteration with ``broadcast_ranks`` (default): the
    node-sized share table broadcasts into the edge join, so the edge
    frame — checkpointed once up front — NEVER shuffles; each round is
    one map-side join pass plus a partial-agg sum on ``dst``.  Right
    whenever nodes are dimension-sized relative to edges (entity/
    co-occurrence graphs).  For web-graph scale where ranks outgrow the
    broadcast budget, pass ``broadcast_ranks=False``: both sides then
    hash-join on ``src`` (pre-partition the edge frame on ``src`` so the
    layout is reused across rounds).  Either way ranks are
    ``localCheckpoint``-ed per round so lineage stays flat instead of
    doubling (the classic iterative-plan blowup), and the node count
    rides a broadcast 1-row frame — no driver ``.count()`` in the plan
    path.  Dangling nodes (no out-edges) keep teleport mass only; pass a
    symmetrized edge frame when the graph is undirected.
    """
    # the edge frame and its degree table feed EVERY iteration — left
    # lazy, the upstream edge derivation (often a fact-table join) would
    # re-execute per round (measured >2 min at sf0.1 vs ~15 s pinned)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n1 = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("__n")))
    out_deg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("__out"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.crossJoin(n1).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for it in range(iters):
        shares = ranks.join(out_deg, "node").select(
            F.col("node").alias("src"),
            (F.col("rank") / F.col("__out")).alias("__share"),
        )
        if broadcast_ranks:
            shares = F.broadcast(shares)
        contribs = (
            e.join(shares, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__share").alias("__in"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(n1)
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("__n")
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        # checkpoint every 3rd round (and the last): flat-enough lineage
        # without paying an eager job barrier per iteration
        if it % 3 == 2 or it == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.crossJoin(n1).select(
        "node", F.round(F.col("rank") * F.col("__n"), 6).alias("rank_scaled")
    )


def triangle_count(
    edges: DataFrame, a: str = "doc_a", b: str = "doc_b"
) -> DataFrame:
    """Per-node triangle counts over an undirected edge frame →
    ``(node, n_triangles)`` for every node in at least one triangle.

    Triangle density is the spam/boilerplate-cluster signal on web and
    near-dup graphs (a k-clique of mutual near-dups is template spam;
    organic similarity is sparse), and the classic graph statistic a
    crawl-curation pipeline computes after pair generation.

    Scale shape — the degree-oriented node-iterator algorithm: every
    edge is oriented ascending by ``(degree, id)``, so each triangle
    has exactly ONE wedge at its π-minimal vertex and wedge fan-out per
    edge is bounded by the SMALLER endpoint degree — O(m^1.5) wedges
    total on any graph (vs O(Σ d²) unoriented, which a single
    celebrity node makes quadratic).  Two equi-join shuffles (wedge
    build on source, closing-edge probe on the wedge pair); per-node
    counts are one explode + hash-agg.
    """
    u, v = F.least(F.col(a), F.col(b)), F.greatest(F.col(a), F.col(b))
    und = edges.select(u.alias("u"), v.alias("v")).filter(
        F.col("u") != F.col("v")
    ).distinct()
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ed = und.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dt"),
    )
    e1, e2 = o.alias("e1"), o.alias("e2")
    t1_lt_t2 = (F.col("e1.dt") < F.col("e2.dt")) | (
        (F.col("e1.dt") == F.col("e2.dt")) & (F.col("e1.t") < F.col("e2.t"))
    )
    wedges = e1.join(e2, (F.col("e1.s") == F.col("e2.s")) & t1_lt_t2).select(
        F.col("e1.s").alias("x"), F.col("e1.t").alias("y"), F.col("e2.t").alias("z")
    )
    closing = o.select(F.col("s").alias("y"), F.col("t").alias("z"))
    tri = wedges.join(closing, ["y", "z"], "left_semi")
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def hits(
    edges: DataFrame,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    broadcast_scores: bool = True,
) -> DataFrame:
    """HITS hubs-and-authorities over a directed edge frame →
    ``(node, role 'hub'|'authority', score)``, L1-normalized per round.

    The complement of :func:`pagerank` for bipartite-ish interaction
    graphs (buyer→product, crawler→page, query→doc): hubs score
    good *selectors*, authorities good *selections* — the two-sided
    importance signal source-weighting wants where a single rank
    conflates them.

    Same scale shape as pagerank: the edge frame checkpoints ONCE and
    never re-shuffles; each of the ``iters`` rounds is two map-side
    broadcast joins (score frames are node-dimension-sized) + two
    partial-agg sums, with the L1 total riding a broadcast 1-row frame
    — no driver action anywhere.  Pass ``broadcast_scores=False`` for
    web-graph scale where node frames outgrow the broadcast budget
    (both sides then hash-join; pre-partition the edge frame on the
    join key).  Fixed iteration count keeps it oracle-replayable.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct().localCheckpoint(eager=True)
    bc = F.broadcast if broadcast_scores else (lambda df: df)
    # Normalization is deferred to the END: h and a grow by ~mean-degree
    # per half-round (double overflow needs growth^(2·iters) > 1e308 —
    # not reachable at 5 rounds even on a degree-1000 graph), and the
    # final L1 division yields the identical result while HALVING the
    # per-round job count (no 1-row total broadcast + crossJoin per
    # half-step).  The oracle replays this same end-normalized
    # recurrence, so the formulations stay hash-consistent.
    hubs = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.lit(1.0).alias("h")
    )
    auth = None
    # NOTE (r16): the LPA lazy-chain fusion was tried here and measured
    # SLOWER (solo 3.74 → 4.58 s): unlike LPA's shuffle-join rounds,
    # each HITS half-round broadcasts its score frame, and a fully lazy
    # loop nests every BroadcastExchange build inside the next — the
    # per-2-round eager checkpoint keeps the broadcast children small
    # and is kept deliberately.
    for it in range(iters):
        auth = (
            e.join(bc(hubs), e["src"] == hubs["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        hubs = (
            e.join(bc(auth), e["dst"] == auth["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        if it % 2 == 1 or it == iters - 1:
            hubs = hubs.localCheckpoint(eager=True)
    h_tot = F.broadcast(hubs.agg(F.sum("h").alias("__t")))
    a_tot = F.broadcast(auth.agg(F.sum("a").alias("__t")))
    return (
        hubs.crossJoin(h_tot)
        .select(
            "node",
            F.lit("hub").alias("role"),
            F.round(F.col("h") / F.col("__t"), 6).alias("score"),
        )
        .unionByName(
            auth.crossJoin(a_tot).select(
                "node",
                F.lit("authority").alias("role"),
                F.round(F.col("a") / F.col("__t"), 6).alias("score"),
            )
        )
    )


def connected_components_star(
    pairs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) → (node, component) with component = the
    minimum node id, for every node that appears in ``pairs``.

    The min-label propagation in neardup.dedup_survivors moves labels
    one HOP per round — O(diameter) shuffles, fine for near-dup
    clusters (pairs/triples) but slow on long chains.  Star contraction
    rewires the GRAPH each round (large-star hangs every
    greater-than-center neighbor off the neighborhood minimum,
    small-star re-parents the smaller neighbors), which squares path
    lengths away: O(log n) rounds on any topology — on a 100-TB edge
    set the difference between ~60 shuffles and ~6.

    Contract matches dedup_survivors: the pair endpoints are the FIRST
    TWO columns, any equatable id type; singletons (nodes absent from
    ``pairs``) are the caller's join-back, and each round is
    localCheckpointed so plans don't snowball.  Convergence is checked
    EXACTLY (count equality + one-sided exceptAll emptiness ⇒ multiset
    equality of the canonical edge sets), not by signature.

    Fixpoint counts ride the checkpoint job as an ``observe`` metric
    (CollectMetricsExec accumulator) instead of a separate ``count()``
    action — one job per contraction round, not two; the count the
    convergence test reads is of exactly the rows the checkpoint
    materialized.  (r17; the exceptAll emptiness probe still runs as
    its own job, but only on the one round where counts match.)
    """
    from pyspark.sql import Observation

    a_col, b_col = pairs.columns[0], pairs.columns[1]
    obs0 = Observation()
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        canon = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = canon.groupBy("u").agg(F.min("v").alias("m"))
        nbrs = (
            canon.join(m, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        centers = m.select(F.col("u"), F.col("m").alias("v"))
        return nbrs.union(centers).distinct()

    prev_n = obs0.get["n"]
    for _ in range(max_iter):
        obs = Observation()
        new_edges = (
            small_star(large_star(edges))
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n = obs.get["n"]
        if n == prev_n and new_edges.exceptAll(edges).limit(1).count() == 0:
            edges = new_edges
            break
        edges, prev_n = new_edges, n

    # fixpoint is a forest of stars: every edge is (node, component-min)
    nodes = edges.select(F.col("u").alias("node")).union(
        edges.select(F.col("v").alias("node"))
    ).distinct()
    labels = edges.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("component")
    )
    return (
        nodes.join(labels, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    )


def bfs_khop(
    edges: DataFrame, seeds: DataFrame, k: int, node_col: str = "node"
) -> DataFrame:
    """Bounded-depth BFS: minimum hop distance (≤ k) from a seed set
    over a directed edge frame (pass both orientations for an
    undirected graph) → (node, dist) with dist ∈ [0, k].

    Each round is frontier ⋈ edges → distinct → anti-join visited —
    one shuffle per hop, and the HOP BOUND (not graph diameter) caps
    the round count, which is what makes this the production reach
    query (k-hop neighborhoods, blast-radius, recommendation horizon)
    rather than full shortest paths: k is a small constant fixed by the
    question.  Per-round localCheckpoint truncates lineage (each
    round's frame feeds both the next join and the visited union — the
    same 2^k plan-growth guard as connected_components_star's rounds
    and mmr_rerank's greedy steps).  An empty frontier exits early, so
    sparse seeds never pay for unreachable rounds.

    Scale shape: the frontier never exceeds the node set, dedup happens
    per round BEFORE the next expansion (a node reached twice expands
    once), and at 1000 executors each round is an ordinary partitioned
    hash join on node id."""
    from pyspark.sql import Observation

    visited = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited.select("node")
    for d in range(1, k + 1):
        # nxt is the one genuinely multi-consumer frame per round (the
        # visited union, the next expansion, and every later round's
        # anti-join read it) — checkpoint it eagerly; the emptiness
        # probe rides the checkpoint job as an observe metric instead
        # of a separate isEmpty() job on the materialized partitions
        obs = Observation()
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(d))
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        if obs.get["n"] == 0:
            break
        # visited is a UNION of already-checkpointed rounds — re-reading
        # it is a cheap scan of materialized partitions, so its own
        # per-round localCheckpoint was a redundant copy job (one full
        # re-write of the growing frame per hop, removed r16)
        visited = visited.unionByName(nxt)
        frontier = nxt.select("node")
    return visited


def kcore_membership(
    edges: DataFrame,
    k: int,
    max_rounds: int = 12,
    canonical: bool = False,
    max_broadcast_nodes: int = 8_000_000,
) -> DataFrame:
    """k-CORE decomposition (membership for fixed k): iteratively peel
    nodes of degree < k until the remaining subgraph is stable — the
    maximal subgraph where every node keeps ≥ k in-subgraph neighbors
    (Seidman 1983), the standard dense-community / engagement-tier
    extractor.  ``edges`` is directed rows; pass both orientations for
    an undirected graph.  Returns (node, core_degree) — each surviving
    node with its within-core degree (≥ k by construction, an
    in-frame invariant the hash check pins).

    Each peel round is one map-side-combinable degree agg + a
    broadcast-sized semi-join on the survivor set, localCheckpointed
    (the per-round lineage guard shared with star-CC/BFS/MMR).  The
    loop EXITS on a certified fixpoint — zero nodes below degree k,
    observed as a metric ON the degree checkpoint job itself (no
    separate count action, and one round earlier than the old
    node-count-stable test: when nothing is below k the peel keeps
    everything, so the degree frame already IS the answer) — and
    RAISES if ``max_rounds`` passes without convergence — the same
    self-auditing contract as the DPP query: a run that returns has
    PROVEN its round bound, so an unrolled fixed-round oracle is exact
    whenever the query succeeds.

    Scale shape: peeling is O(rounds) corpus passes where rounds is
    the peel DEPTH of the degree distribution (6 on the suite graph;
    pathological chains are bounded by max_rounds, and production
    would switch to the O(log n) distributed coreness algorithms only
    past that depth).  Each pass shuffles the shrinking edge frame on
    node id; the survivor set broadcasts only while it FITS — the
    per-round survivor filter is SIZE-GATED on the node count the
    fixpoint agg already produced (no extra action): ≤
    ``max_broadcast_nodes`` survivors ride a broadcast semi-join, a
    larger core (a billion-node web graph) falls back to a shuffled
    semi-join instead of detonating the broadcast budget — the bloom
    auto-sizing precedent.  Both paths are property-tested equal; the
    default threshold (~8M single-column ids ≈ tens of MB) tracks the
    practical broadcast comfort zone, not the 8 GB hard cap.

    ``canonical=True`` takes each undirected edge ONCE (any
    orientation) instead of both directions: degrees come from a
    map-side explode of the two endpoints into one combiner-friendly
    agg, and every per-round checkpoint carries HALF the rows.  Wall
    time measures equivalent at suite scale (the explode costs what
    the union saved), but the halved checkpoint/shuffle FOOTPRINT is
    the form that matters when the edge frame is the memory budget —
    property-tested equal to the doubled path.  Same fixpoint, same
    core degrees.
    """
    from pyspark.sql import Observation

    if canonical:
        return _kcore_canonical(edges, k, max_rounds, max_broadcast_nodes)
    cur = edges.localCheckpoint()
    for _ in range(max_rounds):
        # ONE degree aggregation per round serves the fixpoint check,
        # the broadcast size gate AND the survivor filter: the node
        # count and the below-k count ride the checkpoint job as
        # observe metrics (no separate count() action), and the
        # below-k count detects the fixpoint ONE ROUND EARLIER than
        # the old node-count-stable test — zero nodes below k means
        # the peel would keep everything, so deg is already the
        # answer (identical rows; the old form re-derived the same
        # frame once more just to see the count hadn't moved)
        obs = Observation()
        deg = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("__d"))
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("__d") < k).cast("long")).alias("n_below"),
            )
            .localCheckpoint()
        )
        m = obs.get
        n_nodes = m["n"]
        if not m["n_below"]:  # None (empty frame) or 0: stable
            return deg.select(
                F.col("src").alias("node"),
                F.col("__d").alias("core_degree"),
            )
        keep = deg.filter(F.col("__d") >= k).select("src")
        # size gate: survivors ≤ n_nodes, observed above
        bc = F.broadcast if n_nodes <= max_broadcast_nodes else (lambda d: d)
        cur = (
            cur.join(bc(keep), "src", "left_semi")
            .join(
                bc(keep.select(F.col("src").alias("dst"))), "dst", "left_semi"
            )
            .select("src", "dst")
            .localCheckpoint()
        )
    raise RuntimeError(
        f"kcore_membership: no fixpoint within {max_rounds} rounds — "
        "the unrolled-oracle contract would be violated; raise "
        "max_rounds (and the oracle unroll) for this graph"
    )


def _kcore_canonical(
    edges: DataFrame,
    k: int,
    max_rounds: int,
    max_broadcast_nodes: int = 8_000_000,
) -> DataFrame:
    """kcore_membership's half-frame path: one row per undirected edge.
    Degree = explode both endpoints map-side into one agg (partial
    combine ships counts, not rows); survivors filter both columns
    (broadcast vs shuffled semi-join size-gated like the main path)."""
    from pyspark.sql import Observation

    cur = edges.select("src", "dst").localCheckpoint()
    for _ in range(max_rounds):
        # fixpoint + size-gate counts ride the checkpoint job as
        # observe metrics; zero below-k nodes exits one round earlier
        # with the identical frame (see the main path's comment)
        obs = Observation()
        deg = (
            cur.select(
                F.explode(F.array("src", "dst")).alias("node")
            )
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("__d"))
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("__d") < k).cast("long")).alias("n_below"),
            )
            .localCheckpoint()
        )
        m = obs.get
        n_nodes = m["n"]
        if not m["n_below"]:  # None (empty frame) or 0: stable
            return deg.select(
                "node", F.col("__d").alias("core_degree")
            )
        keep = deg.filter(F.col("__d") >= k).select("node")
        bc = F.broadcast if n_nodes <= max_broadcast_nodes else (lambda d: d)
        cur = (
            cur.join(
                bc(keep.select(F.col("node").alias("src"))),
                "src",
                "left_semi",
            )
            .join(
                bc(keep.select(F.col("node").alias("dst"))),
                "dst",
                "left_semi",
            )
            .select("src", "dst")
            .localCheckpoint()
        )
    raise RuntimeError(
        f"kcore_membership: no fixpoint within {max_rounds} rounds — "
        "the unrolled-oracle contract would be violated; raise "
        "max_rounds (and the oracle unroll) for this graph"
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    audit_churn: bool = False,
) -> DataFrame:
    """DETERMINISTIC synchronous label propagation → (node, label) —
    the standard community-detection primitive (Raghavan et al. 2007)
    made engine-replayable: every node starts as its own label; each
    round EVERY node simultaneously adopts the most frequent label
    among its neighbors AND itself (the self-vote damps the classic
    bipartite-oscillation failure of pure-neighbor sync LPA), with
    frequency ties broken to the SMALLEST label.  Sync update + min
    tie-break remove both sources of the algorithm's usual
    nondeterminism (visit order, random tie choice), so a fixed-round
    run is a pure function of the edge set — an unrolled SQL oracle
    replays it round for round (the bfs_khop certification pattern).

    ``edges`` must contain BOTH directions of every undirected edge
    (the bfs_khop contract); self-loops are added here.  ``rounds``
    is fixed by the caller like bfs_khop's hop bound — communities
    stabilize in a few rounds on modular graphs; this is a bounded
    refinement, not a fixpoint loop.

    Scale shape: per round, ONE partitioned hash join (labels onto
    edge destinations), one (node, label) count agg, and one
    node-PARTITIONED rank window — never a global window; lineage is
    truncated per round with localCheckpoint, the iterative-operator
    discipline pagerank/bfs/k-core established.  State = one label
    row per node.

    ``audit_churn=True`` adds a ``changed`` boolean — did this node's
    label change in the FINAL round — so a fixed ``rounds`` is
    evidence-backed rather than conventional: near-zero final-round
    churn means the refinement has converged, high churn means the
    caller under-provisioned rounds.  FREE: the self-vote row already
    carries each node's previous label into the votes aggregation, so
    the (node, L) group with L = prev_label(node) — and ONLY that
    group — contains a nbr == node row; a __self flag aggregated
    alongside the vote count makes ``changed = (__self == 0)`` on the
    winning row, zero extra joins (r14 shipped this as a separate
    prev ⋈ labels tail join — 3 extra exchanges, 6.3 → 9.5s on the
    suite query; folded r15, same output bit-for-bit).
    Oracle-replayable (the unrolled round CTEs already materialize
    the prior round's labels)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    e = edges.select(
        F.col(src).alias("node"), F.col(dst).alias("nbr")
    ).unionByName(
        nodes.select("node", F.col("node").alias("nbr"))  # self-vote
    ).localCheckpoint(eager=True)
    labels = nodes.select(
        "node", F.col("node").alias("label")
    ).localCheckpoint(eager=True)
    from pyspark.sql.window import Window

    w = Window.partitionBy("node").orderBy(
        F.col("__c").desc(), F.col("label").asc()
    )
    if rounds <= 0 and audit_churn:  # degenerate: nothing propagated
        return labels.select("node", "label", F.lit(False).alias("changed"))
    for rnd in range(rounds):
        final = rnd == rounds - 1
        votes = (
            e.join(
                labels.select(
                    F.col("node").alias("nbr"), "label"
                ),
                "nbr",
            )
            .groupBy("node", "label")
            .agg(
                F.count(F.lit(1)).alias("__c"),
                # 1 iff this label group got the node's SELF-vote,
                # i.e. label == the node's round-(r−1) label — the
                # churn signal, carried by the aggregation itself
                F.max(
                    F.when(F.col("nbr") == F.col("node"), 1).otherwise(0)
                ).alias("__self"),
            )
        )
        ranked = votes.withColumn("__rk", F.row_number().over(w)).filter(
            F.col("__rk") == 1
        )
        if final and audit_churn:
            return ranked.select(
                "node", "label", (F.col("__self") == 0).alias("changed")
            )
        labels = ranked.select("node", "label").localCheckpoint(eager=True)
    return labels
