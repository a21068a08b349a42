"""Connected components over a pair graph (dedup clustering / co-occurrence
grouping).

A dedup pipeline does not stop at near-dup PAIRS: to drop duplicates it
needs the transitive closure — if a~b and b~c then {a, b, c} is one
duplicate group even when (a, c) was never emitted as a pair (chains are
common under banded LSH: each band catches a different overlap). The
operator here labels every node with the minimum node id of its component;
``keep = (node = cluster_id)`` is then the canonical
one-representative-per-group rule, matching ``q_llm_exact_dedup``'s
``MIN(doc_id) AS keep_doc_id`` convention.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14) — the standard
shuffle-based CC formulation:

- **large-star**: every node points its larger neighbors at the smallest
  member of its neighborhood (incl. itself);
- **small-star**: every node rewires its smaller-or-equal neighbors (and
  itself) to their minimum.

Both steps are ONE groupBy(node) + ONE join per round, edge count never
grows beyond the input edge count (after distinct), and the edge set
converges to disjoint stars rooted at each component's min in
O(log² n) rounds (in practice 2–4 on dedup-shaped graphs). That is the
100 TB story: no driver-side graph state at all — the driver holds only a
(count, checksum) pair per round for the convergence test; labels,
frontier, and edges all stay distributed. Compare GraphFrames'
implementation of the same paper; re-derived here from the published
algorithm over plain DataFrame ops.

Per-round ``localCheckpoint`` truncates the loop-carried lineage (the
iterative-plan discipline shared with ml/bpmf.py's ``_checkpoint``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bayesiandatafusion_jl_spark.catalog import load_table
from bayesiandatafusion_jl_spark.functions.exprs import ordered_pairs
from bayesiandatafusion_jl_spark.registry import register
from bayesiandatafusion_jl_spark.session import checkpoint_df


def connected_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_rounds: int = 30
) -> DataFrame:
    """Label each node with the min node id of its connected component.

    Input: undirected edges as (src, dst) pairs, any orientation,
    duplicates allowed. Output: ``(node, cluster_id)``, one row per
    distinct node that appears in at least one edge (singletons never
    enter a pair frame; callers wanting them add a left join + coalesce
    to self). Deterministic — no randomness anywhere.
    """
    edges = (
        pairs.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    prev_edges = None
    converged = False
    for _ in range(max_rounds):
        # large-star: m(u) = min over N(u) ∪ {u}; larger neighbors v > u
        # re-point to m(u)
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", "u").alias("m"))
        )
        large = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: orient (max, min); every smaller neighbor and u
        # itself re-point to the minimum of the down-neighborhood
        down = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        dmins = down.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            down.join(dmins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(dmins.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        edges = small
        # convergence: edge set unchanged (count + order-independent
        # checksum) — two scalars on the driver, nothing graph-sized
        # bit_xor, not sum: order-independent AND overflow-free under ANSI
        # (a sum of 64-bit hashes overflows long)
        row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            # a signature match is necessary but not sufficient: an xor of
            # 64-bit hashes canceling across equal-size DIFFERING edge sets
            # would silently return wrong labels. Counts already match, so
            # a one-sided exceptAll proves set equality (both frames are
            # distinct by construction) — paid only once, on the candidate
            # fixed point, never per round.
            if edges.exceptAll(prev_edges).isEmpty():
                converged = True
                break
            # checksum collision: not actually a fixed point — keep going
        prev_sig = sig
        prev_edges = edges
    if not converged:
        # alternating stars converge in O(log² n) rounds — hitting this
        # bound means the caller's graph is astronomically deep or the
        # bound was lowered; returning unconverged labels would be WRONG
        # labels, so fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # converged: disjoint stars (child → component-min root)
    return (
        edges.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
        .union(edges.select(F.col("v").alias("node"), F.col("v").alias("cluster_id")))
        .distinct()
    )


@register(
    "q_graph_components",
    oracle="""
    WITH RECURSIVE co AS (
      SELECT pa, pb, COUNT(*) AS n_orders
      FROM (
        SELECT DISTINCT a.l_orderkey AS o, a.l_partkey AS pa, b.l_partkey AS pb
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      )
      GROUP BY pa, pb
      HAVING COUNT(*) >= 3
    ),
    edges AS (
      SELECT pa AS u, pb AS v FROM co
      UNION
      SELECT pb AS u, pa AS v FROM co
    ),
    reach(node, lbl) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node
    ),
    lab AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
    sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab
           GROUP BY cluster_id)
    SELECT l.node, l.cluster_id, s.cluster_size
    FROM lab l JOIN sz s USING (cluster_id)
    """,
    tags=("graph-cc",),
)
def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components, driver-checked against a DuckDB RECURSIVE-CTE
    transitive closure. Graph: parts co-ordered in ≥ 3 distinct orders
    (the lineitem self-join on l_orderkey) — at sf0.01 that is ~60
    components with genuine chain structure (sizes 2–5, NOT cliques), so
    multi-hop label propagation is actually exercised; the dedup-flavored
    instantiation over the near-dup pair graph is ``q_llm_dedup_clusters``
    below (demoted: its graph degenerates to one dense blob on this
    corpus, which checks closure but not chains).

    The co-occurrence build: groupBy(order) gathers each order's DISTINCT
    part set, the ordered pairs expand in-task from the sorted list, and
    one more agg counts distinct co-orders per pair; a lineitem self-join
    on l_orderkey would shuffle the fact table twice for the identical
    pair set. The ``ordered_pairs`` (flatten/transform) expansion is safe
    HERE because the list width is bounded by ORDER SIZE (≤7 lineitems) —
    unbounded-width posting lists must use the two-level explode instead
    (see ``lsh_candidate_pairs``). HAVING keeps the graph sparse, which
    is exactly how a real item-item graph is thresholded at scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    co = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") > 1)
        .select(F.explode(F.expr(ordered_pairs("ps", "pa", "pb"))).alias("p"))
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
    )
    lab = connected_components(co, src="pa", dst="pb")
    sz = lab.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return lab.join(F.broadcast(sz), "cluster_id").select(
        "node", "cluster_id", "cluster_size"
    )


@register(
    "q_llm_dedup_clusters",
    oracle="""
    WITH RECURSIVE tok AS (
      SELECT DISTINCT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS token
      FROM documents WHERE doc_id % 5 = 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM common
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(node, lbl) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node
    ),
    lab AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach
            GROUP BY node),
    sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab
           GROUP BY cluster_id)
    SELECT l.doc_id, l.cluster_id, s.cluster_size,
           l.doc_id = l.cluster_id AS keep
    FROM lab l JOIN sz s USING (cluster_id)
    """,
    tags=("J2", "graph-cc"),
    demoted=True,
)
def q_llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: transitive closure of ``q_llm_near_dedup``'s
    pair graph, labeled by component-min, plus the keep/drop flag a dedup
    pipeline acts on (keep = the component's min doc_id — the same
    representative rule as exact dedup's MIN(doc_id)).

    Demoted: on this corpus the jaccard ≥ 0.5 pair graph is one dense
    97-doc component, so it verifies closure-on-a-blob only; the
    driver-facing CC query is ``q_graph_components`` (real multi-component
    chain graph). Both run the same ``connected_components``.
    """
    from bayesiandatafusion_jl_spark.functions.dedup import q_llm_near_dedup

    pairs = q_llm_near_dedup(spark, sf_dir)
    lab = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )
    sz = lab.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return lab.join(F.broadcast(sz), "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )


def dedup_keep_representatives(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The end of the dedup pipeline: drop every document that belongs to a
    duplicate cluster but is not its representative (= component-min id).

    ``docs`` is any frame carrying ``id_col``; ``pairs`` is a near-dup pair
    frame (doc_a, doc_b) from ANY of the pair generators (exact Jaccard,
    MinHash-LSH, SimHash, embedding-cosine). Composition:
    ``connected_components`` labels the pair graph, and a left anti join
    removes the non-representative members — documents in no pair are
    untouched (singleton components never enter the pair frame). The drop
    list is bounded by the duplicate count, so the anti join broadcasts in
    the common case and degrades to a shuffle join gracefully when it
    cannot (no forced hint — Spark sizes it).
    """
    labels = connected_components(pairs)
    drop = labels.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")


def pagerank(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    damping: float = 0.85,
    n_iter: int = 10,
    teleport: DataFrame | None = None,
    tol: float | None = None,
    stats: dict | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """(node, rank): PageRank (Brin & Page 1998) by power iteration over
    a DIRECTED edge frame — fixed iteration count, so the result is a
    pure deterministic function of the graph.

    Determinism split: the only order-SENSITIVE operations — the
    per-node gather and the dangling-mass total — are EXACT
    ``decimal(38,18)`` sums, so the result is bit-identical at any
    partition count and merge order (the matview-partials discipline).
    Row-wise scalar arithmetic (rank/degree, the damping update) runs in
    double and is rounded back to ``decimal(28,18)`` per row — per-row
    ops are deterministic regardless of partitioning, and double keeps
    ~1e-16 relative error where Spark's decimal division/multiplication
    type rules would silently crush the scale to 6. Dangling nodes (no
    out-edges) redistribute their mass uniformly, the standard
    correction that keeps total rank at 1 instead of leaking it.

    ``teleport`` (r12): a (node) frame of seed nodes makes this
    PERSONALIZED PageRank (Page et al. 1999 §6 / Haveliwala 2002 —
    public papers): the restart distribution puts 1/|seeds| on each seed
    (seeds outside the graph are ignored; the distribution renormalizes
    over the ones present) and dangling mass redistributes to the SEEDS,
    not uniformly — rank mass concentrates in the seeds' neighborhoods,
    the graph-proximity primitive behind related-item recommendation.
    ``teleport=None`` is the uniform distribution, i.e. plain PageRank.

    ``tol`` (r13, convergence stop): when set, each round also computes
    the L1 delta Σ|rank − prev_rank| — an exact decimal agg over the
    state frame the round materializes anyway — and the loop stops once
    it drops below ``tol``. ``n_iter`` becomes the BUDGET, not the
    count: at scale rank typically converges long before a
    conservatively-chosen budget, and every skipped round is a whole
    join+shuffle saved. ``tol=None`` (default) keeps the fixed-iteration
    mode — a pure deterministic function of the graph, bit-identical
    across runs, which the convergence mode trades away (it adds one
    driver-visible aggregate per round). ``stats``: optional dict the
    call fills with {'iterations': rounds_actually_run} — the
    observability hook for the stop.

    ``weight_col`` (r13, weighted PageRank): an edge-weight column makes
    each node spread rank proportionally to its out-edge weights —
    contribution = rank · w / Σ_out w — which is what a co-occurrence or
    click graph actually wants (an edge seen 500 times should pull 500×
    the rank of an edge seen once). Parallel edges SUM their weights;
    weights must be strictly positive (guarded in-plan — a zero-weight
    sink would silently leak rank). Per-node weight totals are exact
    decimal sums, so partition invariance holds exactly like the
    unweighted form; ``weight_col=None`` is the classic uniform spread.

    Plan per iteration: one broadcast-sized degree join is NOT needed —
    out-degrees are joined once before the loop and ride along; each
    round is ONE join (ranks → edges on src, shuffle on the edge
    partitioning key) + ONE groupBy(dst) sum. The dangling-mass
    aggregate (an extra action + 1-row cross join per round) is paid
    ONLY when the graph actually has dangling nodes — checked once
    before the loop, and symmetrized graphs (every undirected
    instantiation) skip it entirely. ``localCheckpoint`` truncates the
    loop-carried lineage every ``ckpt_every`` rounds rather than every
    round (each eager checkpoint is its own job; the plan grows only a
    join+agg per round, so a small interval keeps planning cheap while
    halving the job count — the iterative-plan discipline shared with
    ``connected_components`` and ml/bpmf.py). Nothing graph-sized ever
    reaches the driver.
    """
    if weight_col is None:
        e = edges.select(
            F.col(src).cast("long").alias("src"),
            F.col(dst).cast("long").alias("dst"),
        ).distinct()
    else:
        # parallel edges sum; exact decimal sums keep the weighted form
        # partition-invariant; strictly-positive guard rides in-plan
        # the guard rides INSIDE the weight expression (the rag.py
        # lineage-encode pattern) — a standalone asserted column would be
        # pruned away by Catalyst and never evaluate
        guard = F.assert_true(
            F.col(weight_col) > 0,
            F.lit("pagerank: edge weights must be > 0"),
        )
        w = F.when(guard.isNull(), F.col(weight_col)).cast("decimal(38,12)")
        e = (
            edges.select(
                F.col(src).cast("long").alias("src"),
                F.col(dst).cast("long").alias("dst"),
                w.alias("w"),
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").cast("decimal(38,12)").alias("w"))
        )
    # materialize the edge frame ONCE (r15 optimization): every one of the
    # n_iter rounds joins against `e`, and so do the nodes/degree builds —
    # without this the whole upstream edge construction (for the co-
    # occurrence graphs: a 2-shuffle collect_set + pair-explode build,
    # evaluated TWICE per reference through the symmetrizing union) re-ran
    # per round (~12 evaluations for n_iter=10; guide §2.4 "remove shuffles
    # outright" / §5 reuse rule). checkpoint_df, not bare localCheckpoint,
    # per the repo-wide rule: the persist half grounds sizeInBytes.
    e = checkpoint_df(e)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(None).cast("decimal(28,18)"))
    if weight_col is None:
        deg = e.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        )
    else:
        deg = e.groupBy(F.col("src").alias("node")).agg(
            F.sum("w").cast("double").alias("deg")
        )
    # teleport distribution t rides the state frame like deg does: t_i =
    # 1/|seeds| on seeds (0 elsewhere), or the uniform 1/n when no seed
    # frame is given; the initial rank IS the teleport distribution
    if teleport is not None:
        seeds = (
            teleport.select(F.col("node").cast("long").alias("node"))
            .distinct()
            .join(nodes, "node", "left_semi")
            .localCheckpoint()
        )
        n_seeds = seeds.count()
        if n_seeds == 0:
            raise ValueError(
                "pagerank: no teleport seed is a node of the graph"
            )
        t_frame = nodes.join(
            seeds.withColumn("t", F.lit(1.0 / n_seeds)), "node", "left"
        ).select("node", F.coalesce(F.col("t"), F.lit(0.0)).alias("t"))
    else:
        t_frame = nodes.select("node", F.lit(1.0 / n).alias("t"))
    # out-degree rides with the rank frame so the loop never re-joins it;
    # deg is null for dangling nodes
    state = (
        t_frame.join(deg, "node", "left")
        .select(
            "node",
            "deg",
            "t",
            F.col("t").cast("decimal(28,18)").alias("rank"),
        )
        .localCheckpoint()
    )
    has_dangling = state.filter(F.col("deg").isNull()).limit(1).count() > 0
    # with dangling nodes each round runs its own mass aggregate over
    # `state`, so an unmaterialized state would recompute the tail of the
    # lineage once per round — checkpoint every round there; without
    # dangling nodes the only actions are the checkpoints themselves
    # the convergence mode runs a per-round action (the delta agg), so an
    # unmaterialized state would recompute the lineage tail each round —
    # checkpoint every round there, like the dangling path
    ckpt_every = 1 if (has_dangling or tol is not None) else 3
    rounds_run = 0
    for i in range(n_iter):
        share = F.col("rank").cast("double") / F.col("deg")
        if weight_col is not None:
            share = (
                F.col("rank").cast("double")
                * F.col("w").cast("double")
                / F.col("deg")
            )
        contrib = (
            state.filter(F.col("deg").isNotNull())
            .join(e, state["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                share.cast("decimal(28,18)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("gathered"))
        )
        keep = ["node", "deg", "t"] + (
            [F.col("rank").alias("prev_rank")] if tol is not None else []
        )
        nxt = state.select(*keep).join(contrib, "node", "left")
        gathered_d = F.coalesce(F.col("gathered").cast("double"), F.lit(0.0))
        if has_dangling:
            dangling = state.filter(F.col("deg").isNull()).agg(
                F.coalesce(
                    F.sum("rank"), F.lit(0).cast("decimal(38,18)")
                ).alias("dang")
            )
            nxt = nxt.crossJoin(F.broadcast(dangling))
            # dangling mass restarts by the teleport distribution (uniform
            # t = 1/n reproduces the plain-PageRank correction exactly)
            gathered_d = gathered_d + F.col("dang").cast("double") * F.col("t")
        state = nxt.select(
            "node",
            "deg",
            "t",
            *([F.col("prev_rank")] if tol is not None else []),
            (
                F.lit(1.0 - damping) * F.col("t")
                + F.lit(damping) * gathered_d
            )
            .cast("decimal(28,18)")
            .alias("rank"),
        )
        if (i + 1) % ckpt_every == 0 or i == n_iter - 1:
            state = state.localCheckpoint()
        rounds_run = i + 1
        if tol is not None:
            # exact decimal L1 delta over the state frame this round
            # materialized anyway (the checkpoint above IS the action
            # that paid for the data; this agg re-reads the cached rows)
            delta = state.agg(
                F.coalesce(
                    F.sum(
                        F.abs(
                            F.col("rank") - F.col("prev_rank")
                        ).cast("decimal(38,18)")
                    ),
                    F.lit(0).cast("decimal(38,18)"),
                ).alias("d")
            ).collect()[0]["d"]
            state = state.drop("prev_rank")
            if float(delta) < tol:
                break
    if stats is not None:
        stats["iterations"] = rounds_run
    return state.select("node", "rank")


@register(
    "q_graph_pagerank",
    oracle=None,  # iterative fixed-point — no SQL formulation; exactness
    # vs a numpy power iteration + invariants gated in tests/test_graph.py
    tags=("graph-pagerank",),
    demoted=True,
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the same part co-occurrence graph as
    ``q_graph_components`` (symmetrized, so every node has out-edges),
    10 decimal-exact iterations, top-ranked parts first — the
    "importance" readout an item graph actually serves (which parts
    anchor the co-purchase structure)."""
    li = load_table(spark, sf_dir, "lineitem")
    co = checkpoint_df(
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") > 1)
        .select(F.explode(F.expr(ordered_pairs("ps", "pa", "pb"))).alias("p"))
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )
    # co checkpointed (r15): the symmetrizing union references it twice,
    # so pagerank's own edge materialization would otherwise run the
    # 2-shuffle co-occurrence build twice in one job (guide §2.4)
    edges = co.select(F.col("pa").alias("u"), F.col("pb").alias("v")).union(
        co.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    pr = pagerank(edges, n_iter=10)
    return pr.select(
        "node", F.col("rank").cast("double").alias("rank")
    ).orderBy(F.desc("rank"), F.asc("node"))


@register(
    "q_graph_ppr",
    oracle=None,  # iterative fixed point — invariants + seed-locality
    # gated in tests/test_graph.py (uniform-teleport ≡ plain PageRank)
    tags=("graph-pagerank", "ppr"),
    demoted=True,
)
def q_graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the part co-occurrence graph, seeded by
    the three smallest part ids in the graph — the related-item readout
    (which parts sit closest to the seed set in co-purchase structure).
    Output adds ``is_seed`` so the locality claim is inspectable."""
    li = load_table(spark, sf_dir, "lineitem")
    co = checkpoint_df(
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") > 1)
        .select(F.explode(F.expr(ordered_pairs("ps", "pa", "pb"))).alias("p"))
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )
    # co checkpointed (r15): the union + the seed frame reference it
    # multiple times (see q_graph_pagerank)
    edges = co.select(F.col("pa").alias("u"), F.col("pb").alias("v")).union(
        co.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    seeds = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
        .orderBy("node")
        .limit(3)
    )
    pr = pagerank(edges, n_iter=10, teleport=seeds)
    return pr.join(
        F.broadcast(seeds.withColumn("is_seed", F.lit(True))), "node", "left"
    ).select(
        "node",
        F.col("rank").cast("double").alias("rank"),
        F.coalesce(F.col("is_seed"), F.lit(False)).alias("is_seed"),
    ).orderBy(F.desc("rank"), F.asc("node"))
