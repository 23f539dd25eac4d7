"""Connected components — cluster formation over near-duplicate pairs.

The dedup operators (minhash / simhash / ngram-jaccard) emit PAIRS; dropping
duplicates needs CLUSTERS (transitive closure) so exactly one canonical
document survives per group. Closure is iterative — outside a single SQL
statement's reach — so this implements the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", ACM SoCC 2014): converges in O(log² n) rounds, each round is two
groupBy+join pairs co-partitioned on the node key, and the edge set never
grows beyond the input — the published shape for trillion-edge graphs.

Driver involvement is one tiny convergence checksum per round (count +
hash-sum, two numbers); a per-round checkpoint (``_caching.share``)
truncates the lineage so the plan doesn't double each iteration — local by
default, and automatically RELIABLE (``.checkpoint()`` to the
fault-tolerant store) once ``spark.sparkContext.setCheckpointDir`` is set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._caching import share


def _large_star(e_down: DataFrame, small: bool = False) -> DataFrame:
    """Connect every neighbor v > u to m(u) = min(Γ(u) ∪ {u}).

    ``e_down`` is a DEDUPED down-edge set (v < u on every row) — the loop
    invariant both stars preserve. The symmetric neighborhood view is a
    shuffle-free union of the two orientations: they are DISJOINT row
    sets (one has v < u, the other v > u), so no distinct is needed —
    the per-round ``_sym`` union+distinct exchange this replaces was pure
    overhead (min-aggregations are duplicate-insensitive anyway, and the
    up-orientation rows are exactly one row per unordered edge, which is
    all the v > u emission below consumes).

    No trailing distinct: two sources can emit the same (v, m), but the
    consumer ``_small_star`` is duplicate-tolerant and ends in the
    round's one distinct.

    ``small``: the loop passes True when the driver-known edge count of
    this round's input fits ``rows_per_partition`` — the whole graph is
    one partition's worth of data, so the min-per-node is computed with a
    window over the SAME exchange the neighbor rows ride (one exchange,
    no join) instead of groupBy+join (two exchanges). The window form is
    NOT skew-safe in general (a hot node's neighborhood lands on one
    task, and AQE skew-splitting covers joins, not windows), so big
    rounds keep the groupBy+join+AQE path; as a 100 TB graph collapses
    toward its star-forest fixpoint the later, tiny rounds switch to the
    low-latency form. Both forms emit the same rows.
    """
    nbrs = e_down.union(
        e_down.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    if small:
        w = Window.partitionBy("u")
        return (
            nbrs.withColumn(
                "m", F.least(F.min("v").over(w), F.col("u"))
            )
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("u", "mn").alias("m"))
    return (
        nbrs.where(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        # output rows have v = m(u) <= u < old-v = new-u: down-edges again
    )


def _small_star(e_down: DataFrame, small: bool = False) -> DataFrame:
    """Within each node's smaller neighborhood, connect all to the minimum.

    ``e_down`` holds only down-edges (v < u), so each node's SMALLER
    symmetric neighbors are exactly its out-edges here — no
    symmetrization needed at all (an up-orientation row (b, a) with
    a > b contributes a to Γ(b) as a LARGER neighbor, which small-star
    ignores). Duplicate input rows are tolerated: they cannot change the
    min and the trailing distinct clears them from the output.

    ``small``: window-over-one-exchange form for driver-known-small
    rounds (see ``_large_star``); the (u, m) rows it unions carry
    per-edge duplicates where the groupBy form had one row per u, but
    the trailing distinct makes the output sets identical."""
    if small:
        w = Window.partitionBy("u")
        d = e_down.withColumn("m", F.min("v").over(w))
        rewired = d.select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).where(F.col("u") != F.col("v"))
        return rewired.union(
            d.select(F.col("u"), F.col("m").alias("v"))
        ).distinct()
    mins = e_down.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        e_down.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    return rewired.union(mins.select(F.col("u"), F.col("m").alias("v"))).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
    rows_per_partition: int = 1_000_000,
    stats: dict | None = None,
    edges_deduped: bool = False,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the component
    id is the smallest node id in the component.

    Alternating large-star/small-star until the edge set reaches its fixpoint
    (a forest of stars: every edge points child → component root). The
    convergence probe is an aggregate checksum — two longs per round cross
    the driver, never data — and doubles as a free cardinality estimate: each
    round's edge set is coalesced to ``count / rows_per_partition``
    partitions, so a near-dup graph that shrinks to thousands of edges stops
    paying 100 TB-scale task-scheduling overhead (a round is ~10 stages;
    at the parent's partitioning that was the dominant cost on small graphs),
    while a graph that stays huge keeps its parallelism.

    Pass ``stats={}`` to get ``stats["rounds"]`` back — the observed
    round count (adversarial-topology tests assert the O(log n) bound).

    Edges with a NULL endpoint are excluded (explicitly — the inequality
    predicate would drop them anyway, but silently): an edge to an
    unknown node connects nothing, and its non-NULL endpoint appears in
    the output only if some complete edge mentions it.

    ``edges_deduped=True`` is the caller's guarantee that the input is
    already one row per undirected edge with distinct non-null endpoints
    (the near-dup detectors' pair tables are exactly that: id_a < id_b,
    verified, dropDuplicates'd). The loop's initial dedup is then skipped
    — at corpus scale that removes a full shuffle+aggregate of the edge
    set before round 1 (orientation stays: it is a narrow projection).
    """
    e = (
        # orient every edge DOWN (u > v) before the initial dedup: the loop
        # invariant (deduped down-edge set) that lets both star operations
        # build their neighborhood views with a shuffle-free union instead
        # of a per-round symmetrize+distinct exchange. The initial distinct
        # also collapses (a,b)/(b,a) input pairs to one row, which the old
        # per-round _sym had been re-deduplicating every round.
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
    )
    if not edges_deduped:
        e = e.distinct()
    # checkpoint once: the input is typically an expensive detector plan
    # (minhash/simhash), and round 0 would otherwise replay it per lineage
    # re-walk. LAZY: the count below materializes it, so the detector runs
    # exactly once but costs no standalone job (one driver action per
    # round total — at sf-scale the loop was dominated by job-launch
    # overhead, two actions per round, not by the tiny shuffles).
    e = share(e)

    def _parts_for(n: int) -> int:
        return max(1, min(n // rows_per_partition + 1, 4096))

    # Materialize the (lazily checkpointed) input and learn its size in ONE
    # job — the count rides the materialization the first round would have
    # paid anyway, and knowing n BEFORE round 1 lets the loop pick the
    # round-1 operator form and coalesce target instead of flying blind at
    # the session default until the first probe returns.
    n_edges = e.count()
    parts = _parts_for(n_edges)
    small = n_edges <= rows_per_partition
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        e = _small_star(_large_star(e, small), small)
        e = e.coalesce(parts)  # narrow — merges, never reshuffles
        # Lazy: the convergence action right below materializes the
        # checkpoint (the probe runs over e's own RDD, so the full rows
        # persist as a side effect) — one job per round, not two.
        e = share(e)
        # Convergence: small_star emits only down-edges (child > parent),
        # and a down-edge set is a star forest — the algorithm's fixpoint —
        # iff no node is both a child (left) and a parent (right). Testing
        # that DIRECTLY detects the fixpoint on the round that REACHES it,
        # where the previous two-long checksum needed one extra full
        # confirm round to observe equality (Kiveris et al. §3: both star
        # operations leave a star forest unchanged, so breaking here is
        # exactly the checksum fixpoint, one round sooner).
        if small:
            # Small regime is STICKY (the edge set never grows beyond the
            # input — Kiveris et al.), so the next round's coalesce target
            # stays 1 partition's worth and the probe doesn't need the
            # edge count at all: a left-semi join of children against the
            # parent set, isEmpty() — the broadcast build replaces the
            # agg probe's explode + groupBy exchange, and the take(1)
            # short-circuits on the first violation. Materializing e's
            # checkpoint still rides this one action.
            bad = not e.join(
                e.select(F.col("v").alias("u")), "u", "left_semi"
            ).isEmpty()
            if not bad:
                break
        else:
            # Big rounds keep the aggregate probe: one groupBy on the node
            # id — same key distribution as the round's own shuffles — and
            # its edge count sizes the next round's coalesce.
            probe = (
                e.select(
                    F.explode(
                        F.array(
                            F.struct(
                                F.col("u").alias("n"),
                                F.lit(1).alias("l"),
                                F.lit(0).alias("r"),
                            ),
                            F.struct(
                                F.col("v").alias("n"),
                                F.lit(0).alias("l"),
                                F.lit(1).alias("r"),
                            ),
                        )
                    ).alias("s")
                )
                .select("s.*")
                .groupBy("n")
                .agg(F.sum("l").alias("ls"), F.max("r").alias("rr"))
            )
            row = probe.agg(
                F.sum("ls").alias("n_edges"),
                F.sum(
                    F.when(
                        (F.col("ls") > 0) & (F.col("rr") > 0), 1
                    ).otherwise(0)
                ).alias("bad"),
            ).collect()[0]
            if not row.bad:  # star forest (NULL n_edges ⇒ empty: done too)
                break
            n_edges = row.n_edges or 0
            parts = _parts_for(n_edges)
            small = n_edges <= rows_per_partition
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")
    if stats is not None:
        stats["rounds"] = rounds

    # At the fixpoint the down-edge set is a star forest over EXACTLY the
    # input's node set: both star operations preserve the node inventory
    # (large_star — a node with a smaller neighbor w re-emerges as a child
    # of m(w) via w's row, a locally-minimal node re-emerges as the parent
    # m(u) of its larger neighbors, a locally-maximal node as a child in
    # each smaller neighbor's row; small_star — every u survives via its
    # (u, m) row and every v either rewires to (v, m) or IS m and survives
    # as the parent), and a size-m component's star has m-1 edges, so no
    # component ever empties. The output therefore derives from the final
    # edge set alone: children label with their (unique at fixpoint; min
    # for max_rounds safety) parent, parents label with themselves — no
    # separate node inventory off the input, no final left join (two
    # exchanges and a join removed from every invocation; at corpus scale
    # the inventory was a full union+distinct pass over the edge set).
    labels = e.groupBy("u").agg(F.min("v").alias("component")).select(
        F.col("u").alias("node"), "component"
    )
    roots = e.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    return labels.union(roots)


def keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    edges_deduped: bool = False,
) -> DataFrame:
    """Drop every near-duplicate except one canonical survivor per cluster
    (the smallest id). Docs not in any pair pass through untouched — the
    anti-join only shuffles the (tiny) non-canonical id set against the
    corpus, broadcast when it fits."""
    comp = connected_components(
        pairs, src=id_a, dst=id_b, edges_deduped=edges_deduped
    )
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    edges_deduped: bool = False,
) -> DataFrame:
    """``keep_canonical`` with a POLICY: per near-dup cluster keep the row
    with the highest ``score_col`` (ties → smallest id) instead of blindly
    the smallest id — quality-aware survivor selection, the step that turns
    "drop duplicates" into "drop the WORSE copies". ``docs`` must carry
    ``score_col``; docs in no pair pass through untouched. The ranking
    window runs only over clustered docs (the component table is the dup
    set, a vanishing fraction of the corpus), so its shuffle is
    proportional to the duplicates, never the corpus."""
    from pyspark.sql import Window

    comp = connected_components(
        pairs, src=id_a, dst=id_b, edges_deduped=edges_deduped
    )
    scored = comp.join(
        docs.select(
            F.col(id_col).alias("node"), F.col(score_col).alias("__s")
        ),
        "node",
    )
    w = Window.partitionBy("component").orderBy(F.desc("__s"), F.col("node"))
    losers = (
        scored.select("node", F.row_number().over(w).alias("__rn"))
        .where(F.col("__rn") > 1)
        .select(F.col("node").alias(id_col))
    )
    return docs.join(losers, id_col, "left_anti")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank with uniform teleport and dangling-mass
    redistribution — ``(node, pr)`` after a FIXED number of power
    iterations (deterministic, so an unrolled SQL oracle can replay it).

    Each iteration is exactly one shuffle: ranks join the out-normalized
    edge list on the source key, contributions aggregate on the
    destination key (map-side combined). The node count and the dangling
    mass ride as broadcast one-row aggregates — no driver-side scalars, no
    collect. At 100 TB: pre-partition ``edges`` by ``src`` once and every
    iteration's join co-locates; iterations are a linear chain, so
    checkpoint every ~5 rounds to truncate lineage (same contract as
    connected_components).

    The fixed-iteration form is the batch twin of an incremental-update
    scheme; for rank CONVERGENCE run more rounds — 3 is enough for the
    short-random-walk signal ranking training-corpus link graphs by
    centrality.
    """
    w = F.col(weight) if weight else F.lit(1.0)
    # drop NULL-endpoint edges and non-positive/NULL weights: a weight
    # that can't carry probability mass contributes nothing, and a src
    # whose weights sum to 0 would make the out-normalization divide by
    # zero (a job abort under ANSI mode)
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d"), w.alias("__w")
    ).filter(
        F.col("__s").isNotNull()
        & F.col("__d").isNotNull()
        & (F.col("__w") > 0)
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
    )
    n_row = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    outsum = e.groupBy("__s").agg(F.sum("__w").alias("__wout"))
    enorm = e.join(outsum, "__s").select(
        "__s", "__d", (F.col("__w").cast("double") / F.col("__wout")).alias("__p")
    )
    srcs = outsum.select(F.col("__s").alias("node"))

    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("pr")
    )
    for _ in range(iterations):
        contrib = (
            ranks.join(enorm, ranks["node"] == enorm["__s"])
            .groupBy(F.col("__d").alias("node"))
            .agg(F.sum(F.col("pr") * F.col("__p")).alias("__c"))
        )
        dangling = ranks.join(srcs, "node", "left_anti").agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("__dm")
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_row))
            .crossJoin(F.broadcast(dangling))
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__c"), F.lit(0.0))
                        + F.col("__dm") / F.col("__n")
                    )
                ).alias("pr"),
            )
        )
    return ranks
