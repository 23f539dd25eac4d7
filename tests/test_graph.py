"""Connected components (alternating star) vs a union-find reference."""

from __future__ import annotations

from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators import (
    graph,
)


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    out: dict[int, int] = {}
    for n in parent:
        root = find(n)
        out[n] = root
    # root labels are already the component minimum because we always union
    # the larger root under the smaller
    return out


def _check(spark, edges: list[tuple[int, int]]) -> None:
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.component
        for r in graph.connected_components(df).collect()
    }
    assert got == _uf_components(edges)


def test_cc_two_triangles_and_bridge(spark):
    _check(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10)])


def test_cc_long_chain(spark):
    """A path graph needs multiple star rounds — exercises the iteration."""
    _check(spark, [(i, i + 1) for i in range(40)])


def test_cc_star_and_singletons(spark):
    _check(spark, [(100, i) for i in range(5)] + [(7, 8), (20, 21)])


def test_cc_pseudorandom(spark):
    """Deterministic pseudo-random graph, including duplicate and reversed
    edges, against union-find."""
    edges = []
    x = 7
    for _ in range(120):
        x = (x * 1103515245 + 12345) % (1 << 31)
        a = x % 60
        x = (x * 1103515245 + 12345) % (1 << 31)
        b = x % 60
        if a != b:
            edges.append((a, b))
    edges += [(b, a) for a, b in edges[:10]]
    _check(spark, edges)


def test_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 6)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in graph.keep_canonical(docs, pairs).collect()
    )
    # {1,3,5} -> keep 1; {2,6} -> keep 2; others untouched
    assert kept == [0, 1, 2, 4, 7]


def test_cc_adversarial_chain_logarithmic_rounds(spark):
    """Worst-case diameter: a 2048-node path collapses in O(log n) rounds
    (Kiveris et al. bound), not O(diameter) — the property that makes the
    alternating-star algorithm usable on billion-node near-dup graphs."""
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.graph import (
        connected_components,
    )

    n = 2048
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    stats: dict = {}
    comp = connected_components(edges, stats=stats)
    rows = comp.collect()
    assert len(rows) == n
    assert {r.component for r in rows} == {0}
    # log2(2048)=11; each alternating round roughly squares star reach.
    # +fixpoint-detection round; bound generous but far below diameter.
    assert stats["rounds"] <= 16, stats


def test_cc_adversarial_star_of_stars(spark):
    """Hub-of-hubs (heavy skew: one node with 512 spokes, each spoke a
    sub-hub of 8): converges in a handful of rounds and one component."""
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.graph import (
        connected_components,
    )

    edges = []
    nid = 1
    for s in range(512):
        hub = nid
        nid += 1
        edges.append((0, hub))
        for _ in range(8):
            edges.append((hub, nid))
            nid += 1
    df = spark.createDataFrame(edges, "src long, dst long")
    stats: dict = {}
    comp = connected_components(df, stats=stats)
    rows = comp.collect()
    assert len(rows) == nid
    assert {r.component for r in rows} == {0}
    assert stats["rounds"] <= 6, stats


def test_pagerank_symmetric_cycle(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.graph import (
        pagerank,
    )

    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    got = {r.node: r.pr for r in pagerank(e, iterations=5).collect()}
    assert abs(got["a"] - 0.5) < 1e-12 and abs(got["b"] - 0.5) < 1e-12


def test_pagerank_dangling_mass_hand_computed(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.graph import (
        pagerank,
    )

    # a -> b, b dangling. After one iteration from (.5, .5):
    # dangling mass .5 redistributes; pr(a)=.15/2+.85*(.5/2)=0.2875,
    # pr(b)=.15/2+.85*(.5+.5/2)=0.7125. Total mass stays 1.
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r.node: r.pr for r in pagerank(e, iterations=1).collect()}
    assert abs(got["a"] - 0.2875) < 1e-12
    assert abs(got["b"] - 0.7125) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-12


def test_pagerank_weights_shift_rank(spark):
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.graph import (
        pagerank,
    )

    # c splits its vote 9:1 toward a; a and b both return to c.
    e = spark.createDataFrame(
        [("c", "a", 9.0), ("c", "b", 1.0), ("a", "c", 1.0), ("b", "c", 1.0)],
        "src string, dst string, w double",
    )
    got = {r.node: r.pr for r in pagerank(e, weight="w", iterations=8).collect()}
    assert got["a"] > got["b"]
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_null_edges_and_zero_weight_pagerank(spark):
    """NULL-endpoint edges are excluded from both operators, and zero or
    NULL weights cannot make pagerank's out-normalization divide by zero
    (regression: ANSI abort)."""
    from pyspark.sql import functions as F  # noqa: F401

    edges = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None)], "src long, dst long"
    )
    comp = {r.node for r in graph.connected_components(edges).collect()}
    assert comp == {1, 2}

    weighted = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0), (3, 1, 0.0), (3, 2, 0.0), (4, 1, None)],
        "src long, dst long, w double",
    )
    pr = graph.pagerank(weighted, weight="w", iterations=2).collect()
    assert all(r.pr is not None and r.pr == r.pr for r in pr)  # finite, no abort


def test_keep_best_policy(spark):
    """Per-cluster argmax(score, then smallest id): the best copy
    survives, singletons pass through, ties break to the smaller id."""
    from aws_autonomous_driving_data_lake_mwaa_ros_bag_image_extraction_pipeline_spark.operators.graph import (
        keep_best,
    )

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5), (7, 0.4), (8, 0.4), (9, 0.1)],
        "doc_id long, score double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in keep_best(docs, pairs, "score").collect()
    )
    # cluster {1,2,3}: 2 wins on score; cluster {7,8}: tie -> 7; 9 untouched
    assert kept == [2, 7, 9]
