"""Connected components: known graphs (chain forces multi-round
propagation), canonical assignment incl. singletons."""

from __future__ import annotations

from pyspark.sql import functions as F

from meerkat_spark.operators.components import (
    connected_components,
    dedup_assign_canonical,
)


def test_chain_triangle_and_isolated(spark):
    # chain 1-2-3-4-5 (diameter 4 → needs >1 round), triangle 10-11-12,
    # pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long",
    )
    comp = {
        r.id: r.component for r in connected_components(edges).collect()
    }
    assert {comp[i] for i in (1, 2, 3, 4, 5)} == {1}
    assert {comp[i] for i in (10, 11, 12)} == {10}
    assert {comp[i] for i in (20, 21)} == {20}


def test_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir switches lineage truncation to reliable
    checkpoints: same results, checkpoint files actually written."""
    import os

    ckpt = str(tmp_path / "ckpt")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (20, 21)], "src long, dst long"
    )
    comp = {
        r.id: r.component
        for r in connected_components(edges, checkpoint_dir=ckpt).collect()
    }
    assert {comp[i] for i in (1, 2, 3, 4, 5)} == {1}
    assert {comp[i] for i in (20, 21)} == {20}
    # reliable checkpoints hit the directory (one per truncation round)
    written = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs
    ]
    assert written, "no checkpoint files written to checkpoint_dir"


def test_canonical_assignment_with_singletons(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 7)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(2, 4), (4, 6)], "id1 long, id2 long"
    )
    out = {
        r.doc_id: r.canonical_id
        for r in dedup_assign_canonical(docs, pairs).collect()
    }
    assert out == {1: 1, 2: 2, 3: 3, 4: 2, 5: 5, 6: 2}
    survivors = [d for d, c in out.items() if d == c]
    assert sorted(survivors) == [1, 2, 3, 5]


def test_shortest_paths_bfs_known(spark):
    from meerkat_spark.operators.graph import shortest_paths
    from pyspark.sql import functions as F

    # diamond + tail, plus a cycle back (d->a) to prove no re-expansion
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
         ("d", "a")],
        "src string, dst string",
    )
    got = {
        (r.start_id, r.end_id): (r.hops, r.path)
        for r in shortest_paths(edges, max_hops=5).collect()
    }
    assert got[("a", "d")] == (2, "a->b->d")      # lex-min witness
    assert got[("a", "e")] == (3, "a->b->d->e")
    assert got[("d", "a")] == (1, "d->a")
    assert got[("d", "c")] == (2, "d->a->c")       # through the cycle
    assert ("a", "a") not in got                    # self never reported
    # sources/targets restriction
    src = spark.createDataFrame([("a",)], "id string")
    tgt = spark.createDataFrame([("e",)], "id string")
    only = shortest_paths(edges, max_hops=5, sources=src, targets=tgt).collect()
    assert len(only) == 1 and only[0].hops == 3

    # max_hops truncation
    short = {
        (r.start_id, r.end_id)
        for r in shortest_paths(edges, max_hops=1).collect()
    }
    assert ("a", "d") not in short and ("a", "b") in short


def test_graph_shortest_paths_kql_edge_struct(spark):
    from meerkat_spark.engine import MeerkatEngine

    eng = MeerkatEngine(spark, "/root/testdata/sf0.001")
    out = eng.kql(
        "let g = datatable(s: long, d: long)[1, 2, 2, 3, 3, 4];"
        "g | make-graph s --> d"
        " | graph-shortest-paths (a)-[p*2..3]->(b)"
        "   project f = a.id, t = b.id, n = p.hops"
    ).to_df().collect()
    got = sorted((r.f, r.t, r.n) for r in out)
    assert got == [(1, 3, 2), (1, 4, 3), (2, 4, 2)]


def test_driver_and_iterative_paths_agree(spark, monkeypatch):
    """r16: the size-gated driver union-find fast path must produce
    exactly the labels of the iterative min-label propagation. Forcing
    the gate to 0 exercises the iterative path on the same graph."""
    import meerkat_spark.operators.components as C

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12),
         (20, 21), (7, 7)],
        "src long, dst long",
    )
    fast = {r.id: r.component for r in connected_components(edges).collect()}
    monkeypatch.setattr(C, "CC_DRIVER_MAX_EDGES", 0)
    slow = {r.id: r.component for r in connected_components(edges).collect()}
    assert fast == slow
    assert {fast[i] for i in (1, 2, 3, 4, 5)} == {1}
    assert fast[7] == 7
