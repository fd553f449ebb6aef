"""Kusto `graph-shortest-paths` rebuilt Spark-first: bounded-hop BFS
over an edge DataFrame — the distributed single-source-shortest-path
shape (level-synchronous frontier expansion), NOT a recursive self-join
blowup.

Per round: frontier ⋈ edges (one shuffle on the node key), anti-join
against the visited set (so no node is ever re-expanded — each (start,
node) pair is touched exactly once across the whole run), then a keyed
min to pick one deterministic witness path. max_hops bounds the driver
loop (a user constant, like Kusto's mandatory *min..max range);
lineage is truncated per round exactly as connected_components does
(localCheckpoint by default, reliable checkpoint_dir for 100 TB runs).

Reference anchor: the reference declares the KQL surface only
(reference README.md:34); graph-shortest-paths semantics follow the
public Kusto docs (output=any subset: one shortest path per reachable
pair; distances are exact BFS levels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shortest_paths(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 5,
    sources: DataFrame | None = None,
    targets: DataFrame | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """BFS shortest paths along directed edges, up to `max_hops`.

    sources/targets: optional single-column DataFrames (column `id`)
    restricting the start / end node sets; None = all edge endpoints.
    Returns (start_id, end_id, hops, path) — hops is the exact shortest
    distance (≥1); path is one deterministic witness ('->'-joined ids,
    the greedy per-level lexicographic minimum: each level keeps the
    smallest path string per (start, node), so the witness is a pure
    function of the graph, though not necessarily the globally
    lex-smallest shortest path)."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    e = edges.select(
        F.col(src).cast("string").alias("u"), F.col(dst).cast("string").alias("v")
    ).distinct()
    if sources is None:
        starts = e.select(F.col("u").alias("id")).distinct()
    else:
        starts = sources.select(F.col(sources.columns[0]).cast("string").alias("id"))
    frontier = starts.select(
        F.col("id").alias("start_id"),
        F.col("id").alias("node"),
        F.col("id").alias("path"),
        F.lit(0).alias("hops"),
    )
    visited = _truncate(frontier)
    reached = None
    for level in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["u"])
            .select(
                "start_id",
                F.col("v").alias("node"),
                F.concat_ws("->", "path", "v").alias("path"),
                F.lit(level).alias("hops"),
            )
            .join(
                visited.select("start_id", "node"), ["start_id", "node"], "left_anti"
            )
            .groupBy("start_id", "node")
            .agg(F.min("path").alias("path"))
            .select("start_id", "node", "path", F.lit(level).alias("hops"))
        )
        nxt = _truncate(nxt)
        if nxt.isEmpty():
            break
        reached = nxt if reached is None else reached.unionByName(nxt)
        visited = _truncate(visited.unionByName(nxt))
        frontier = nxt
    if reached is None:
        return frontier.select(
            "start_id", F.col("node").alias("end_id"), "hops", "path"
        ).limit(0)
    out = reached.select("start_id", F.col("node").alias("end_id"), "hops", "path")
    if targets is not None:
        tg = targets.select(F.col(targets.columns[0]).cast("string").alias("end_id"))
        out = out.join(F.broadcast(tg), "end_id", "inner").select(
            "start_id", "end_id", "hops", "path"
        )
    return out
