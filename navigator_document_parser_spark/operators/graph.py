"""Link-graph analytics for crawl curation.

Web-scale pipelines weight domains by their position in the host link
graph (WAT-derived, see sources/warc.host_link_graph): link-based
scores separate organic sites from spam farms far more cheaply than
per-page classifiers. This module maps the standard power-iteration
PageRank onto DataFrame ops with the same scale discipline as
dedup.connected_components:

  - each iteration is ONE logical plan: edge-join + hash aggregate,
    dangling mass folded in via a 1-row broadcast crossJoin — no
    per-iteration driver action (collect) anywhere;
  - the normalized edge table is eager-localCheckpoint'ed once (it is
    re-read every iteration and feeds two branches per round —
    CLAUDE.md lesson 7: lazy barriers race under concurrent branch
    materialization);
  - rank lineage is truncated every ``checkpoint_every`` iterations so
    the plan stays bounded (the components lesson: unbounded iterative
    lineage re-executes the whole chain per action).

Reference scope note: the reference parser has no graph analytics; this
is part of the beyond-reference training-data layer (SURVEY §2 "beyond"
table), like dedup/ANN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str | None = "n_links",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Weighted PageRank over an edge list -> (node, rank).

    rank_{t+1}(v) = (1-d)/N + d * (sum_{u->v} rank_t(u) * w(u,v)/W(u)
                                   + dangling_mass_t / N)

    where W(u) is u's total out-weight and dangling nodes (no
    out-edges) redistribute their mass uniformly — the standard
    stochastic-matrix completion, so sum(rank) == 1 at every step.

    Scale: per iteration one shuffle on dst (hash aggregate with
    map-side combine) plus one broadcast of the current ranks onto the
    checkpointed edge table when ranks are small, or a hash join on src
    when they are not — Spark's join planner picks via AQE; the
    dangling aggregate is a 1-row reduction crossJoin-broadcast back.
    """
    w = (
        F.col(weight).cast("double")
        if weight is not None
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    frac = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("frac"))
        .localCheckpoint(eager=True)  # re-read every iteration
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    # static dangling set: nodes that never appear as src
    dangling = nodes.join(
        frac.select(F.col("src").alias("node")).distinct(),
        "node",
        "left_anti",
    ).localCheckpoint(eager=True)

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    d = float(damping)
    for i in range(int(iterations)):
        dang_mass = (
            ranks.join(dangling, "node", "leftsemi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        contrib = (
            frac.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("m"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang_mass))
            .select(
                "node",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d)
                    * (F.coalesce(F.col("m"), F.lit(0.0))
                       + F.col("dm") / n)
                ).alias("rank"),
            )
        )
        # bound the iterative lineage; eager: ranks feeds BOTH the
        # dangling aggregate and the contribution join next round
        if (i + 1) % int(checkpoint_every) == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def hits(
    edges: DataFrame,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str | None = "n_links",
    iterations: int = 5,
    checkpoint_every: int = 0,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) -> (node, authority, hub).

    Per iteration: auth'(v) = sum_{u->v} hub(u)*w;
    hub'(u) = sum_{u->v} auth'(v)*w. Normalization happens ONCE at the
    end (L1): per-iteration scale factors are uniform positive scalars,
    so deferring them changes nothing after the final divide — and it
    keeps the logical plan LINEAR in the iteration count. A
    normalize-inside-the-loop variant embeds the score subtree twice
    per normalization (score + 1-row norm aggregate), and with two of
    them per iteration the un-truncated plan grows ~4^t — Catalyst
    analysis time explodes long before execution does (measured: 5
    iterations un-analyzable in minutes; this shape runs in seconds).
    Magnitudes grow like (total edge weight)^(2t) between barriers —
    fine in doubles for the handful of iterations HITS needs on any
    realistic host graph. For long runs or extreme weights, set
    checkpoint_every>0: each barrier materializes the scores AND
    L1-rescales them (a uniform scalar, result direction unchanged), so
    both lineage depth and magnitude are bounded. The rescale's
    double-reference is safe there because it reads the just-written
    checkpoint blocks, not the un-truncated subtree.

    Scale: two shuffles per iteration (hash agg on dst, then on src),
    map-side combine on both; no driver collects or counts anywhere.
    checkpoint_every=0 (default) runs the whole power iteration as ONE
    linear DAG — right for the handful of iterations HITS needs.
    """
    if iterations <= 0:
        raise ValueError("iterations must be positive")
    w = (
        F.col(weight).cast("double")
        if weight is not None
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    ).localCheckpoint(eager=True)  # re-read twice per iteration
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _l1(df: DataFrame, col: str) -> DataFrame:
        # embeds df twice (scores + 1-row norm): call ONLY on a
        # materialized checkpoint or once at the very end — inside the
        # loop on raw lineage this doubling compounds to ~4^t
        norm = df.agg(
            F.coalesce(F.sum(col), F.lit(0.0)).alias("_norm")
        )
        return df.crossJoin(F.broadcast(norm)).select(
            "node",
            F.when(F.col("_norm") == 0.0, F.lit(0.0))
            .otherwise(F.col(col) / F.col("_norm"))
            .alias(col),
        )

    # init hub = 1.0, NOT 1/n: the final L1 normalize cancels any
    # uniform init scale, and skipping the count() removes a driver
    # action (empty input degrades to an empty result naturally)
    hubs = nodes.select("node", F.lit(1.0).alias("hub"))
    auths = None
    for i in range(int(iterations)):
        auths = (
            nodes.join(
                e.join(hubs.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("hub") * F.col("w")).alias("a")),
                "node",
                "left",
            )
            .select("node", F.coalesce("a", F.lit(0.0)).alias("authority"))
        )
        hubs = (
            nodes.join(
                e.join(auths.withColumnRenamed("node", "dst"), "dst")
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum(F.col("authority") * F.col("w")).alias("h")),
                "node",
                "left",
            )
            .select("node", F.coalesce("h", F.lit(0.0)).alias("hub"))
        )
        if (
            checkpoint_every
            and (i + 1) % int(checkpoint_every) == 0
            and i + 1 < iterations
        ):
            # materialize, THEN rescale reading the checkpoint blocks:
            # bounds lineage depth AND score magnitude at each barrier
            # (the L1 factor is uniform, so results are unchanged)
            auths = _l1(auths.localCheckpoint(eager=True), "authority")
            hubs = _l1(hubs.localCheckpoint(eager=True), "hub")

    return _l1(auths, "authority").join(_l1(hubs, "hub"), "node").select(
        "node", "authority", "hub"
    )
