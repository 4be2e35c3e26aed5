"""Similarity search over an embedding column (array<float>).

Two paths:
  - brute-force cosine top-k: broadcast the (small) query set, JVM-side
    dot product via zip_with/aggregate, window rank. The correctness
    baseline; O(N*Q) but fully distributed and shuffle-light (the only
    shuffle is the per-query top-k window, which AQE keeps tiny because
    rows are (query_id, vec_id, sim)).
  - LSH (random-hyperplane) bucketed: deterministic md5-derived
    hyperplanes -> sign-bit bucket; candidates only within a bucket.
    The scale path: at 10^9 vectors the cross product is gone and each
    bucket is a tiny local problem.

Embeddings cast to double before arithmetic so results match a float64
oracle (DuckDB list_cosine_similarity) at 4dp rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, 4dp (cross-engine float-stable)."""
    da = a.cast("array<double>")
    db = b.cast("array<double>")
    denom = norm(da) * norm(db)
    return F.round(
        F.when(denom == 0, F.lit(0.0)).otherwise(dot(da, db) / denom), 4
    )


def knn_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k cosine neighbors per query (excluding self-matches).

    queries: (query_id, embedding). Broadcast — the query side must be
    small (the classic ANN-serving shape); the corpus side streams.
    Deterministic rank: (sim desc, vec_id asc).
    """
    from pyspark.sql.window import Window

    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
        )
    )
    scored = embeddings.alias("e").crossJoin(q).select(
        "query_id",
        F.col(f"e.{id_col}").alias("vec_id"),
        cosine(F.col(f"e.{vec_col}"), F.col("qvec")).alias("sim"),
    ).filter(F.col("vec_id") != F.col("query_id"))

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def _hyperplane(dim: int, plane: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 — no RNG state."""
    import hashlib

    vals = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}:{plane}:{d}".encode()).hexdigest()
        vals.append((int(h[:8], 16) % 2001 - 1000) / 1000.0)
    return vals


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane sign bucket (int in [0, 2^n_planes))."""
    v = vec.cast("array<double>")
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = _hyperplane(dim, p, seed)
        proj = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(x) for x in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def knn_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    A candidate is scored if it shares a bucket with the query in ANY of
    the ``n_tables`` independent hash tables (the standard recall
    amplifier: miss probability decays as miss_one^n_tables). Recall <
    1.0 by construction; the bruteforce path is the oracle.

    Plan shape: queries are broadcast, so the OR-of-buckets predicate is
    evaluated as a broadcast nested-loop against the tiny query side. If
    the query side ever outgrows broadcast, rewrite as a union of
    per-table equi-joins on bucket id (each over ~N/2^planes rows).
    """
    from pyspark.sql.window import Window

    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("evec"),
        *[
            lsh_bucket(F.col(vec_col), dim, n_planes, seed=42 + t).alias(
                f"bucket{t}"
            )
            for t in range(n_tables)
        ],
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            *[
                lsh_bucket(F.col(vec_col), dim, n_planes, seed=42 + t).alias(
                    f"bucket{t}"
                )
                for t in range(n_tables)
            ],
        )
    )
    any_bucket = None
    for t in range(n_tables):
        c = F.col(f"e.bucket{t}") == F.col(f"q.bucket{t}")
        any_bucket = c if any_bucket is None else (any_bucket | c)
    scored = e.alias("e").join(q.alias("q"), any_bucket).select(
        "query_id",
        "vec_id",
        cosine(F.col("evec"), F.col("qvec")).alias("sim"),
    ).filter(F.col("vec_id") != F.col("query_id"))

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def _seed_centroids(embeddings: DataFrame, n_centroids: int,
                    id_col: str, vec_col: str) -> DataFrame:
    """Deterministic centroid seeding: the n vectors whose md5(id) is
    smallest — a uniform pseudo-random sample with no RNG state."""
    from pyspark.sql.window import Window

    return (
        embeddings.select(
            F.col(id_col).alias("cid_seed"), F.col(vec_col).alias("centroid")
        )
        .orderBy(F.md5(F.col("cid_seed").cast("string")))
        .limit(n_centroids)
        .withColumn(
            "cid",
            F.row_number().over(
                Window.orderBy(F.md5(F.col("cid_seed").cast("string")))
            ),
        )
        .select("cid", "centroid")
    )


def ivf_train(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantizer: Lloyd's k-means entirely in DataFrame ops.

    Assignment = argmax cosine vs broadcast centroids (one narrow
    crossJoin per iteration — centroids are tiny); update = per-cluster
    elementwise mean via posexplode + groupBy. Deterministic: seeding by
    md5(id) order, fixed iteration count, 4dp-rounded ranking with id
    tie-breaks. Returns (cid, centroid array<double>).
    """
    from pyspark.sql.window import Window

    cents = _seed_centroids(embeddings, n_centroids, id_col, vec_col).select(
        "cid", F.col("centroid").cast("array<double>").alias("centroid")
    )

    e = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    for _ in range(iterations):
        scored = e.crossJoin(F.broadcast(cents)).select(
            "vid", "v", "cid", cosine(F.col("v"), F.col("centroid")).alias("sim")
        )
        w = Window.partitionBy("vid").orderBy(
            F.col("sim").desc(), F.col("cid").asc()
        )
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vid", "v", "cid")
        )
        # elementwise mean per cluster: explode dims, groupBy (cid, dim)
        dims = assigned.select(
            "cid", F.posexplode("v").alias("dim", "x")
        )
        cents = (
            dims.groupBy("cid", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m"))
                ).alias("pairs")
            )
            .select(
                "cid",
                F.transform(F.col("pairs"), lambda p: p["m"]).alias("centroid"),
            )
        )
    return cents


def knn_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF search: score only vectors in the query's n_probe nearest
    cells. At corpus scale the candidate set shrinks by
    ~n_probe/n_centroids; the cell join is an equi-join on cid.
    """
    from pyspark.sql.window import Window

    cents = F.broadcast(centroids)

    def assign(df, idc, vc, top_n, out_prefix):
        scored = df.crossJoin(cents).select(
            F.col(idc), F.col(vc),
            "cid", cosine(F.col(vc), F.col("centroid")).alias("csim"),
        )
        w = Window.partitionBy(idc).orderBy(
            F.col("csim").desc(), F.col("cid").asc()
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= top_n)
            .select(F.col(idc), F.col(vc), F.col("cid").alias(f"{out_prefix}cid"))
        )

    e_cells = assign(
        embeddings.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("evec")),
        "vec_id", "evec", 1, "e",
    )
    q_cells = F.broadcast(
        assign(
            queries.select(F.col(query_id_col).alias("query_id"),
                           F.col(vec_col).alias("qvec")),
            "query_id", "qvec", n_probe, "q",
        )
    )
    scored = (
        e_cells.join(q_cells, e_cells.ecid == q_cells.qcid)
        .select(
            "query_id", "vec_id",
            cosine(F.col("evec"), F.col("qvec")).alias("sim"),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    dim: int | None = None,
    n_planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked to avoid N^2.

    Default blocking on a categorical column (label); with
    block_col=None, blocks on the random-hyperplane LSH bucket instead
    (requires ``dim``). There is deliberately no unblocked path — an
    unconstrained self-join is exactly the N^2 this operator exists to
    avoid.
    """
    if block_col is None:
        if dim is None:
            raise ValueError(
                "block_col=None requires dim= for LSH-bucket blocking"
            )
        blk = lsh_bucket(F.col(vec_col), dim, n_planes)
    else:
        blk = F.col(block_col)
    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        blk.alias("blk"),
    )
    a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "blk")
    b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("sim")
        )
        .filter(F.col("sim") >= threshold)
    )
