"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline; sign-LSH bucketing as
the scale path (search only the query's bucket). Dot products run as JVM
higher-order functions (``zip_with`` + ``aggregate``) inside whole-stage
codegen — no Python UDF in the scoring loop.

Scale notes: brute force is a broadcast of the query vector + a single
narrow pass (no shuffle) followed by TakeOrderedAndProject — linear scans
of 10^12 vectors are a cluster-size problem, not a plan problem. The LSH
variant prunes the scan to one bucket (expected n/2^bits of the data);
production IVF would replace random hyperplanes with k-means centroids but
the dataflow (bucket assignment at write, bucket-pruned scan at read) is
identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dbl(col: str) -> str:
    return f"transform({col}, x -> cast(x as double))"


def dot_expr(a: str, b: str) -> Column:
    return F.expr(f"aggregate(zip_with({_dbl(a)}, {_dbl(b)}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")


def norm_expr(a: str) -> Column:
    return F.expr(f"sqrt(aggregate({_dbl(a)}, 0D, (acc, v) -> acc + v * v))")


def cosine_expr(a: str, b: str) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(emb: DataFrame, query_vec_id: int, k: int = 10) -> DataFrame:
    """Exact cosine top-k neighbors of one stored vector (excluded itself).

    (rank, vec_id, cos) — rank by (cos DESC, vec_id ASC).
    """
    q = emb.where(F.col("vec_id") == query_vec_id).select(F.col("embedding").alias("qv"))
    scored = (
        emb.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(F.col("vec_id").cast("long").alias("vec_id"), cosine_expr("embedding", "qv").alias("_c"))
    )
    top = scored.orderBy(F.desc("_c"), F.asc("vec_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("_c"), F.asc("vec_id"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "vec_id",
        (F.round("_c", 6) + F.lit(0.0)).alias("cos"),
    )


def lsh_bucket_expr(vec_col: str, planes: list[int]) -> Column:
    """Sign-LSH bucket id: bit p set iff dot(vec, plane_p) >= 0.

    Planes are *stored vectors* (by vec_id) so the bucketing is fully
    data-derived and reproducible in any engine.
    """
    bits = None
    for p, _ in enumerate(planes):
        bit = F.when(dot_expr(vec_col, f"_plane{p}") >= 0, F.lit(2**p)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits


def lsh_topk(emb: DataFrame, query_vec_id: int, plane_ids: list[int], k: int = 5) -> DataFrame:
    """ANN top-k searching only the query's sign-LSH bucket.

    (rank, vec_id, bucket, cos). Deterministic: planes = stored vectors.
    """
    planes = emb.where(F.col("vec_id").isin(plane_ids))
    sel = emb
    for p, pid in enumerate(plane_ids):
        pv = planes.where(F.col("vec_id") == pid).select(F.col("embedding").alias(f"_plane{p}"))
        sel = sel.crossJoin(F.broadcast(pv))
    bucketed = sel.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding"),
        lsh_bucket_expr("embedding", plane_ids).cast("long").alias("bucket"),
        *[F.col(f"_plane{p}") for p in range(len(plane_ids))],
    )
    qrow = bucketed.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv"), F.col("bucket").alias("qbucket")
    )
    cand = (
        bucketed.crossJoin(F.broadcast(qrow))
        .where((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != query_vec_id))
        .select("vec_id", "bucket", cosine_expr("embedding", "qv").alias("_c"))
    )
    top = cand.orderBy(F.desc("_c"), F.asc("vec_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("_c"), F.asc("vec_id"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "vec_id",
        "bucket",
        (F.round("_c", 6) + F.lit(0.0)).alias("cos"),
    )


def kmeans_centroids(emb: DataFrame, k: int = 4, n_iter: int = 2) -> list[list[float]]:
    """Deterministic Lloyd's k-means over the embedding column (cosine
    assignment, per-dimension mean update).

    Init = the vectors of the k smallest vec_ids; a FIXED iteration count
    and lowest-index tie-breaks make the result reproducible in any engine
    (the SQL oracle unrolls the same iterations). Each round is one
    narrow assignment pass + one groupBy(cell, dim) mean — the centroids
    (k x dim doubles) are the only driver-side data at any corpus size.
    """
    init = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(F.expr(_dbl("embedding")).alias("v"))
        .collect()
    )
    cents = [list(r["v"]) for r in init]
    for _ in range(n_iter):
        assigned = assign_cells(emb, cents).select(
            "cell", F.posexplode(F.expr(_dbl("embedding"))).alias("dim", "x")
        )
        means = (
            assigned.groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cell", F.expr("transform(dm, e -> e.m)").alias("v"))
            .collect()
        )
        new = {int(r["cell"]): list(r["v"]) for r in means}
        # empty cells keep their previous centroid (standard Lloyd's rule)
        cents = [new.get(p + 1, cents[p]) for p in range(k)]
    return cents


def _argmax_cell(cos_cols: list[Column]) -> Column:
    """1-based argmax over cosine columns, ties to the LOWER index.

    Built as array_max over (cos, -index) structs so every cosine
    expression appears exactly ONCE in the plan — a chained
    when(c > best, ...).otherwise(best) embeds `best` twice per level and
    the expression tree grows 2^k (measured: k=16 centroids hung plan
    compilation for minutes)."""
    arr = F.array(
        *[
            F.struct(c.alias("c"), F.lit(-(p + 1)).alias("ni"))
            for p, c in enumerate(cos_cols)
        ]
    )
    return (-F.array_max(arr)["ni"]).cast("long")


def assign_cells(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """+ cell column: 1-based argmax-cosine centroid, ties to the lower id."""
    cos_cols = []
    for cv in centroids:
        lit = "array(" + ", ".join(repr(float(x)) + "D" for x in cv) + ")"
        cos_cols.append(
            F.expr(
                f"aggregate(zip_with({_dbl('embedding')}, {lit}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
            )
            / (norm_expr("embedding") * F.lit(sum(x * x for x in cv) ** 0.5))
        )
    return emb.withColumn("cell", _argmax_cell(cos_cols))


def ivf_kmeans_topk(
    emb: DataFrame, query_vec_id: int, k_cells: int = 4, n_iter: int = 2, k: int = 5
) -> DataFrame:
    """IVF with trained (k-means) centroids: the production shape of
    ivf_topk — cell assignment at write time, cell-pruned scan at read.
    (rank, vec_id, cell, cos)"""
    cents = kmeans_centroids(emb, k=k_cells, n_iter=n_iter)
    assigned = assign_cells(emb, cents).select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding", "cell"
    )
    qrow = assigned.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv"), F.col("cell").alias("qcell")
    )
    cand = (
        assigned.join(F.broadcast(qrow))
        .where((F.col("cell") == F.col("qcell")) & (F.col("vec_id") != query_vec_id))
        .select("vec_id", "cell", cosine_expr("embedding", "qv").alias("_c"))
    )
    from pyspark.sql import Window

    top = cand.orderBy(F.desc("_c"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("_c"), F.asc("vec_id"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "vec_id",
        "cell",
        (F.round("_c", 6) + F.lit(0.0)).alias("cos"),
    )


def ivf_topk(emb: DataFrame, query_vec_id: int, centroid_ids: list[int], k: int = 5) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid (argmax
    cosine over a small data-derived centroid set), search only the query's
    cell. Production IVF swaps the seed centroids for k-means centroids —
    the dataflow (cell assignment at write, cell-pruned scan at read) is
    identical, and at scale the table is partitioned BY cell so the scan
    prunes at the storage layer. (rank, vec_id, cell, cos)
    """
    cents = sorted(centroid_ids)
    sel = emb
    for p, cid in enumerate(cents):
        cv = emb.where(F.col("vec_id") == cid).select(F.col("embedding").alias(f"_c{p}"))
        sel = sel.crossJoin(F.broadcast(cv))
    # cell = 1-based index of the max-cosine centroid, ties to the lower id
    cos_cols = [cosine_expr("embedding", f"_c{p}") for p in range(len(cents))]
    assigned = sel.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding"),
        _argmax_cell(cos_cols).alias("cell"),
    )
    qrow = assigned.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv"), F.col("cell").alias("qcell")
    )
    cand = (
        assigned.join(F.broadcast(qrow))
        .where((F.col("cell") == F.col("qcell")) & (F.col("vec_id") != query_vec_id))
        .select("vec_id", "cell", cosine_expr("embedding", "qv").alias("_c"))
    )
    top = cand.orderBy(F.desc("_c"), F.asc("vec_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("_c"), F.asc("vec_id"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "vec_id",
        "cell",
        (F.round("_c", 6) + F.lit(0.0)).alias("cos"),
    )
