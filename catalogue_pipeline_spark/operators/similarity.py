"""Similarity search over an embedding column (array<float>).

  cosine_topk_bruteforce   exact top-k per query via cross join — the
                           correctness baseline (fine when |queries| small or
                           broadcastable).
  lsh_bucketed_topk        random-hyperplane LSH: sign-bit sketch → bucket →
                           join within bucket (+ multi-probe via several
                           independent tables). The 100 TB scale path: each
                           query compares against its buckets only.

No UDFs: dot products via zip_with/aggregate run inside codegen. Hyperplanes
are generated deterministically from a seed (hash-derived pseudo-gaussians),
so results are reproducible across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(v):
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbours per query: (query_id, neighbor_id, cosine, rank).

    Physical shape (guide §3.1): the CORPUS is the streamed side and the
    (small) query set is broadcast, so the O(|corpus| x |queries|) cosine
    arithmetic runs in the corpus tasks — one per scan split after
    ``fan_out`` — instead of being built into a broadcast relation and
    evaluated single-threaded on the handful of query rows. The per-
    partition WindowGroupLimit then prunes to <=k rows per query before the
    one small exchange."""
    from .fanout import fan_out

    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes via a splitmix-style hash —
    no numpy RNG state, identical on every run."""
    planes = []
    x = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            u1 = ((x >> 11) & ((1 << 53) - 1)) / float(1 << 53)
            x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            u2 = ((x >> 11) & ((1 << 53) - 1)) / float(1 << 53)
            # Box-Muller
            import math

            row.append(math.sqrt(max(-2.0 * math.log(max(u1, 1e-12)), 0.0)) * math.cos(2 * math.pi * u2))
        planes.append(row)
    return planes


def lsh_bucket_expr(vec_col, planes: list[list[float]]):
    """Sign-bit sketch of ``vec`` against the hyperplanes → bucket string."""
    bits = []
    for p in planes:
        arr = F.array(*[F.lit(float(v)) for v in p])
        bits.append(F.when(_dot(F.col(vec_col), arr) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    centroid_stride: int | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: partition the corpus into ``n_cells``
    inverted lists by nearest centroid, probe only the ``n_probe`` cells
    closest to each query, exact cosine within probed cells.

    Centroids are ``n_cells`` deterministic sample vectors (every
    ``centroid_stride``-th id) rather than k-means iterates — the partition
    quality costs some recall vs trained centroids, but assignment is one
    broadcast pass and results are bit-stable across runs/cluster sizes
    (the property every operator here guarantees). At 100 TB the corpus
    assignment is a single map over the data against broadcast centroids
    (no shuffle until the per-cell join), and each query touches
    n_probe/n_cells of the corpus.

    Output schema matches cosine_topk_bruteforce.
    """
    if centroid_stride is None:
        centroid_stride = max(corpus.count() // n_cells, 1)
    cents = (
        corpus.filter((F.col(id_col) % centroid_stride == 0))
        .orderBy(id_col)
        .limit(n_cells)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .collect()
    )

    def cell_scores(vec):
        """Array of (cos, cid) structs vs every centroid — broadcast-style
        literal expressions, no join."""
        out = []
        for r in cents:
            arr = F.array(*[F.lit(float(x)) for x in r["cv"]])
            out.append(
                F.struct(
                    (_dot(vec, arr) / (_norm(vec) * _norm(arr))).alias("cos"),
                    F.lit(r["cid"]).alias("cid"),
                )
            )
        return F.array(*out)

    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
        F.array_max(cell_scores(F.col(vec_col)))["cid"].alias("cell"),
    )
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
        F.explode(
            F.slice(F.reverse(F.array_sort(cell_scores(F.col(vec_col)))), 1, n_probe)
        ).alias("probe"),
    ).select("query_id", "qv", "qn", F.col("probe.cid").alias("cell"))
    scored = probes.join(assigned, on="cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = scored.withColumn(
        "cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 2,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: compare only within matching LSH buckets, across
    ``n_tables`` independent hash tables (multi-probe recall boost). Output
    schema matches cosine_topk_bruteforce (ranks within retrieved set).

    Pass ``dim`` explicitly in production — inferring it costs a one-row job
    (``limit(1)``) before planning, which is wasteful in a hot path."""
    if dim is None:
        row = corpus.select(vec_col).limit(1).collect()
        if not row:
            raise ValueError("empty corpus and no dim given")
        dim = len(row[0][0])
    parts = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            lsh_bucket_expr(vec_col, planes).alias("bucket"),
        ).withColumn("table", F.lit(t))
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            lsh_bucket_expr(vec_col, planes).alias("bucket"),
        ).withColumn("table", F.lit(t))
        parts.append(q.join(c, on=["table", "bucket"]))
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)
    cand = cand.filter(F.col("query_id") != F.col("neighbor_id")).dropDuplicates(
        ["query_id", "neighbor_id"]
    )
    scored = cand.withColumn(
        "cosine",
        _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
