"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the correctness baseline.  Query set ×
  corpus, dot products as grouped sums over unnested positions (the
  exact arithmetic an ANSI-SQL oracle reproduces), rank by rounded
  cosine with a deterministic neighbor-id tie-break.
- random-hyperplane LSH buckets: the scale path.  H sign bits from
  literal hyperplanes (seeded, inlined into the plan — no engine RNG),
  bucket = packed bit signature; candidate search touches only the
  query's bucket.  At 100 TB the bucket id is the partition/cluster
  key, so a top-k probe reads one bucket, not the corpus.

For in-Spark-only use, `cosine_topk_arrays` keeps vectors as arrays and
uses `F.zip_with` + `aggregate` (no unnest blow-up); the unnested
variants exist so the DuckDB oracle can reproduce values exactly.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window, functions as F

N_PLANES = 8
EMB_DIM = 64


def hyperplanes(n_planes: int = N_PLANES, dim: int = EMB_DIM, seed: int = 7):
    """Deterministic pseudo-hyperplanes, inlined as literals into both
    the Spark plan and the SQL oracle (no engine-side RNG)."""
    rng = random.Random(f"lsh:{seed}")
    return [
        [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)]
        for _ in range(n_planes)
    ]


def _flat(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).withColumn("x", F.col("x").cast("double"))


def _norms(flat: DataFrame) -> DataFrame:
    return flat.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm")
    )


def _rank_by_cosine(dots: DataFrame, norms: DataFrame, k: int) -> DataFrame:
    """Shared scoring tail: cosine = dot/(|q||n|) rounded 4dp, rank by
    (cosine desc, neighbor_id asc), keep top-k.  This rounding and
    tie-break IS the oracle contract — one copy only."""
    scored = (
        dots.join(norms.withColumnRenamed("vec_id", "query_id"), "query_id")
        .withColumnRenamed("nrm", "nq")
        .join(
            norms.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed(
                "nrm", "nn"
            ),
            "neighbor_id",
        )
        .withColumn(
            "cosine", F.round(F.col("dot") / (F.col("nq") * F.col("nn")), 4)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_topk(
    emb: DataFrame, n_queries: int = 5, k: int = 3
) -> DataFrame:
    """Brute-force top-k neighbors for vec_id < n_queries (self excluded).

    Returns (query_id, neighbor_id, rank, cosine[rounded 4dp]); rank
    breaks cosine ties by neighbor id — fully deterministic.
    """
    flat = _flat(emb)
    q = flat.filter(F.col("vec_id") < n_queries)
    dots = (
        q.alias("a")
        .join(
            flat.alias("b"),
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
        )
        .agg(F.sum(F.col("a.x") * F.col("b.x")).alias("dot"))
    )
    return _rank_by_cosine(dots, _norms(flat), k)


def cosine_topk_arrays(
    emb: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Spark-native top-k (no unnest): broadcast the query set, dot via
    zip_with/aggregate inside codegen'd array expressions."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    e = emb.select("vec_id", "embedding")

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            dot(F.col("embedding"), F.col("qv"))
            / (
                F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                * F.sqrt(dot(F.col("qv"), F.col("qv")))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", "cosine")
    )


def lsh_tables(
    emb: DataFrame,
    n_planes: int = 4,
    n_tables: int = 1,
    base_seed: int = 7,
) -> DataFrame:
    """(vec_id, tbl, bucket) over *n_tables* independent hyperplane
    sets (seeds base_seed, base_seed+1, …).  Multi-table OR-probing:
    two vectors are candidates if they collide in ANY table — the
    standard LSH recall amplifier."""
    parts = [
        lsh_buckets(emb, hyperplanes(n_planes, seed=base_seed + t))
        .withColumn("tbl", F.lit(t))
        for t in range(n_tables)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("vec_id", "tbl", "bucket")


def lsh_probe_candidates(
    emb: DataFrame,
    n_planes: int = 4,
    n_tables: int = 1,
    bucket_cap: int | None = None,
    base_seed: int = 7,
) -> DataFrame:
    """(query_id, neighbor_id) LSH candidates with bounded fan-out.

    *bucket_cap* bounds the worst-case bucket population on the INDEX
    side: within each (tbl, bucket) only the *bucket_cap* smallest
    vec_ids serve as neighbors (deterministic truncation).  Every
    vector still probes as a query, so per-query work is at most
    n_tables × bucket_cap candidates — a skewed bucket can no longer go
    quadratic.  Recall trade: neighbors truncated out of an
    over-full bucket are only reachable through another table — that is
    the documented cost of boundedness (raise n_tables to buy it back).
    """
    b = lsh_tables(emb, n_planes, n_tables, base_seed)
    idx = b
    if bucket_cap is not None:
        w = Window.partitionBy("tbl", "bucket").orderBy(F.col("vec_id").asc())
        idx = (
            b.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= bucket_cap)
            .drop("rn")
        )
    cand = (
        b.alias("qa")
        .join(
            idx.alias("qb"),
            (F.col("qa.tbl") == F.col("qb.tbl"))
            & (F.col("qa.bucket") == F.col("qb.bucket"))
            & (F.col("qa.vec_id") != F.col("qb.vec_id")),
        )
        .select(
            F.col("qa.vec_id").alias("query_id"),
            F.col("qb.vec_id").alias("neighbor_id"),
        )
    )
    # collisions can repeat across tables; pairs must be unique
    return cand.distinct() if n_tables > 1 else cand


def lsh_topk(
    emb: DataFrame,
    planes: list[list[float]] | None = None,
    k: int = 1,
    n_tables: int | None = None,
    n_planes: int = 4,
    bucket_cap: int | None = None,
    base_seed: int = 7,
) -> DataFrame:
    """Bucketed ANN: top-k neighbors searched ONLY within the query's
    LSH bucket(s) — the scale path (at 100 TB the bucket is the
    partition key; a probe reads one bucket, not the corpus).  Fewer
    planes → bigger buckets → better recall, more compute; callers
    pick.  With *n_tables*/*bucket_cap* set, candidates come from
    multi-table OR-probing with a per-bucket population cap (see
    ``lsh_probe_candidates``) — bounded worst-case fan-out.
    Returns (query_id, neighbor_id, rank, cosine)."""
    flat = _flat(emb)
    if n_tables is not None:
        cand = lsh_probe_candidates(
            emb, n_planes, n_tables, bucket_cap, base_seed
        )
    else:
        b = lsh_buckets(emb, planes)
        cand = (
            b.alias("qa")
            .join(
                b.alias("qb"),
                (F.col("qa.bucket") == F.col("qb.bucket"))
                & (F.col("qa.vec_id") != F.col("qb.vec_id")),
            )
            .select(
                F.col("qa.vec_id").alias("query_id"),
                F.col("qb.vec_id").alias("neighbor_id"),
            )
        )
    dots = (
        cand.join(
            flat.alias("fa"), F.col("fa.vec_id") == F.col("query_id")
        )
        .join(
            flat.alias("fb"),
            (F.col("fb.vec_id") == F.col("neighbor_id"))
            & (F.col("fb.pos") == F.col("fa.pos")),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("fa.x") * F.col("fb.x")).alias("dot"))
    )
    return _rank_by_cosine(dots, _norms(flat), k)


def ivf_assign(emb: DataFrame, n_cells: int = 8) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest
    centroid cell.  Deterministic centroids = the first *n_cells*
    vectors (a seeded k-means would drop in on a cluster; the
    assignment/probe plan is identical).  Returns (vec_id, cell,
    dist2[rounded 6dp])."""
    flat = _flat(emb)
    cents = flat.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"),
        F.col("pos").alias("cpos"),
        F.col("x").alias("cx"),
    )
    d2 = (
        flat.join(cents, F.col("pos") == F.col("cpos"))
        .groupBy("vec_id", "cell")
        .agg(
            F.round(
                F.sum((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))),
                6,
            ).alias("dist2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist2").asc(), F.col("cell").asc()
    )
    return (
        d2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell", "dist2")
    )


def _cell_probe_topk(cells: DataFrame, flat: DataFrame, k: int) -> DataFrame:
    """Shared IVF probe tail: same-cell candidate pairs → exact cosine
    → rank-filtered top-k (probe=1: a query reads only its cell)."""
    cand = (
        cells.alias("qa")
        .join(
            cells.alias("qb"),
            (F.col("qa.cell") == F.col("qb.cell"))
            & (F.col("qa.vec_id") != F.col("qb.vec_id")),
        )
        .select(
            F.col("qa.vec_id").alias("query_id"),
            F.col("qb.vec_id").alias("neighbor_id"),
        )
    )
    dots = (
        cand.join(flat.alias("fa"), F.col("fa.vec_id") == F.col("query_id"))
        .join(
            flat.alias("fb"),
            (F.col("fb.vec_id") == F.col("neighbor_id"))
            & (F.col("fb.pos") == F.col("fa.pos")),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.col("fa.x") * F.col("fb.x")).alias("dot"))
    )
    return _rank_by_cosine(dots, _norms(flat), k)


def ivf_topk(emb: DataFrame, n_cells: int = 8, k: int = 1) -> DataFrame:
    """IVF-probed ANN: top-k by cosine among vectors sharing the
    query's cell (probe=1).  The inverted-file twin of lsh_topk — at
    scale the cell id is the partition key and a probe reads one cell."""
    cells = ivf_assign(emb, n_cells).select("vec_id", "cell")
    return _cell_probe_topk(cells, _flat(emb), k)


def _assign_to(flat: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cell): nearest centroid by L2, dist2 rounded 6dp, ties
    by cell asc — deterministic and engine-agnostic."""
    d2 = (
        flat.join(cents, F.col("pos") == F.col("cpos"))
        .groupBy("vec_id", "cell")
        .agg(
            F.round(
                F.sum((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))),
                6,
            ).alias("dist2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist2").asc(), F.col("cell").asc()
    )
    return (
        d2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )


def kmeans_cells(
    emb: DataFrame, n_cells: int = 8, iters: int = 2
) -> DataFrame:
    """Lloyd-trained IVF assignment: *iters* rounds of assign → mean
    recentering (centroid coordinates rounded 6dp each round so any
    engine reproduces the trajectory), deterministic first-k init.
    Centroids are tiny (n_cells × dim rows); each round is one keyed
    join + two aggregations over the flat table — the standard
    distributed k-means shape.  Returns the final (vec_id, cell)."""
    flat = _flat(emb)
    cents = flat.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"),
        F.col("pos").alias("cpos"),
        F.col("x").alias("cx"),
    )
    assign = None
    for _ in range(iters):
        assign = _assign_to(flat, cents)
        cents = (
            flat.join(assign, "vec_id")
            .groupBy("cell", F.col("pos").alias("cpos"))
            .agg(F.round(F.avg("x"), 6).alias("cx"))
            .select("cell", "cpos", "cx")
        )
    return _assign_to(flat, cents)


def ivf_kmeans_topk(
    emb: DataFrame, n_cells: int = 8, iters: int = 2, k: int = 1
) -> DataFrame:
    """IVF probe over Lloyd-trained cells — sim4's probe with trained
    centroids instead of the first-k quantizer."""
    cells = kmeans_cells(emb, n_cells, iters)
    return _cell_probe_topk(cells, _flat(emb), k)


def lsh_buckets(emb: DataFrame, planes: list[list[float]] | None = None) -> DataFrame:
    """(vec_id, bucket): bucket = Σ 2^p · [v·h_p > 0] over literal planes."""
    planes = planes or hyperplanes()
    flat = _flat(emb)
    parts = []
    for p, plane in enumerate(planes):
        # weight for dim i of plane p as a literal lookup array
        arr = F.array(*[F.lit(w) for w in plane])
        parts.append(
            F.when(
                F.sum(F.col("x") * F.element_at(arr, F.col("pos") + 1)) > 0,
                F.lit(2**p).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias(f"b{p}")
        )
    sums = flat.groupBy("vec_id").agg(*parts)
    bucket = sums.select(
        "vec_id",
        sum([F.col(f"b{p}") for p in range(len(planes))], F.lit(0).cast("long")).alias(
            "bucket"
        ),
    )
    return bucket
