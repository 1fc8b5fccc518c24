"""Embedding similarity search: brute-force cosine top-k and LSH-bucketed ANN.

Vector math is expressed with ``zip_with``/``aggregate`` higher-order
functions — dot products run inside whole-stage codegen, no Python per row.

Scale path: brute-force top-k is a broadcast of the (small) query set
against the (huge) corpus — the corpus is never shuffled; each task scores
its scan split and a TakeOrderedAndProject per query key keeps memory flat.
The ANN variant buckets by random-hyperplane signs (sign-LSH ≈ cosine), so
candidate scoring touches only matching buckets; recall is tuned by the
number of hyperplanes and probe multiplicity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: F.Column, b: F.Column) -> F.Column:
    """Dot product of two array<numeric> columns, computed in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: F.Column) -> F.Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: F.Column, b: F.Column) -> F.Column:
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot_expr(a, b) / denom)


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_digits: int = 4) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries`` is broadcast (query sets are small by construction); rank
    orders by the ROUNDED similarity with id tiebreak so results are
    deterministic and engine-portable (float noise below round_digits can't
    flip the selection).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("match_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("_qv"), F.col("_cv")), round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "match_id", "cosine", "rnk")
    )


def _drop_big_buckets(df: DataFrame, bucket_cols: list[str],
                      max_bucket_size: int) -> DataFrame:
    """Remove rows whose bucket holds more than ``max_bucket_size`` members
    — the broadcast skip-list cap every LSH blocker in ``dedup.py`` applies.
    Real encoder outputs cluster directionally, so a handful of sign-LSH
    buckets can swallow a large corpus share; without the cap the
    bucket self-join/probe goes quadratic on exactly those buckets at
    scale. The skip-list is tiny (one row per *oversized* bucket), so it
    always broadcasts."""
    big = (
        df.groupBy(*bucket_cols).count()
        .where(F.col("count") > max_bucket_size)
        .select(*bucket_cols, F.lit(True).alias("_skip"))
    )
    return (
        df.join(F.broadcast(big), bucket_cols, "left")
        .where(F.col("_skip").isNull())
        .drop("_skip")
    )


def _hyperplanes(dim: int, n: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded LCG → uniform in
    [-1, 1]); no numpy dependency so signatures are reproducible anywhere."""
    planes, x = [], seed
    for _ in range(n):
        row = []
        for _ in range(dim):
            x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
            row.append((x / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def signlsh_bucket_expr(vec_col: F.Column, dim: int, n_planes: int = 12,
                        seed: int = 42) -> F.Column:
    """Sign-LSH bucket id: bit b = sign(v · plane_b). Vectors with small
    angle collide with high probability (cosine LSH)."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        d = dot_expr(vec_col, F.array(*[F.lit(p) for p in plane]))
        bucket = bucket.bitwiseOR(
            F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def ann_cosine_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 10, round_digits: int = 4,
                    max_bucket_size: int | None = 100_000) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's sign-LSH
    bucket. At 100 TB the bucket column is a parquet partition/cluster key,
    so a query probes ~1/2^n_planes of the corpus.

    ``max_bucket_size`` drops degenerate corpus buckets (directionally
    clustered encoder outputs funnel into few sign patterns) before the
    probe join, bounding per-query candidate work; a query whose bucket was
    dropped returns no matches rather than scanning a corpus-sized bucket —
    the standard LSH trade (raise ``n_planes`` to split hot buckets instead
    of raising the cap). ``None`` disables the cap."""
    c = corpus.select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("_cv")
    ).withColumn("bucket", signlsh_bucket_expr(F.col("_cv"), dim, n_planes))
    if max_bucket_size is not None:
        c = _drop_big_buckets(c, ["bucket"], max_bucket_size)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("bucket", signlsh_bucket_expr(F.col("_qv"), dim, n_planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("match_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("_qv"), F.col("_cv")), round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "match_id", "cosine", "rnk")
    )


def _unit_expr(vec_col: F.Column) -> F.Column:
    """Unit-normalized copy of an array<float> vector (double precision);
    zero vectors pass through unchanged."""
    n = norm_expr(vec_col)
    return F.when(n == 0, vec_col.cast("array<double>")).otherwise(
        F.transform(vec_col, lambda x: x.cast("double") / n)
    )


class IvfIndex:
    """A trained IVF index: coarse-quantizer centroids plus the corpus with
    its cell assignments (persisted). Build ONCE per corpus with
    :func:`ivf_build`, probe many times with :func:`ivf_cosine_topk` — at
    100 TB the assignments are written out partitioned/clustered by
    ``cell`` at ingest and the quantizer is a few KB of centroids, so a
    probe never re-touches the training path."""

    def __init__(self, centers: list[list[float]], assigned: DataFrame,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> None:
        self.centers = centers
        self.assigned = assigned
        self.id_col = id_col
        self.vec_col = vec_col

    def unpersist(self) -> None:
        self.assigned.unpersist()


def ivf_assign(corpus: DataFrame, n_cells: int = 16, seed: int = 42,
               max_iter: int = 6, id_col: str = "vec_id",
               vec_col: str = "embedding",
               max_train_rows: int = 4096) -> tuple[list[list[float]], DataFrame]:
    """Train the IVF coarse quantizer on a bounded sample and assign every
    corpus vector to its cell.

    KMeans (seeded, MLlib — JVM-side assignment, no Python per row) runs on
    unit-normalized vectors so L2-nearest centroid == cosine-nearest. The
    fit sees at most ``max_train_rows`` vectors (a coarse quantizer with
    16-ish cells gains nothing from more), then ``model.transform`` streams
    the full corpus exactly once; the ``cell`` column becomes the parquet
    partition/cluster key so a probe reads only its cells' files. Probe
    exactness never depends on training quality: ``nprobe == n_cells``
    equals the exact scan for ANY centroids (pinned by pytest).
    Returns (centroids, corpus+cell).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # Parallelism tracks cores (single-file corpora otherwise assign on one
    # task); random init: k-means|| spends 2 extra full passes picking seeds
    # (measured 2.7x slower fit) for no bucketing-quality gain here.
    n_part = int(corpus.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    feat = corpus.repartition(n_part, F.col(id_col)).withColumn(
        "_unit", array_to_vector(_unit_expr(F.col(vec_col)))
    )
    train = feat.select("_unit").limit(max_train_rows)
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter, initMode="random",
                   featuresCol="_unit", predictionCol="cell").fit(train)
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    return centers, model.transform(feat).drop("_unit")


def ivf_build(corpus: DataFrame, n_cells: int = 16, seed: int = 42,
              max_iter: int = 6, id_col: str = "vec_id",
              vec_col: str = "embedding",
              max_train_rows: int = 4096) -> IvfIndex:
    """Build a reusable IVF index: train the quantizer once (on a sample),
    assign the corpus once, persist the assignments so every subsequent
    probe starts from the materialized (cell, id, vector) layout instead of
    re-running KMeans — the train/probe split a serving path requires."""
    centers, assigned = ivf_assign(corpus, n_cells, seed, max_iter,
                                   id_col, vec_col, max_train_rows)
    assigned = assigned.persist()
    assigned.count()  # materialize now: probes must not re-trigger the fit
    return IvfIndex(centers, assigned, id_col, vec_col)


def _probe_cells(queries: DataFrame, centers: list[list[float]], nprobe: int,
                 id_col: str, vec_col: str) -> DataFrame:
    """(query_id, cell) pairs for the ``nprobe`` cosine-nearest centroids of
    each query — centroids are a literal array (they are tiny), so probing
    is pure expressions over the broadcastable query set.

    Centroids are unit-normalized HERE (in Python, they are plain lists):
    KMeans means of unit vectors have norms that shrink with cluster
    spread, so ranking by the raw dot product would bias probes toward
    tight clusters and skip diffuse cells containing true neighbors."""
    def _unit(c: list[float]) -> list[float]:
        n = sum(x * x for x in c) ** 0.5
        return c if n == 0 else [x / n for x in c]

    cent = F.array(*[
        F.struct(F.lit(i).alias("cell"),
                 F.array(*[F.lit(x) for x in _unit(c)]).alias("cv"))
        for i, c in enumerate(centers)
    ])
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("_c", F.explode(cent))
    d = dot_expr(_unit_expr(F.col("_qv")), F.col("_c.cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("_d"), F.col("_c.cell"))
    return (
        q.withColumn("_d", d)
        .withColumn("_rnk", F.row_number().over(w))
        .where(F.col("_rnk") <= nprobe)
        .select("query_id", F.col("_c.cell").alias("cell"), "_qv")
    )


def ivf_cosine_topk(corpus: DataFrame | None, queries: DataFrame, k: int = 10,
                    n_cells: int = 16, nprobe: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed: int = 42, round_digits: int = 4,
                    index: IvfIndex | None = None) -> DataFrame:
    """IVF approximate top-k: score only corpus vectors in the query's
    ``nprobe`` nearest cells (the scale path next to sign-LSH ANN).

    Pass a prebuilt ``index`` (:func:`ivf_build`) to probe without
    retraining — the serving path; without one, a throwaway index is
    trained from ``corpus`` for this call (exploratory path).

    With ``nprobe == n_cells`` this degrades gracefully to the exact
    result (every cell probed) — the recall pytest pins that identity.
    Candidate scoring joins on the cell key; a corpus vector lives in
    exactly one cell, so no candidate is scored twice.
    """
    if index is None:
        centers, assigned = ivf_assign(corpus, n_cells, seed, id_col=id_col,
                                       vec_col=vec_col)
    else:
        centers, assigned = index.centers, index.assigned
        id_col, vec_col = index.id_col, index.vec_col
    c = assigned.select("cell", F.col(id_col).alias("match_id"),
                        F.col(vec_col).alias("_cv"))
    probes = _probe_cells(queries, centers, nprobe, id_col, vec_col)
    scored = (
        c.join(F.broadcast(probes), "cell")
        .where(F.col("match_id") != F.col("query_id"))
        .withColumn("cosine",
                    F.round(cosine_expr(F.col("_qv"), F.col("_cv")), round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "match_id", "cosine", "rnk")
    )


def embedding_near_dups(df: DataFrame, threshold: float = 0.95, dim: int = 64,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        n_planes: int = 8, round_digits: int = 4,
                        max_bucket_size: int = 10_000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked then exactly
    verified — the embedding-space analogue of MinHash dedup.

    ``max_bucket_size`` drops degenerate buckets before the self-join (the
    same cap every ``dedup.py`` blocker applies): with ``n_planes=8`` there
    are only 256 buckets, and real encoder outputs cluster directionally
    into a few of them — an uncapped bucket self-join would go quadratic on
    exactly those buckets at 100 TB."""
    v = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")) \
          .withColumn("bucket", signlsh_bucket_expr(F.col("_v"), dim, n_planes))
    v = _drop_big_buckets(v, ["bucket"], max_bucket_size)
    a = v.select("bucket", F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    b = v.select("bucket", F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_expr(F.col("_va"), F.col("_vb")), round_digits))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
