"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small) query
  side, dot products via zip_with/aggregate HOFs (JVM-side), window
  row_number for top-k. Correct baseline at any corpus size; the query
  side must be broadcastable.
- ``lsh_bucket_topk``        — scale path: random-hyperplane LSH signs
  bucket both sides; only same-bucket pairs are scored. Recall is
  tunable via number of hyperplane tables; deterministic planes derived
  from a seeded LCG so results are reproducible cluster-wide.
- ``ivf_topk``               — IVF-style: k-means-ish centroid assignment
  using a deterministic sample of corpus vectors as centroids; probes
  the nprobe nearest centroids only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns (JVM HOFs, no UDF)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double")).alias(col)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Plan shape: corpus stays partitioned; queries broadcast; the score
    is computed map-side; one shuffle for the per-query top-k window.
    At 100 TB the window shuffle is per-query-id and AQE-coalesced; for
    huge query sets switch to ``lsh_bucket_topk``.
    """
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), _as_double(vec_col).alias("_cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("_qv")
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("corpus_id") != F.col("query_id")
    )
    scored = scored.withColumn("cosine", cosine(F.col("_qv"), F.col("_cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes (LCG; no numpy on executors)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of ``vec`` against each hyperplane → long."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        pos = _dot(vec, plane) > 0
        bits.append(F.when(pos, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long")))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only pairs sharing an LSH bucket.

    One equi-join shuffle on the bucket id instead of a cross join —
    the 100 TB path. Recall < 1; raise ``n_planes`` tables or union
    multiple seeds for higher recall.
    """
    planes = _hyperplanes(dim, n_planes)
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), _as_double(vec_col).alias("_cv")
    ).withColumn("bucket", lsh_signature(F.col("_cv"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("_qv")
    ).withColumn("bucket", lsh_signature(F.col("_qv"), planes))
    scored = (
        c.join(q, "bucket")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .withColumn("cosine", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus by nearest
    centroid, probe only the ``nprobe`` nearest lists per query.

    Centroids are a deterministic DISTRIBUTED hash sample: order by
    ``md5(id)`` and take the first ``n_centroids`` — a partial top-k
    (per-partition heads merged), never a full corpus collect, so the
    driver holds exactly ``n_centroids`` rows regardless of corpus size.
    md5 scrambles any id clustering, so the sample is uniform-ish; no
    iterative k-means, so the plan stays a fixed DAG — swap in trained
    centroids for better recall without changing the shape.

    Plan: one pass assigns corpus vectors to centroid lists (broadcast
    centroids, argmin in array space); queries fan out to nprobe lists;
    the scoring join is an equi join on the centroid id — the 100 TB
    shuffle is bounded by nprobe/n_centroids of the cross product.
    """
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), _as_double(vec_col).alias("_cv")
    )
    cent = (
        corpus.select(
            F.col(id_col).alias("centroid_id"),
            _as_double(vec_col).alias("_ce"),
        )
        .orderBy(
            F.md5(F.col("centroid_id").cast("string")).asc(),
            F.col("centroid_id").asc(),
        )
        .limit(n_centroids)
    )

    def nearest_lists(df: DataFrame, vec: str, n: int, out: str) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cent)).withColumn(
            "_sim", cosine(F.col(vec), F.col("_ce"))
        )
        w = Window.partitionBy(df.columns[0]).orderBy(
            F.col("_sim").desc(), F.col("centroid_id").asc()
        )
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= n)
            .select(*df.columns, F.col("centroid_id").alias(out))
        )

    assigned = nearest_lists(c, "_cv", 1, "list_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("_qv")
    )
    probed = nearest_lists(q, "_qv", nprobe, "list_id")

    scored = (
        assigned.join(probed, "list_id")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .withColumn("cosine", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def embedding_near_dup(
    vectors: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH candidate buckets."""
    planes = _hyperplanes(dim, n_planes)
    v = vectors.select(
        F.col(id_col), _as_double(vec_col).alias("_v")
    ).withColumn("bucket", lsh_signature(F.col("_v"), planes))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("cosine", cosine(F.col("a._v"), F.col("b._v")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cosine",
        )
    )
