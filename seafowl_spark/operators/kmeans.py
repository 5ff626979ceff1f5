"""K-means codebook training for IVF ANN, as pure DataFrame ops.

Closes the loop the IVF query documents (queries/extended.py s_ann_ivf:
"at 100 TB only codebook training changes — sampled k-means instead of
first-k"): Lloyd's algorithm where every per-row step is a JVM column
expression and the only driver-side state is the k x dim codebook itself.

Per iteration:

* ASSIGN — squared-L2 distance to each centroid is a ``zip_with`` +
  ``aggregate`` fold (whole-stage codegen; k folds per row), argmin via
  ``array_position`` of the array minimum (first-min-wins, deterministic);
* UPDATE — ``posexplode`` the vectors and average per (cell, dimension):
  one shuffle carrying map-side partial sums, then a bounded collect of
  exactly k x dim rows. Empty cells keep their previous centroid.

Initialization is the k lowest-id vectors — fully deterministic, so two
runs over the same corpus produce the same codebook (the property corpus
builds need; k-means++ buys better spread but costs determinism unless
seeded hashing is added). At 100 TB you fit on a sampled fraction
(``df.sample`` upstream) and assign the full corpus once at the end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    lit = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_cells(df: DataFrame, centroids: list[list[float]], vec_col: str = "emb") -> DataFrame:
    """Add ``cell`` (0-based nearest-centroid index, first-min-wins)."""
    dists = F.array(*[_sq_dist(F.col(vec_col), c) for c in centroids])
    return df.withColumn(
        "cell", (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    )


def fit_kmeans(
    df: DataFrame,
    vec_col: str = "emb",
    id_col: str = "vec_id",
    k: int = 16,
    max_iter: int = 10,
    tol: float = 1e-6,
) -> list[list[float]]:
    """Train a k-centroid codebook with Lloyd's iterations; returns the
    centroids (list of k vectors). Stops when the max squared centroid
    shift drops below ``tol`` or after ``max_iter`` rounds."""
    if k <= 0:
        raise ValueError("k must be positive")
    init_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(init_rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(init_rows)}")
    centroids = [list(map(float, r[vec_col])) for r in init_rows]
    dim = len(centroids[0])

    for _ in range(max_iter):
        assigned = assign_cells(df, centroids, vec_col)
        # per-(cell, dim) means: k*dim bounded rows back to the driver
        stats = (
            assigned.select("cell", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty cells keep old position
        by_cell: dict[int, list[float]] = {}
        for r in stats:
            by_cell.setdefault(r["cell"], [0.0] * dim)[r["pos"]] = r["m"]
        for cell, vec in by_cell.items():
            new[cell] = vec
        shift = max(
            sum((a - b) ** 2 for a, b in zip(old, nw))
            for old, nw in zip(centroids, new)
        )
        centroids = new
        if shift < tol:
            break
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "emb",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF search with a trained codebook: corpus rows live in their
    nearest cell; each query probes its ``nprobe`` nearest cells and
    scores exact cosine only within them. The search is a hash join on
    the cell id — candidate work is proportional to probed-cell sizes,
    never the corpus."""
    from pyspark.sql.window import Window

    c = assign_cells(corpus, centroids, vec_col).select(
        F.col(id_col), F.col(vec_col).alias("__c_emb"), "cell"
    )
    qd = F.array(*[_sq_dist(F.col(vec_col), cent) for cent in centroids])
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__q_emb"),
        F.explode(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.zip_with(
                            qd,
                            F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                            lambda d, i: F.struct(d.alias("d"), i.alias("i")),
                        )
                    ),
                    lambda s: s["i"],
                ),
                1,
                nprobe,
            )
        ).alias("cell"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("__c_emb"), F.col("__q_emb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def _norm(col: Column) -> Column:
        return F.sqrt(
            F.aggregate(
                F.transform(col, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
            )
        )

    denom = _norm(F.col("__c_emb")) * _norm(F.col("__q_emb"))
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            # zero-norm vectors score 0 instead of tripping ANSI division
            F.when(denom > 0, dot / denom).otherwise(F.lit(0.0)).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), id_col)
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= k)
        .select(query_id_col, id_col, "cosine", F.col("__rank").alias("rank"))
    )
