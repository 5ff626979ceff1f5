"""Leakage-safe train/val/test splits.

Splitting AFTER near-duplicate detection but BY DOCUMENT leaks: two
near-duplicates can land in train and test, and the model is evaluated
on (a paraphrase of) its training data. The standard fix is to make
near-dup CLUSTERS atomic — every member of a component inherits the
split of the component's canonical id.

Composition of existing machinery, no new distributed shapes:

* components = min-label propagation over the near-dup pair graph
  (queries/pipeline.propagate_min_labels — the d_dedup_components
  loop; edge-touched docs only, the 100 TB discipline);
* split = the deterministic md5-bucket carve
  (operators/sampling.split_assign) applied to the COMPONENT key
  (component min-id for clustered docs, own id for singletons), so the
  assignment stays reproducible across runs/layouts/engines and
  cluster members can never straddle splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import split_assign


def leakage_safe_splits(
    docs: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("id_a", "id_b"),
    seed: str = "split",
) -> DataFrame:
    """Add a ``split`` column to ``docs`` such that any two documents
    connected (transitively) through ``pairs`` share a split.

    ``pairs`` is an undirected near-dup pair list (e.g.
    s_minhash_lsh_pairs' output); it is symmetrized here. Documents in
    no pair split by their own id — identical to plain split_assign,
    so adding pair information only ever MERGES assignments."""
    # lazy import: queries/pipeline composes operators/*, so the reverse
    # edge must not exist at module import time
    from ..queries.pipeline import propagate_min_labels

    a, b = pair_cols
    edges = pairs.select(
        F.col(a).alias("src"), F.col(b).alias("dst")
    ).unionAll(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
    labels = propagate_min_labels(docs.sparkSession, edges)
    key = F.coalesce(F.col("comp"), F.col(id_col))
    return (
        docs.join(
            labels.withColumnRenamed("doc_id", "__lk_id"),
            docs[id_col] == F.col("__lk_id"),
            "left",
        )
        .withColumn("split", split_assign(key, fractions, seed=seed))
        .drop("__lk_id", "comp")
    )
