"""Approximate nearest neighbor over embeddings [task brief: similarity
search — brute-force baseline + scale path].

Three tiers in the engine:

1. brute force (queries.ann_cosine_topk) — exact, oracle-checked;
2. sign-bucket IVF (queries.ann_ivf_bucketed_topk) — deterministic
   coarse quantizer, exact integer scoring, oracle-checked;
3. THIS module: trained IVF — KMeans coarse quantizer (Spark ML), probe
   the ``n_probe`` nearest centroids per query, exact cosine rank within
   the probed cells. Recall/latency knob = (n_cells, n_probe); pytest
   measures recall against the brute-force truth.

At scale the inverted lists are written bucketed by ``ivf_cell`` so a
query touches only its probed buckets (same pruning story as the
spatial cell index — ANN is PIP with learned cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_COS = (
    "aggregate(zip_with(qe, te, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0.0 as double), (s, v) -> s + v) / "
    "(sqrt(aggregate(transform(qe, x -> cast(x as double) * cast(x as double)), "
    "cast(0.0 as double), (s, v) -> s + v)) * "
    "sqrt(aggregate(transform(te, x -> cast(x as double) * cast(x as double)), "
    "cast(0.0 as double), (s, v) -> s + v)))"
)


def train_ivf(embeddings: DataFrame, n_cells: int = 4, seed: int = 42):
    """KMeans coarse quantizer over the embedding column.

    Returns (model, assigned) where assigned = embeddings + ``ivf_cell``.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vec = embeddings.withColumn("features", array_to_vector("embedding"))
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(vec)
    assigned = (
        model.transform(vec)
        .withColumnRenamed("prediction", "ivf_cell")
        .drop("features")
    )
    return model, assigned


def ivf_topk(
    assigned: DataFrame,
    model,
    query_pred,
    target_pred,
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """Probe the ``n_probe`` nearest centroids per query, exact cosine
    rank within probed cells: (qid, tid, sim, rank)."""
    import numpy as np

    centers = np.vstack([np.asarray(c) for c in model.clusterCenters()])

    q = assigned.filter(query_pred).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )

    # nearest n_probe centroids per query — centroid count is tiny, so
    # the distance table rides as a literal array expression
    probes = []
    for ci in range(len(centers)):
        lit_c = F.array(*[F.lit(float(v)) for v in centers[ci]])
        d = F.expr(
            "aggregate(zip_with(qe, _c, (x, y) -> "
            "(cast(x as double) - y) * (cast(x as double) - y)), "
            "cast(0.0 as double), (s, v) -> s + v)"
        )
        probes.append(
            q.withColumn("_c", lit_c)
            .withColumn("ivf_cell", F.lit(ci))
            .withColumn("_d", d)
            .drop("_c")
        )
    qp = probes[0]
    for p in probes[1:]:
        qp = qp.unionByName(p)
    w = Window.partitionBy("qid").orderBy("_d", "ivf_cell")
    qp = (
        qp.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_probe)
        .select("qid", "qe", "ivf_cell")
    )

    t = assigned.filter(target_pred).select(
        "ivf_cell", F.col("vec_id").alias("tid"), F.col("embedding").alias("te")
    )
    cand = qp.join(t, "ivf_cell").withColumn("sim", F.expr(_COS))
    wr = Window.partitionBy("qid").orderBy(F.desc("sim"), "tid")
    return (
        cand.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("qid", "tid", "sim", "rank")
    )
