"""Trained IVF ANN: recall against the brute-force truth."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mapshaper_spark.operators import ann
from mapshaper_spark.sources import testdata

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def setup(spark):
    e = testdata.load(spark, SF, "embeddings")
    model, assigned = ann.train_ivf(e, n_cells=4)
    assigned = assigned.cache()
    qp = F.col("vec_id") < 16
    tp = F.col("vec_id") >= 16
    q = e.filter(qp).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    t = e.filter(tp).select(F.col("vec_id").alias("tid"), F.col("embedding").alias("te"))
    cand = t.crossJoin(F.broadcast(q)).withColumn("sim", F.expr(ann._COS))
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "tid")
    truth = (
        cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5).cache()
    )
    return model, assigned, qp, tp, truth


def _recall(got, truth):
    inter = got.select("qid", "tid").intersect(truth.select("qid", "tid")).count()
    return inter / truth.count()


def test_ivf_recall_increases_with_probes(spark, setup):
    model, assigned, qp, tp, truth = setup
    recalls = [
        _recall(ann.ivf_topk(assigned, model, qp, tp, k=5, n_probe=p), truth)
        for p in (1, 2, 3)
    ]
    assert recalls[0] <= recalls[1] <= recalls[2]
    assert recalls[2] >= 0.75  # 3 of 4 cells probed


def test_ivf_full_probe_is_exact(spark, setup):
    model, assigned, qp, tp, truth = setup
    got = ann.ivf_topk(assigned, model, qp, tp, k=5, n_probe=4)
    assert _recall(got, truth) == 1.0


def test_ivf_candidates_restricted_to_probed_cells(spark, setup):
    model, assigned, qp, tp, _truth = setup
    got = ann.ivf_topk(assigned, model, qp, tp, k=5, n_probe=1)
    # with 1 probe the candidate set is a strict subset → some rank-5
    # lists may be short, but never longer than k
    per_q = got.groupBy("qid").count().agg(F.max("count")).collect()[0][0]
    assert per_q <= 5
