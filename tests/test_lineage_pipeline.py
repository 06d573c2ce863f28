"""Lineage/checkpoint + resume, pipeline runner, spark-submit packaging
[BASELINE.json north_rule: resumable per-partition lineage; spark-submit
--py-files]."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from mapshaper_spark.operators import spatial_join as sj
from mapshaper_spark.plans import lineage, pipeline
from mapshaper_spark.sources import testdata

from .conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def tmpdirs(tmp_path):
    return str(tmp_path / "out"), str(tmp_path / "lineage")


def _staged_input(spark):
    return sj.with_cell(testdata.customer_points(spark, SF_SMOKE), res=6)


def test_stage_writes_lineage_and_verifies(spark, tmpdirs):
    out, ln = tmpdirs
    df = _staged_input(spark)
    m = lineage.run_stage(df, "s1", out, ln, res=6, bucket_res=2)
    assert m["buckets_skipped"] == 0 and m["rows"] == df.count()
    assert lineage.verify_lineage(spark, out, ln, "s1")
    rec = spark.read.parquet(ln)
    # every lineage row carries a real cell range
    assert rec.filter(F.col("cell_lo") > F.col("cell_hi")).count() == 0


def test_resume_processes_only_missing_buckets(spark, tmpdirs):
    out, ln = tmpdirs
    df = _staged_input(spark)
    bex = lineage.bucket_expr("cell_id", 6, 2)
    half = df.filter(F.expr(bex) % 2 == 0)

    m1 = lineage.run_stage(half, "s1", out, ln, res=6, bucket_res=2)
    assert m1["buckets_skipped"] == 0

    # resume with the FULL input: completed buckets must be skipped
    m2 = lineage.run_stage(df, "s1", out, ln, res=6, bucket_res=2)
    assert m2["buckets_skipped"] == m1["buckets_done"]
    assert m1["rows"] + m2["rows"] == df.count()

    # final durable output == a clean full run (order-insensitive)
    got = spark.read.parquet(out).drop("_bucket", "_stage")
    assert got.count() == df.count()
    assert got.exceptAll(df).count() == 0 and df.exceptAll(got).count() == 0
    assert lineage.verify_lineage(spark, out, ln, "s1")


def test_crash_between_data_and_lineage_replays_exactly_once(spark, tmpdirs):
    """The commit protocol: the lineage row is the commit marker. Simulate
    a crash AFTER the data write but BEFORE the lineage append (the data
    partitions exist, no lineage rows), then replay the stage — dynamic
    partition overwrite on (_bucket, _stage) must replace the orphaned
    partitions, not append duplicates [ADVICE r1: non-atomic commit]."""
    out, ln = tmpdirs
    df = _staged_input(spark)
    bex = lineage.bucket_expr("cell_id", 6, 2)
    orphan = (
        df.withColumn("_bucket", F.expr(bex))
        .withColumn("_stage", F.lit("s1"))
        .repartition(F.col("_bucket"))
    )
    (
        orphan.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_bucket", "_stage")
        .parquet(out)
    )
    assert spark.read.parquet(out).count() == df.count()  # orphaned data landed

    m = lineage.run_stage(df, "s1", out, ln, res=6, bucket_res=2)
    assert m["buckets_skipped"] == 0 and m["rows"] == df.count()
    assert spark.read.parquet(out).count() == df.count()  # replaced, not doubled
    assert lineage.verify_lineage(spark, out, ln, "s1")
    assert lineage.verify_lineage(spark, out, ln)  # whole-table check too


def test_two_stages_sharing_buckets_verify_independently(spark, tmpdirs):
    """Two stages land rows into the SAME buckets of one output table —
    per-stage verification must see only that stage's rows and the
    whole-table check must combine lineage across stages
    [ADVICE r1: multi-batch bucket overlap]."""
    out, ln = tmpdirs
    df = _staged_input(spark)
    a = df.filter(F.col("point_id") % 2 == 0)
    b = df.filter(F.col("point_id") % 2 == 1)  # same cells → same buckets
    lineage.run_stage(a, "s1", out, ln, res=6, bucket_res=2)
    lineage.run_stage(b, "s2", out, ln, res=6, bucket_res=2)
    assert spark.read.parquet(out).count() == df.count()
    assert lineage.verify_lineage(spark, out, ln, "s1")
    assert lineage.verify_lineage(spark, out, ln, "s2")
    assert lineage.verify_lineage(spark, out, ln)


def test_compaction_collapses_stages_into_one_generation(spark, tmpdirs, tmp_path):
    """Three stages sharing buckets → compact into a fresh generation:
    one stage dir, same rows, dest lineage verifies, source untouched."""
    import os

    out, ln = tmpdirs
    df = _staged_input(spark)
    for i in range(3):
        lineage.run_stage(
            df.filter(F.col("point_id") % 3 == i), f"s{i}", out, ln, res=6, bucket_res=2
        )
    dest = str(tmp_path / "gen2")
    dln = str(tmp_path / "gen2_ln")
    m = lineage.compact(spark, out, ln, dest, dln)
    assert m["verified"] and m["rows"] == df.count()
    got = spark.read.parquet(dest)
    assert got.select("_stage").distinct().count() == 1
    a = got.drop("_bucket", "_stage")
    assert a.exceptAll(df).count() == 0 and df.exceptAll(a).count() == 0
    assert lineage.verify_lineage(spark, dest, dln)
    # source generation untouched (old stages still verify)
    for i in range(3):
        assert lineage.verify_lineage(spark, out, ln, f"s{i}")
    assert len([d for d in os.listdir(out) if d.startswith("_bucket=")]) > 0


def test_rerun_after_complete_is_noop(spark, tmpdirs):
    out, ln = tmpdirs
    df = _staged_input(spark)
    lineage.run_stage(df, "s1", out, ln, res=6, bucket_res=2)
    m = lineage.run_stage(df, "s1", out, ln, res=6, bucket_res=2)
    assert m["buckets_done"] == 0 and m["rows"] == 0
    assert spark.read.parquet(out).count() == df.count()


def test_pipeline_matches_direct_query(spark):
    spec = {
        "source": {"kind": "customer_points", "sf_dir": SF_SMOKE},
        "ops": [
            {"op": "pip_attribute"},
            {"op": "tile_assign", "z": 4},
            {"op": "count_by", "keys": ["poly_id", "tile_x", "tile_y"], "alias": "n_images"},
        ],
    }
    got = pipeline.run_pipeline(spark, spec)
    from mapshaper_spark import queries as Q

    want = Q.entry_query(spark, SF_SMOKE)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_pipeline_checkpoint_stage_boundary(spark, tmp_path):
    out = str(tmp_path / "ckpt")
    ln = str(tmp_path / "ckpt_lineage")
    spec = {
        "source": {"kind": "customer_points", "sf_dir": SF_SMOKE},
        "ops": [
            {"op": "with_cell", "res": 6},
            {"op": "checkpoint", "stage": "cells", "out": out, "lineage": ln, "res": 6},
            {"op": "count_by", "keys": ["cell_id"]},
        ],
    }
    got = pipeline.run_pipeline(spark, spec)
    base = sj.with_cell(testdata.customer_points(spark, SF_SMOKE), 6).groupBy("cell_id").count()
    assert got.count() == base.count()
    assert lineage.verify_lineage(spark, out, ln, "cells")


def test_spark_submit_py_files_pipeline(tmp_path):
    """The ship path: zip the package, spark-submit with --py-files from a
    cwd OUTSIDE the repo (so only the zip provides the engine)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import package as pkg

    zip_path = pkg.build(str(tmp_path / "mapshaper_spark.zip"))
    spec = {
        "source": {"kind": "customer_points", "sf_dir": SF_SMOKE},
        "ops": [
            {"op": "pip_attribute"},
            {"op": "count_by", "keys": ["poly_id"], "alias": "n"},
        ],
    }
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(spec))
    out = str(tmp_path / "out.parquet")

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    r = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            os.path.join(REPO, "jobs", "run_pipeline.py"),
            "--spec",
            str(spec_path),
            "--out",
            out,
        ],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    last = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    assert json.loads(last)["rows"] > 0
