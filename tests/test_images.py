"""Images pipeline: payload invariants, thumbnails, near-dup blocking
[BASELINE.json north_rule PSNR>=40dB, caption equality, phash]."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapshaper_spark import fixtures
from mapshaper_spark.operators import images as images_op


def test_invariants_all_pass(spark):
    inv = images_op.verify_invariants(fixtures.images_df(spark, 64, partitions=4))
    rows = inv.collect()
    assert len(rows) == 64
    assert all(r["phash_ok"] for r in rows), "phash recompute mismatch"
    assert all(r["caption_ok"] for r in rows), "caption inequality"
    assert min(r["psnr_db"] for r in rows) >= 40.0, "lossy roundtrip below 40dB"


def test_thumbnails_shape_and_determinism(spark):
    th = images_op.thumbnails(fixtures.images_df(spark, 16, partitions=2), size=8)
    rows = {r["image_id"]: r for r in th.collect()}
    assert len(rows) == 16
    r = fixtures.make_image(3)
    px = np.frombuffer(r["bytes"], dtype=np.uint8).reshape(r["h"], r["w"], 3)
    want = images_op.resize_nearest(px, 8, 8).tobytes()
    assert bytes(rows["img000000003"]["thumb"]) == want


def test_decode_stub_raises_for_codec_formats():
    with pytest.raises(NotImplementedError):
        images_op.decode(b"\xff\xd8", 1, 1, "jpeg")


def test_near_dup_pairs_symmetric_bound(spark):
    imgs = fixtures.images_df(spark, 128, partitions=4).select("image_id", "phash")
    pairs = images_op.phash_near_dup_pairs(imgs, prefix_bits=4, max_hamming=28)
    pdf = pairs.toPandas()
    assert (pdf["id_a"] < pdf["id_b"]).all()
    assert (pdf["hamming"] <= 28).all()


def test_bytes_pruned_from_parquet_scan(spark, tmp_path):
    """Guard: on the real storage path (parquet), the near-dup plan's
    scan must prune the binary column — bytes never enter the shuffle."""
    path = str(tmp_path / "imgs")
    fixtures.images_df(spark, 16, partitions=2).write.parquet(path)
    imgs = spark.read.parquet(path)
    plan = images_op.phash_near_dup_pairs(
        imgs.select("image_id", "phash"), 4, 28
    )._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<image_id:string,phash:bigint>" in plan
    assert "bytes:binary" not in plan and "binary" not in plan
