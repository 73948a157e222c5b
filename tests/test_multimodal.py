"""Multimodal column support: metadata scan, fake decode, resize, features,
frame sampling. Decode is the documented deterministic fake; everything else
(schemas, batch shapes, numpy math) is real."""
import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from tech_ml_dataset_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG\r\n\x1a\nrest-of-png"),
        (2, b"\xff\xd8\xff\xe0jpegdata"),
        (3, b"GIF89a....."),
        (4, b"plain text bytes here"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "id int, data binary")


def test_media_meta_jvm_side(spark, media):
    out = {r["id"]: r["media_meta"]
           for r in mm.with_media_meta(media, "data").collect()}
    assert out[1]["format"] == "png"
    assert out[2]["format"] == "jpeg"
    assert out[3]["format"] == "gif"
    assert out[4]["format"] == "unknown"
    assert out[4]["n_bytes"] == len(b"plain text bytes here")
    assert out[4]["md5"] == hashlib.md5(b"plain text bytes here").hexdigest()
    assert out[5] is None or out[5]["n_bytes"] is None


def test_media_meta_no_python_stage(spark, media):
    plan = mm.with_media_meta(media, "data")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure Catalyst expressions, single scan


def test_decode_image_deterministic(spark, media):
    img = {r["id"]: r["image"]
           for r in mm.decode_image(media, "data", fake_hw=(4, 4)).collect()}
    assert img[1]["height"] == 4 and img[1]["width"] == 4 and img[1]["channels"] == 3
    assert len(img[1]["pixels"]) == 4 * 4 * 3
    # deterministic: same bytes -> same pixels across runs
    again = {r["id"]: r["image"]
             for r in mm.decode_image(media, "data", fake_hw=(4, 4)).collect()}
    assert img[1]["pixels"] == again[1]["pixels"]
    assert img[1]["pixels"] != img[2]["pixels"]
    assert all(0.0 <= p <= 1.0 for p in img[1]["pixels"])


def test_resize_image(spark, media):
    decoded = mm.decode_image(media, "data", fake_hw=(8, 8))
    resized = {r["id"]: r["image"]
               for r in mm.resize_image(decoded, "image", 2, 2).collect()}
    assert resized[1]["height"] == 2 and resized[1]["width"] == 2
    assert len(resized[1]["pixels"]) == 2 * 2 * 3
    # nearest-neighbor: resized pixels are a subset of source pixels
    src = np.asarray(
        mm.decode_image(media, "data", fake_hw=(8, 8))
          .filter(F.col("id") == 1).collect()[0]["image"]["pixels"])
    assert set(np.round(resized[1]["pixels"], 5)) <= set(np.round(src, 5))


def test_image_features_shape_and_values(spark, media):
    feats = {r["id"]: r["features"] for r in mm.image_features(
        mm.decode_image(media, "data", fake_hw=(8, 8)), "image").collect()}
    v = feats[1]
    assert len(v) == 3 + 3 + 8  # mean(3) + std(3) + hist(8)
    assert abs(sum(v[6:]) - 1.0) < 1e-5  # histogram normalized
    assert all(0.0 <= x <= 1.0 for x in v[:3])


def test_frame_sample_fanout(spark, media):
    frames = mm.frame_sample(media.filter(F.col("id") == 1), "data",
                             every_n=10, n_frames=50)
    rows = frames.collect()
    assert len(rows) == 5  # frames 0,10,20,30,40
    assert sorted(r["frame_idx"] for r in rows) == [0, 10, 20, 30, 40]
    px = {r["frame_idx"]: r["frames"]["pixels"] for r in rows}
    assert px[0] != px[10]  # different frames decode differently


def test_repartition_for_decode(spark, media):
    out = mm.repartition_for_decode(media, "id")
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


def test_fused_pipeline_matches_staged(spark, media):
    staged = mm.image_features(
        mm.resize_image(mm.decode_image(media, "data", fake_hw=(8, 8)),
                        "image", 4, 4), "image")
    fused = mm.image_pipeline(media, "data", resize_hw=(4, 4), fake_hw=(8, 8))
    a = {r["id"]: r["features"] for r in staged.collect()}
    b = {r["id"]: r["features"] for r in fused.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert np.allclose(a[k], b[k], atol=1e-6)
