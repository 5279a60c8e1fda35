"""Multimodal binary plumbing: metadata, features, frame sampling."""

import pytest
from pyspark.sql import Row

from xhs_ocr_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [Row(media_id=f"m{i}", content=M.synth_media_bytes(f"m{i}")) for i in range(50)]
    rows.append(Row(media_id="junk", content=b"not-media"))
    return spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)


def test_metadata(media_df):
    meta = {r["media_id"]: r for r in M.media_metadata(media_df).collect()}
    assert "junk" not in meta  # undecodable dropped
    assert len(meta) == 50
    codec = M.SyntheticCodec()
    for i in range(50):
        kind, w, h, frames = codec.decode_meta(M.synth_media_bytes(f"m{i}"))
        r = meta[f"m{i}"]
        assert (r["kind"], r["width"], r["height"], r["n_frames"]) == (kind, w, h, frames)
        assert r["n_bytes"] == len(M.synth_media_bytes(f"m{i}"))


def test_features_deterministic(media_df):
    f1 = {r["media_id"]: r["features"] for r in M.media_features(media_df).collect()}
    f2 = {r["media_id"]: r["features"] for r in M.media_features(media_df).collect()}
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())


def test_frame_sampling(spark, media_df):
    meta = M.media_metadata(media_df)
    plan = M.frame_sample_plan(meta, every_k=4)
    rows = plan.collect()
    assert rows, "expect some videos in 50 synthetic blobs"
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    metas = {r["media_id"]: r for r in meta.collect()}
    for mid, idxs in by_id.items():
        assert idxs == list(range(0, metas[mid]["n_frames"], 4))


def test_real_codec_is_clearly_stubbed():
    with pytest.raises(NotImplementedError, match="cv2/PIL/ffmpeg"):
        M.RealCodec().decode_meta(b"anything")
