"""Multimodal plumbing: mapInPandas decode over binary columns, schema
stability, frame-sample explode, and the stub's clear failure mode."""

from __future__ import annotations

import pytest

from bigdata_storage_and_proccess_job_data_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", M.encode_fake_media(640, 480, 1), "s3://bucket/a.img"),
        (2, "video", M.encode_fake_media(1920, 1080, 120), "s3://bucket/b.vid"),
        (3, "audio", M.encode_fake_media(0, 0, 4410), "s3://bucket/c.aud"),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA).repartition(2)


def test_decode_media(media_df):
    out = {r.media_id: r.asDict() for r in M.decode_media(media_df).collect()}
    assert out[1]["width"] == 640 and out[1]["height"] == 480
    assert out[2]["n_frames"] == 120 and out[2]["kind"] == "video"
    assert out[3]["n_frames"] == 4410
    assert all(r["format"] == "fake" for r in out.values())
    assert all(r["byte_len"] == 26 for r in out.values())


def test_decode_schema_stable(media_df):
    df = M.decode_media(media_df)
    assert df.schema == M.DECODED_SCHEMA


def test_frame_sampling(media_df):
    frames = M.frame_sample_plan(M.decode_media(media_df), every_n=50).collect()
    vid = sorted(r.frame_index for r in frames if r.media_id == 2)
    assert vid == [0, 50, 100]
    img = [r.frame_index for r in frames if r.media_id == 1]
    assert img == [0]


def test_unknown_format_raises_not_implemented(spark):
    bad = spark.createDataFrame(
        [(9, "image", b"REALJPEGBYTES", "s3://x")], M.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|real media"):
        M.decode_media(bad).collect()
