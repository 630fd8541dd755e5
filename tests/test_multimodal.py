"""Multimodal plumbing tests beyond the differential gate."""

from __future__ import annotations

import pytest

from solana_snapshot_etl_tools_spark.fixtures import build_fixture, media_df
from solana_snapshot_etl_tools_spark.operators import multimodal as MM


def test_real_codec_is_gated(spark):
    with pytest.raises(NotImplementedError, match="PIL|Pillow"):
        MM.decode_media_meta(media_df(spark), codec="real")
    with pytest.raises(NotImplementedError):
        MM.sample_frames(media_df(spark), codec="real")


def test_corrupt_blobs_skip_not_fail(spark):
    meta = MM.decode_media_meta(media_df(spark))
    bad = meta.filter(meta.format.isNull())
    assert bad.count() == 3  # the three planted corrupt blobs
    # and every input row produced exactly one output row
    assert meta.count() == len(build_fixture()["media"])


def test_frame_sampling_counts(spark):
    frames = MM.sample_frames(media_df(spark), every_k=2)
    exp = build_fixture()["expected"]["frame_sample"][2]
    assert frames.count() == len(exp)
    got = {(r.media_id, r.frame_idx, r.frame_md5) for r in frames.collect()}
    assert got == set(exp)
