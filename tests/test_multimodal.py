"""Multimodal binary-column plumbing: frame sampling edge cases.

Mirrors the reference's round-trip test style
(/root/reference/tests/test_parquet_writer.py:38-58): feed known payloads
through the real Spark path and assert exact bytes out.
"""

import pyarrow as pa
import pytest

from universal_parquet_exporter_spark.operators.multimodal import sample_frames


@pytest.fixture(scope="module")
def frames_df(spark):
    rows = [
        (0, b""),  # empty payload -> 4 empty frames
        (1, b"ab"),  # shorter than frame_bytes and n_frames
        (2, bytes(range(64))),  # exact multiple
        (3, b"x" * 100),  # ragged tail
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    return sample_frames(df, n_frames=4, frame_bytes=16)


def test_frame_counts_and_offsets(frames_df):
    rows = {(r.doc_id, r.frame_idx): r for r in frames_df.collect()}
    assert len(rows) == 16  # 4 docs x 4 frames, empties included
    # offsets are evenly spaced floor(i*n/4)
    assert [rows[(2, i)].frame_off for i in range(4)] == [0, 16, 32, 48]
    assert [rows[(3, i)].frame_off for i in range(4)] == [0, 25, 50, 75]


def test_frame_bytes_exact(frames_df):
    rows = {(r.doc_id, r.frame_idx): bytes(r.frame) for r in frames_df.collect()}
    assert rows[(0, 0)] == b"" and rows[(0, 3)] == b""
    assert rows[(1, 0)] == b"ab"  # start 0, take min(16, 2)
    assert rows[(1, 1)] == b"ab"  # start (2*1)//4 = 0 again for short docs
    data = bytes(range(64))
    for i in range(4):
        assert rows[(2, i)] == data[i * 16 : i * 16 + 16]
    assert rows[(3, 3)] == b"x" * 16  # start 75, take 16 of 100


def test_frame_batch_split_matches_unsplit(spark):
    """When a batch's sampled bytes exceed the int32-offset cap the
    emitter splits into row slices; a tiny cap must produce EXACTLY the
    rows the unsplit path produces (regression for the silent int32
    truncation the old cast allowed)."""
    rows = [(i, bytes([i % 251]) * (20 + i)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").coalesce(1)
    base = {
        (r.doc_id, r.frame_idx): (r.frame_off, bytes(r.frame))
        for r in sample_frames(df, n_frames=4, frame_bytes=16).collect()
    }
    # cap of 40 bytes -> at most 2 full 16-byte frames per slice
    split = {
        (r.doc_id, r.frame_idx): (r.frame_off, bytes(r.frame))
        for r in sample_frames(df, n_frames=4, frame_bytes=16, max_batch_bytes=40).collect()
    }
    assert split == base


def test_frame_batch_split_exact_boundary(spark):
    """Cap exactly equal to a frame multiple: frames that FIT must never
    raise (regression: side='left' searchsorted under-counted by one on
    an exact cumulative-offset boundary)."""
    df = spark.createDataFrame(
        [(i, bytes([i]) * 64) for i in range(8)], "doc_id long, payload binary"
    ).coalesce(1)
    base = {
        (r.doc_id, r.frame_idx): bytes(r.frame)
        for r in sample_frames(df, n_frames=2, frame_bytes=16).collect()
    }
    # cap 17: each 16-byte frame fits; the boundary 16 == cap-1+0 hits
    # the searchsorted target exactly
    got = {
        (r.doc_id, r.frame_idx): bytes(r.frame)
        for r in sample_frames(df, n_frames=2, frame_bytes=16, max_batch_bytes=17).collect()
    }
    assert got == base
    # cap exactly one frame (16): also fits
    got16 = {
        (r.doc_id, r.frame_idx): bytes(r.frame)
        for r in sample_frames(df, n_frames=2, frame_bytes=16, max_batch_bytes=16).collect()
    }
    assert got16 == base


def test_frame_over_cap_raises_not_truncates(spark):
    """A single frame larger than the cap must fail loudly, never wrap
    offsets."""
    df = spark.createDataFrame([(1, b"y" * 64)], "doc_id long, payload binary")
    with pytest.raises(Exception, match="int32"):
        sample_frames(df, n_frames=1, frame_bytes=64, max_batch_bytes=32).collect()


def test_frame_bytes_short_doc_offsets(spark):
    df = spark.createDataFrame([(7, b"abcdef")], "doc_id long, payload binary")
    got = {r.frame_idx: (r.frame_off, bytes(r.frame)) for r in sample_frames(df).collect()}
    # starts = (6*i)//4 = 0,1,3,4
    assert got == {
        0: (0, b"abcdef"),
        1: (1, b"bcdef"),
        2: (3, b"def"),
        3: (4, b"ef"),
    }
