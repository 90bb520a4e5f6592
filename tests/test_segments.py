"""Port of CommitLogUtilTest.java:23-75 — segment-name validation,
ordering, and the guarded move/delete semantics."""

import os

import pytest

from debezium_incubator_spark.sources import segments as sg


def _touch(d, name):
    p = os.path.join(str(d), name)
    open(p, "w").close()
    return p


def test_move_commitlog_only(tmp_path):
    """testMoveCommitLog: commit logs move; imposters stay behind."""
    src = tmp_path / "from"
    dst = tmp_path / "to"
    src.mkdir()
    dst.mkdir()
    _touch(src, "CommitLog-6-1.log")
    _touch(src, "Not-CommitLog-6-1.log")
    for fn in os.listdir(src):
        sg.move_segment(os.path.join(str(src), fn), str(dst))
    assert os.listdir(dst) == ["CommitLog-6-1.log"]
    assert os.listdir(src) == ["Not-CommitLog-6-1.log"]


def test_delete_commitlog_only(tmp_path):
    """testDeleteCommitLog: only commit logs are deleted."""
    good = _touch(tmp_path, "CommitLog-6-1.log")
    bad = _touch(tmp_path, "Not-CommitLog-6-1.log")
    assert sg.delete_segment(good) is True
    assert sg.delete_segment(bad) is False
    assert not os.path.exists(good) and os.path.exists(bad)


def test_get_commitlogs(tmp_path):
    """testGetCommitLogs: discovery filters imposters; order is by the
    embedded segment id (the processor's replay order)."""
    for i in range(10):
        prefix = "CommitLog" if i % 2 == 0 else "Not-CommitLog"
        _touch(tmp_path, f"{prefix}-6-{i}.log")
    got = sg.list_segments(str(tmp_path))
    assert got == [f"CommitLog-6-{i}.log" for i in (0, 2, 4, 6, 8)]


def test_compare_commitlogs():
    """testCompareCommitLogs: -1/0/1 by embedded id, not lexicographic
    (CommitLog-6-10 must sort after CommitLog-6-9)."""
    assert sg.compare_segments("CommitLog-6-1.log", "CommitLog-6-2.log") == -1
    assert sg.compare_segments("CommitLog-6-1.log", "CommitLog-6-0.log") == 1
    assert sg.compare_segments("CommitLog-6-1.log", "CommitLog-6-1.log") == 0
    assert sg.compare_segments("CommitLog-6-10.log", "CommitLog-6-9.log") == 1
    with pytest.raises(ValueError):
        sg.segment_id("nope.log")


def test_generator_source_files_are_valid_segments(spark):
    """The engine's own envelopes carry well-formed segment names in
    source.file, ordered consistently with the offset."""
    from pyspark.sql import functions as F

    from debezium_incubator_spark.sources.generator import gen_changelog

    rows = (
        gen_changelog(spark, n_keys=20, n_repos=3, n_slots=40, segment_size=64)
        .select("offset", F.col("source.file").alias("f"))
        .collect()
    )
    assert all(sg.is_commitlog(r["f"]) for r in rows)
    by_offset = sorted(rows, key=lambda r: r["offset"])
    segs = [sg.segment_id(r["f"]) for r in by_offset]
    assert segs == sorted(segs)  # segment order consistent with offsets
