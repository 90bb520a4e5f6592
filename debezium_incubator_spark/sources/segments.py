"""Commit-log segment-name utilities (S3 support).

Port of the reference's CommitLogUtil (CommitLogUtil.java:26-103,
golden-tested by CommitLogUtilTest.java:23-75): filename validation,
ordering by the embedded timestamp/segment id, and move/delete that
refuse to touch non-commit-log files. The engine's envelopes carry these
names in ``source.file`` (``CommitLog-<v>-<seg>.log``); the GC/archive
paths use the same guarded move semantics.
"""

from __future__ import annotations

import os
import re
import shutil

SEGMENT_RE = re.compile(r"^CommitLog-\d+-(\d+)\.log$")


def is_commitlog(name: str) -> bool:
    return SEGMENT_RE.match(os.path.basename(name)) is not None


def segment_id(name: str) -> int:
    """The embedded segment id/timestamp (the ordering key,
    CommitLogUtil.java:88-103)."""
    m = SEGMENT_RE.match(os.path.basename(name))
    if not m:
        raise ValueError(f"not a commit log name: {name}")
    return int(m.group(1))


def compare_segments(a: str, b: str) -> int:
    """-1/0/1 by embedded id (≙ CommitLogUtil.compareCommitLogs)."""
    ia, ib = segment_id(a), segment_id(b)
    return (ia > ib) - (ia < ib)


def list_segments(directory: str) -> list[str]:
    """Commit-log files in a directory, in replay order
    (≙ CommitLogUtil.getCommitLogs + the processor's sort)."""
    names = [fn for fn in os.listdir(directory) if is_commitlog(fn)]
    return sorted(names, key=segment_id)


def move_segment(path: str, to_dir: str) -> bool:
    """Move a commit log (replacing any existing copy); refuses files
    that are not commit logs (≙ CommitLogUtil.moveCommitLog — the
    reference logs-and-skips, returning here as False)."""
    if not is_commitlog(path):
        return False
    os.makedirs(to_dir, exist_ok=True)
    shutil.move(path, os.path.join(to_dir, os.path.basename(path)))
    return True


def delete_segment(path: str) -> bool:
    """Delete a commit log; non-commit-log files are left alone
    (≙ CommitLogUtil.deleteCommitLog)."""
    if not is_commitlog(path):
        return False
    os.unlink(path)
    return True
