"""Crash-safe directory swap for the parquet-backed sinks.

The naive ``rmtree(live); move(tmp, live)`` has a window with NO live
copy: a crash inside it makes a later ``resume=True`` restart see a
missing directory and silently re-bootstrap from the original snapshot
while the streaming checkpoint still marks earlier batches committed —
silent data loss.

``safe_swap`` uses move-aside ordering (live -> .old, tmp -> live,
delete .old): every instant has at least one complete copy on disk.
``recover_dir`` runs at sink construction and repairs any crash point:
a finished tmp (``_SUCCESS`` present — Spark's committer writes it
last) is newer than ``.old``, so it wins; otherwise ``.old`` is
restored; stale leftovers are cleared so they cannot confuse a later
recovery.

Sequencing invariant relied on by the sinks: tmps are written (and
therefore complete) strictly before any swap starts, and swaps happen
in a fixed order — so cross-directory recovery can never resurrect a
state the batch-replay path can't reconcile (see IncrementalAggSink's
batch_id guard / MergeOnReadSink's convergent delta overwrite).
"""

from __future__ import annotations

import glob
import os
import shutil

__all__ = ["safe_swap", "recover_dir"]


def _tmp_candidates(live: str) -> list[str]:
    return [p for p in glob.glob(live + ".b*") + glob.glob(live + ".compact") if os.path.isdir(p)]


def safe_swap(live: str, tmp: str) -> None:
    """Replace ``live`` with ``tmp`` keeping a complete copy at every instant."""
    old = live + ".old"
    shutil.rmtree(old, ignore_errors=True)
    shutil.move(live, old)
    shutil.move(tmp, live)
    shutil.rmtree(old)


def recover_dir(live: str) -> bool:
    """Repair ``live`` after a crash; returns True iff ``live`` exists after.

    Preference order when ``live`` is missing: newest COMPLETE tmp
    (its content supersedes the pre-swap copy), else ``.old``.  All
    other leftovers are removed either way.
    """
    old = live + ".old"
    tmps = _tmp_candidates(live)
    if not os.path.isdir(live):
        complete = [t for t in tmps if os.path.exists(os.path.join(t, "_SUCCESS"))]
        if complete:
            newest = max(complete, key=os.path.getmtime)
            shutil.move(newest, live)
        elif os.path.isdir(old):
            shutil.move(old, live)
    shutil.rmtree(old, ignore_errors=True)
    for t in tmps:
        shutil.rmtree(t, ignore_errors=True)  # already-moved path is a no-op
    return os.path.isdir(live)


def remove_with_checksum(path: str) -> None:
    """Remove a data file AND its hidden ``.{name}.crc`` sibling (the
    local Hadoop committer writes one per part file; deleting only the
    data file leaks one orphaned checksum per compacted-away file —
    invisible to Spark reads but unbounded listing debris)."""
    os.remove(path)
    crc = os.path.join(os.path.dirname(path), "." + os.path.basename(path) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
