"""Crash-safety properties of streaming/swap.py.

Enumerates EVERY crash point of the safe_swap sequence and asserts
recover_dir restores a complete live dir (old or new content, never a
mix, never missing) with no leftover .old/.b*/.compact dirs.
"""

import os
import shutil

from spark_binlog_spark.streaming.swap import recover_dir, safe_swap


def _mk(dirpath, tag, success=True):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "part-00000.parquet"), "w") as f:
        f.write(tag)
    if success:
        open(os.path.join(dirpath, "_SUCCESS"), "w").close()


def _content(dirpath):
    with open(os.path.join(dirpath, "part-00000.parquet")) as f:
        return f.read()


def _leftovers(base):
    parent = os.path.dirname(base)
    name = os.path.basename(base)
    return [d for d in os.listdir(parent) if d.startswith(name) and d != name]


class TestSafeSwapCrashPoints:
    def _setup(self, tmp_path, i):
        live = str(tmp_path / f"case{i}" / "live")
        tmp = live + ".b7"
        _mk(live, "OLD")
        _mk(tmp, "NEW")
        return live, tmp

    def test_no_crash(self, tmp_path):
        live, tmp = self._setup(tmp_path, 0)
        safe_swap(live, tmp)
        assert _content(live) == "NEW" and _leftovers(live) == []
        assert recover_dir(live)  # idempotent on a healthy dir
        assert _content(live) == "NEW" and _leftovers(live) == []

    def test_crash_after_move_aside(self, tmp_path):
        """live -> .old done, tmp not yet moved in: NEW must win (it is
        complete and newer)."""
        live, tmp = self._setup(tmp_path, 1)
        shutil.move(live, live + ".old")
        assert recover_dir(live)
        assert _content(live) == "NEW"
        assert _leftovers(live) == []

    def test_crash_after_move_in(self, tmp_path):
        """tmp moved to live, .old not yet deleted: NEW stays, .old cleared."""
        live, tmp = self._setup(tmp_path, 2)
        shutil.move(live, live + ".old")
        shutil.move(tmp, live)
        assert recover_dir(live)
        assert _content(live) == "NEW"
        assert _leftovers(live) == []

    def test_crash_with_incomplete_tmp(self, tmp_path):
        """tmp has no _SUCCESS (crash mid-write): live is untouched and
        must survive; the torn tmp is cleared."""
        live = str(tmp_path / "case3" / "live")
        _mk(live, "OLD")
        _mk(live + ".b9", "TORN", success=False)
        assert recover_dir(live)
        assert _content(live) == "OLD"
        assert _leftovers(live) == []

    def test_crash_before_any_swap_with_finished_tmp(self, tmp_path):
        """live present + finished tmp (crash between tmp write and
        swap): live wins (the swap never started; replay rebuilds tmp)."""
        live, tmp = self._setup(tmp_path, 4)
        assert recover_dir(live)
        assert _content(live) == "OLD"
        assert _leftovers(live) == []

    def test_missing_live_incomplete_tmp_restores_old(self, tmp_path):
        """live moved aside AND tmp torn (double fault): .old must be
        restored rather than promoting the torn tmp."""
        live = str(tmp_path / "case5" / "live")
        _mk(live + ".old", "OLD")
        _mk(live + ".b3", "TORN", success=False)
        assert recover_dir(live)
        assert _content(live) == "OLD"
        assert _leftovers(live) == []

    def test_total_loss_reports_false(self, tmp_path):
        live = str(tmp_path / "case6" / "live")
        os.makedirs(os.path.dirname(live), exist_ok=True)
        assert recover_dir(live) is False
