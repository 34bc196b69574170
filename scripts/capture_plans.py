#!/usr/bin/env python
"""Capture .explain("formatted") output for named queries.

Usage:
  python scripts/capture_plans.py OUT_DIR SUFFIX q_a q_b ...

For each query name Q, builds the DataFrame via registry.queries()[Q]
against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and writes
OUT_DIR/Q_SUFFIX.txt with the formatted physical plan.  The DataFrame
is NOT executed (explain only), except that streaming-store queries pay
their one-time ingest during construction, exactly as in bench.py.

Run from the repo whose plans you want (works from a detached worktree
for "before" captures).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import traceback

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def _git_head() -> str:
    """Label every capture with the exact commit it was taken at (r14
    VERDICT "evidence hygiene": a before-plan is only evidence if the
    reader can check it against the labeled tree).  Falls back to
    'unknown+dirty' markers rather than failing the capture."""
    import subprocess

    try:
        head = subprocess.run(
            ["git", "-C", REPO_ROOT, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        dirty = subprocess.run(
            ["git", "-C", REPO_ROOT, "status", "--porcelain"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        return head + ("+dirty" if dirty else "")
    except Exception:
        return "unknown"


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("capture-plans")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spark_binlog_spark import registry

    queries = registry.queries()
    for name in names:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception:
            text = "PLAN CAPTURE FAILED:\n" + traceback.format_exc()
        with open(path, "w") as fh:
            fh.write(f"# {name} — {suffix} — sf_dir={sf_dir} — commit={_git_head()}\n")
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
