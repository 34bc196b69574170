#!/usr/bin/env python
"""Fold a quiet bench capture into baseline_operative.json (VERDICT r13
ask #4 upkeep): per-query operative rows = min(existing, new reading),
with explicit overrides for formal re-baselines (plan/shape changes
REPLACE the old row instead of min-ing against it — pass
``--override name=sec`` for those, mirroring the BASELINE.md note).

    python scripts/update_operative_baseline.py [bench_detail.json]
        [--override q_foo=1.23 ...]
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO_ROOT, "baseline_operative.json")


def main() -> None:
    src = "bench_detail.json"
    overrides: dict[str, float] = {}
    for arg in sys.argv[1:]:
        if arg.startswith("--override"):
            continue
        if "=" in arg and arg.split("=")[0].startswith("q_"):
            k, v = arg.split("=", 1)
            overrides[k] = float(v)
        else:
            src = arg
    detail = json.load(open(os.path.join(REPO_ROOT, src)))
    if float(detail.get("sf", 0)) < 0.1:
        raise SystemExit(f"{src} is an sf={detail.get('sf')} capture; operative rows are sf0.1")
    cur = json.load(open(OUT)) if os.path.exists(OUT) else {}
    doc = cur.pop("_doc", "operative per-query baselines (sf0.1, local[32], quiet)")
    new: dict[str, float] = {k: v for k, v in cur.items() if isinstance(v, (int, float))}
    for qmap_key in ("queries", "queries_v2"):
        for k, v in (detail.get(qmap_key) or {}).items():
            if isinstance(v, (int, float)) and v > 0:
                new[k] = min(new.get(k, float("inf")), v)
    new.update(overrides)
    json.dump(
        {"_doc": doc, **{k: round(v, 3) for k, v in sorted(new.items())}},
        open(OUT, "w"),
        indent=1,
    )
    print(f"updated {OUT}: {len(new)} rows ({len(overrides)} overrides)")


if __name__ == "__main__":
    main()
