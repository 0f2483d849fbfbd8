"""Regenerate docs/ARTIFACTS.md: the measured cold-build cost of every
disk-tier artifact, from one pass over the full query registry against
a FRESH artifact store (SPARK_GRAFT_ARTIFACTS → temp dir).

This is the evidence behind the cold/warm bench gap: the residual
cold-start seconds are first-build work of these named artifacts, and
this table shows exactly where each second goes (r8 verdict task 3).
Artifacts whose builders derive from other artifacts (trade_pairs from
trade_links_weighted) show their marginal cost, not a re-join.

Usage: python tools/artifact_costs.py  (run from anywhere; ~4 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    store = tempfile.mkdtemp(prefix="artifact-costs-")
    os.environ["SPARK_GRAFT_ARTIFACTS"] = store
    try:
        from iot_sparkstreaming_spark import artifacts
        from iot_sparkstreaming_spark.queries.registry import load_all
        from iot_sparkstreaming_spark.session import get_spark

        spark = get_spark("artifact-costs")
        t0 = time.perf_counter()
        for name, q in load_all().items():
            try:
                q.spark(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001 — one bad query must not hide the rest
                print(f"WARN {name}: {type(e).__name__}: {e}", file=sys.stderr)
        wall = time.perf_counter() - t0

        builds = sorted(artifacts.BUILD_TIMES.items(), key=lambda kv: -kv[1])
        total = sum(artifacts.BUILD_TIMES.values())
        lines = [
            "# Artifact cold-build costs (generated — do not edit)",
            "",
            "Regenerate with `python tools/artifact_costs.py`. One pass over",
            f"the full query registry at sf_dir={SF_DIR} against a FRESH",
            "artifact store: every disk-tier artifact is built exactly once",
            "and timed (builder + atomic parquet save). This is the",
            "per-artifact breakdown of the cold-start residual the warm",
            "bench never pays — build-once work, amortized across every",
            "consumer query and every later session.",
            "",
            f"Registry pass wall-clock: {wall:.1f} s; artifact builds:",
            f"{total:.1f} s across {len(builds)} artifacts.",
            "",
            "| artifact | cold build (s) |",
            "|---|---|",
        ]
        lines += [f"| {name} | {sec:.2f} |" for name, sec in builds]
        out = REPO / "docs" / "ARTIFACTS.md"
        out.write_text("\n".join(lines) + "\n")
        print(f"wrote {out} ({len(builds)} artifacts, {total:.1f} s total builds)")
        spark.stop()
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
