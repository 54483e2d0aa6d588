"""Cross-revision same-JVM A/B for the r13 write-path movers
(r13 VERDICT directive 1).

The r13 driver bench flagged the only two queries with NO
code-identity receipt: `q_ingest_batch` 1.265 -> 2.379 s (1.88x) and
stream ingest 681 -> 2535 ms/batch (3.7x). The builder's clean-window
run predates the merge-grammar commits that touched txnlog.py's write
path (`_conform` cast-back, `_regen_after_assign`), so "host vs code"
is genuinely open — and unlike tools/bench_ab.py's protocol, a
code-identity proof is impossible by construction (the code DID
change). This tool runs a true two-arm A/B instead:

1. `git worktree add` the OLD revision (default ab3b8fd, the r12
   round commit) into a throwaway dir.
2. In ONE Python process / ONE Spark JVM, alternate arms by purging
   `market_data_lakehouse_spark*` + `bench` from sys.modules and
   re-importing from the arm's path — each sample runs that arm's
   actual write path against the same live session, interleaved
   round-robin with arm order flipped every round so slow host
   windows hit both arms equally.
3. Both arms sample the SAME kernels the recorded numbers came from:
   `bench.bench_ingest` (best-of-2 fresh-lake batch ingest) and
   `bench.bench_ingest_stream` (best-of-2 4-micro-batch availableNow
   drain, mean_batch_ms).

Verdict per metric: head_median / old_median >= 1.25 in the same JVM
window = CODE regression (the host cancels out); <= 1/1.25 =
improvement; otherwise the two arms cost the same and the recorded
drift was the host (matching the r13 host-step receipts in
`cpu_control_calibration_r13`).

Results merge into AB_BENCH.json under "r14_writepath_ab".

Usage:
    python tools/ab_writepath.py [--rounds 3] [--old-rev ab3b8fd]
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# recorded values the verdict flagged (BENCH_r12.json driver run vs
# BENCH_r13.json driver run)
RECORDED = {
    "q_ingest_batch_sec": (1.265, 2.3786),
    "stream_mean_batch_ms": (681.0, 2535.0),
}


def _purge_and_import(arm_path: str):
    """Make `bench` and the package import from arm_path, purging any
    previously loaded copies. Returns the arm's bench module."""
    for name in list(sys.modules):
        if name == "bench" or name.startswith("market_data_lakehouse_spark"):
            del sys.modules[name]
    # drop both arm roots wherever they sit, then put this arm first
    sys.path = [p for p in sys.path if p not in _ARM_PATHS]
    sys.path.insert(0, arm_path)
    return importlib.import_module("bench")


_ARM_PATHS: list[str] = []


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--old-rev", default="ab3b8fd")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    wt = f"/tmp/ab_writepath_{args.old_rev}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, args.old_rev],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
    _ARM_PATHS[:] = [REPO, wt]
    arms = {"head": REPO, "old": wt}

    # session config is identical at both revs (session.py unchanged,
    # verified in-round); boot it from HEAD
    sys.path.insert(0, REPO)
    from market_data_lakehouse_spark.session import get_spark

    spark = get_spark("ab_writepath")

    # untimed warmup per arm: first call pays the write plan's
    # one-time codegen, which neither recorded number includes
    for arm_path in arms.values():
        b = _purge_and_import(arm_path)
        b.bench_ingest(spark, args.sf_dir)

    samples: dict[str, dict[str, list[float]]] = {
        m: {"head": [], "old": []} for m in RECORDED
    }
    order = ["head", "old"]
    for rnd in range(args.rounds):
        for arm in order:
            b = _purge_and_import(arms[arm])
            spark._jvm.System.gc()
            samples["q_ingest_batch_sec"][arm].append(
                round(b.bench_ingest(spark, args.sf_dir), 4)
            )
            spark._jvm.System.gc()
            st = b.bench_ingest_stream(spark, args.sf_dir)
            samples["stream_mean_batch_ms"][arm].append(st["mean_batch_ms"])
        order.reverse()  # cancel slow-window bias across rounds

    report = {
        "protocol": (
            "one JVM, two code arms via module purge + sys.path swap "
            f"(HEAD vs {args.old_rev} worktree), {args.rounds} "
            "rounds, arm order flipped per round, GC between samples"
        ),
        "old_rev": args.old_rev,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "metrics": {},
    }
    for metric, rec in RECORDED.items():
        old_v, head_v = samples[metric]["old"], samples[metric]["head"]
        om, hm = statistics.median(old_v), statistics.median(head_v)
        ratio = round(hm / om, 3)
        if ratio >= 1.25:
            verdict = "code_regression"
        elif ratio <= 0.8:
            verdict = "code_improvement"
        else:
            verdict = "arms_equal_host_step"
        report["metrics"][metric] = {
            "old_samples": old_v,
            "head_samples": head_v,
            "old_median": round(om, 4),
            "head_median": round(hm, 4),
            "head_vs_old_same_jvm": ratio,
            "recorded_r12": rec[0],
            "recorded_r13_driver": rec[1],
            "recorded_ratio": round(rec[1] / rec[0], 3),
            "verdict": verdict,
        }

    path = os.path.join(REPO, "AB_BENCH.json")
    doc = json.load(open(path)) if os.path.exists(path) else {}
    doc["r14_writepath_ab"] = report
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(
        json.dumps(
            {
                m: {
                    "ratio": v["head_vs_old_same_jvm"],
                    "verdict": v["verdict"],
                }
                for m, v in report["metrics"].items()
            }
        )
    )
    subprocess.run(
        ["git", "worktree", "remove", "--force", wt],
        cwd=REPO,
        capture_output=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
