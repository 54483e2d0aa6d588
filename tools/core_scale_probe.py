"""8-core vs 32-core wall ratios at 10x scale (VERDICT r16 directive 4).

At sf0.1 every bench query is scheduling-floor-bound, so the driver's
8-vs-32-core comparison reads ~1.0 across the board and carries zero
parallelism evidence. This probe builds the 10x key-shifted copy of
sf0.1 (the structure-preserving construction from
``tools/scale_probe.py`` — disjoint component copies, rotated document
alphabets, copy-0-only ANN queries) and times the TOP-10 most
expensive bench queries in a FRESH JVM PER (query, core-count) ARM
(``local[32]`` vs ``local[8]``), min of 2 passes each, matching the
bench's timing policy. Results merge into SCALE_PROBE.json under
``core_scaling_10x`` with per-query 8c/32c wall ratios.

Usage:
    python tools/core_scale_probe.py [--factor 10] [--keep-dir DIR]
    python tools/core_scale_probe.py --child 8 /path/to/scaled   # internal
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# top-10 by the r17 round-start bench (plus the two write-path
# lifecycle entries displaced by this round's triangle/LSH wins) —
# label -> registry name, or the special INGEST marker for the
# DataLakehouse batch-write pass.
PROBE_QUERIES = {
    "q_triangle_count": "g2_triangle_count",
    "q_pagerank": "g1_pagerank",
    "q_connected_components": "g5_connected_components",
    "q_row_tracking": "s22_row_tracking",
    "q_lsh_verified": "e2_lsh_verified_jaccard",
    "q_kcore": "g4_kcore",
    "q_liquid_clustering": "s23_liquid_clustering",
    "q_minhash_lsh": "e2_minhash_lsh",
    "q_ann_lsh": "e3_ann_lsh",
    "q_ingest_batch": "INGEST",
}


def child(cores: int, sf_dir: str, label: str) -> None:
    """One query in one fresh JVM. The first probe version ran all 10
    queries in a single session per core count and the 100-second
    triangle-at-10x run poisoned every query after it (GC/old-gen
    pressure read as 2-3x NEGATIVE core scaling on pagerank/CC —
    isolated re-runs measured 8.1 s where the shared JVM measured
    21 s). Per-(query, arm) isolation makes the two arms symmetric
    and neighbor-free, exactly like the driver's per-query floor."""
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from bench import bench_ingest
    from market_data_lakehouse_spark.queries import REGISTRY
    from market_data_lakehouse_spark.session import get_spark

    qname = PROBE_QUERIES[label]
    spark = get_spark(f"core_probe_{cores}")
    spark.range(1).write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobDescription(f"core_probe:{label}")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        if qname == "INGEST":
            best = min(best, bench_ingest(spark, sf_dir))
            continue
        REGISTRY[qname].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
    spark.stop()
    print("CHILD_RESULT " + json.dumps({label: round(best, 4)}))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--label", default=None)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--keep-dir",
        default="/tmp/mdl_scale10x",
        help="scaled-copy location (reused if the build marker matches)",
    )
    ap.add_argument("dir", nargs="?", help="(child mode) scaled dir")
    args = ap.parse_args()

    if args.child is not None:
        child(args.child, args.dir, args.label)
        return 0

    marker = os.path.join(args.keep_dir, "_built.json")
    want = {"sf_dir": args.sf_dir, "factor": args.factor}
    if not (
        os.path.exists(marker) and json.load(open(marker)) == want
    ):
        os.environ["SPARK_GRAFT_CPUS"] = "32"
        from market_data_lakehouse_spark.session import get_spark
        from scale_probe import scaled_dir  # noqa: E402

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        spark = get_spark("core_probe_build")
        t0 = time.perf_counter()
        scaled_dir(spark, args.sf_dir, args.factor, args.keep_dir)
        spark.stop()
        print(f"built {args.factor}x copy in {time.perf_counter()-t0:.1f}s")
        with open(marker, "w") as fh:
            json.dump(want, fh)

    results: dict[str, dict[str, float]] = {"32": {}, "8": {}}
    for label in PROBE_QUERIES:
        for cores in (32, 8):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 str(cores), "--label", label, args.keep_dir],
                capture_output=True, text=True, cwd=REPO,
                env={**os.environ, "SPARK_GRAFT_CPUS": str(cores)},
            )
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("CHILD_RESULT ")]
            if not line:
                print(f"child {cores}/{label} failed:\n{p.stdout[-2000:]}"
                      f"\n{p.stderr[-1000:]}")
                return 1
            got = json.loads(line[-1][len("CHILD_RESULT "):])
            results[str(cores)].update(got)
            print(f"  [{cores}c] {label}: {got[label]}s", flush=True)

    per_query = {}
    for label in PROBE_QUERIES:
        t32 = results["32"].get(label)
        t8 = results["8"].get(label)
        if t32 and t8:
            per_query[label] = {
                "sec_32c": t32,
                "sec_8c": t8,
                "ratio_8c_over_32c": round(t8 / t32, 3),
            }
    entry = {
        "protocol": (
            f"{args.factor}x key-shifted copy of {args.sf_dir} "
            "(scale_probe.scaled_dir construction); fresh JVM per "
            "(query, core-count) arm; min of 2 passes per query "
            "(bench policy)"
        ),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "factor": args.factor,
        "per_query": per_query,
    }
    path = os.path.join(REPO, "SCALE_PROBE.json")
    doc = json.load(open(path)) if os.path.exists(path) else {}
    doc["core_scaling_10x"] = entry
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(entry, indent=1))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    raise SystemExit(main())
