"""Interleaved same-JVM A/B court for the r9 connected-components
plan change (r8 VERDICT directive 5: apply the pagerank
adaptive-broadcast lesson to the CC kernel).

- arm ``old_plan``: the r8 kernel verbatim — shuffle joins for both
  the propagation and the halving lookup, THREE eager
  localCheckpoints per round (labels seed + stepped + labels), and
  the symmetrized edge table left UN-checkpointed (its lineage —
  for e2_dedup_clusters, the whole n-gram Jaccard pipeline —
  re-executes every round).
- arm ``new_plan``: the shipped `dedup.connected_components` —
  broadcast the label side into both joins while the exact node
  count fits autoBroadcastJoinThreshold (edges never shuffle), ONE
  eager checkpoint per round (stepped), edge table checkpointed
  once.

Both arms run the g5 graph (sparsified customer-supplier, the bench's
q_connected_components input) in ONE JVM, strictly alternating for N
rounds after one untimed warmup each; every sample is a full cold
plan build + driver loop + collect. Output equality is asserted on
the warmup pair. Results merge into AB_BENCH.json under
"g5_cc_plan_ab".

Usage:
    python tools/ab_cc.py [--rounds 5] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from market_data_lakehouse_spark.queries.catalog import load  # noqa: E402
from market_data_lakehouse_spark.queries.dedup import (  # noqa: E402
    MAX_CC_ROUNDS,
    connected_components,
)
from market_data_lakehouse_spark.session import get_spark  # noqa: E402


def _graph(spark, sf_dir):
    """The g5 graph (relational.g5_connected_components' edge
    definition, kept in sync by the output-equality assert)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter((F.col("o_custkey") + F.col("l_suppkey")) % 3 == 0)
        .select(
            F.col("o_custkey").alias("u"),
            (F.lit(4000000000) + F.col("l_suppkey")).alias("v"),
        )
        .distinct()
    )
    nodes = (
        e0.select("u").union(e0.select(F.col("v").alias("u"))).distinct()
    )
    return nodes, e0


def cc_old_plan(vertices, edges, max_rounds=MAX_CC_ROUNDS):
    """The r8 kernel, byte-for-byte semantics: shuffle joins, three
    eager checkpoints per round, un-checkpointed edge table."""
    und = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    verts = vertices.select("u")
    nodes = verts.unionByName(und.select("u")).distinct()
    labels = nodes.select(
        F.col("u"), F.col("u").alias("lbl")
    ).localCheckpoint()
    total = lambda df: df.agg(  # noqa: E731
        F.sum(F.col("lbl").cast("decimal(38,0)"))
    ).first()[0]
    prev = total(labels)
    for _ in range(max_rounds):
        prop = und.join(
            labels.withColumnRenamed("u", "v"), "v"
        ).select("u", "lbl")
        stepped = (
            labels.unionByName(prop)
            .groupBy("u")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        lbl_of_lbl = stepped.select(
            F.col("u").alias("lbl"), F.col("lbl").alias("lbl2")
        )
        labels = (
            stepped.join(lbl_of_lbl, "lbl", "left")
            .select(
                "u",
                F.least(
                    F.col("lbl"), F.coalesce("lbl2", F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint()
        )
        cur = total(labels)
        if cur == prev:
            return labels.join(verts, "u", "left_semi")
        prev = cur
    raise RuntimeError("old-plan CC did not converge")


def best_of_3(samples: list[float]) -> list[float]:
    return [min(samples[i : i + 3]) for i in range(len(samples) - 2)]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    spark = get_spark("ab_cc")

    def run(arm) -> tuple[float, frozenset]:
        nodes, e0 = _graph(spark, args.sf_dir)
        t0 = time.perf_counter()
        rows = arm(nodes, e0).collect()
        dt = time.perf_counter() - t0
        return dt, frozenset((r.u, r.lbl) for r in rows)

    # untimed warmups double as the output-equality court
    _, out_old = run(cc_old_plan)
    _, out_new = run(connected_components)
    assert out_old == out_new, "plan change altered the labeling"

    samples: dict[str, list[float]] = {"old_plan": [], "new_plan": []}
    for _ in range(args.rounds):
        for name, arm in (
            ("old_plan", cc_old_plan),
            ("new_plan", connected_components),
        ):
            spark._jvm.System.gc()
            dt, _ = run(arm)
            samples[name].append(round(dt, 4))

    def stats(vals):
        return {
            "samples_sec": vals,
            "min": min(vals),
            "median": round(statistics.median(vals), 4),
            "bo3_min": round(min(best_of_3(vals)), 4)
            if len(vals) >= 3
            else None,
        }

    med_old = statistics.median(samples["old_plan"])
    med_new = statistics.median(samples["new_plan"])
    entry = {
        "protocol": (
            f"one JVM, strictly alternating, {args.rounds} samples/arm, "
            "GC between samples, warmup pair output-equality asserted"
        ),
        "sf_dir": args.sf_dir,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "old_plan": stats(samples["old_plan"]),
        "new_plan": stats(samples["new_plan"]),
        "new_over_old_median": round(med_new / med_old, 3),
        "verdict": "new_plan_faster" if med_new < med_old else "old_plan_faster",
    }
    path = os.path.join(REPO, "AB_BENCH.json")
    doc = json.load(open(path)) if os.path.exists(path) else {}
    doc["g5_cc_plan_ab"] = entry
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=2)
    print(
        json.dumps(
            {
                "old_median": round(med_old, 3),
                "new_median": round(med_new, 3),
                "ratio": entry["new_over_old_median"],
                "verdict": entry["verdict"],
                "artifact": "AB_BENCH.json",
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
