"""Round-over-round bench drift gate.

Diffs two BENCH_r{N}.json files (or any two bench JSON lines) on the
queries they share: per-query ratio, shared-subset totals, and a flag
list of queries that regressed past the threshold (default 1.3x, the
bound VERDICT.md holds rounds to). Exit code 1 when anything is
flagged, so the bench commit can gate on it.

Usage:
    python tools/bench_compare.py BENCH_r03.json BENCH_r04.json
    python tools/bench_compare.py old.json new.json --threshold 1.3
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        doc = json.load(fh)
    # driver-recorded files wrap the bench line under "parsed";
    # bench.py's own stdout line is the flat form
    if "parsed" in doc:
        if doc["parsed"] is None:
            # r8 regression: once the stdout line crossed ~2 kB the
            # driver recorded parsed=null and only a tail fragment —
            # recover the per-query times from the tail's intact
            # `"q_name": sec` pairs (bench.py now keeps the line
            # compact, so this is a backstop for old files)
            tail = doc.get("tail", "")
            pairs = re.findall(r'"(q_\w+)":\s*([0-9.]+)', tail)
            got = {q: float(v) for q, v in pairs}
            # r11: backfill queries the tail truncated away from the
            # same round's committed compare artifact (its per_query
            # new_sec values ARE that round's measurements)
            m = re.search(r"BENCH_r(\d+)\.json$", path)
            if m:
                sib = path.replace(
                    f"BENCH_r{m.group(1)}", f"BENCH_COMPARE_r{m.group(1)}"
                )
                try:
                    with open(sib) as fh:
                        cmp_doc = json.load(fh)
                    for r in cmp_doc.get("per_query", []):
                        got.setdefault(r["query"], float(r["new_sec"]))
                except (OSError, json.JSONDecodeError, KeyError):
                    pass
            if not got:
                raise ValueError(f"{path}: parsed null and no tail pairs")
            return got
        doc = doc["parsed"]
    return dict(doc["queries"])


def load_cpu_median(path: str) -> float | None:
    """The run's CPU-throughput-control median (contamination block):
    the fixed-work probe whose duration is inversely proportional to
    the CPU share Spark got. Dividing a run's total by it cancels
    host-throughput steps (r13: the host lost ~35% sustained CPU and
    every raw cross-round ratio read ~1.3x pessimistic)."""
    try:
        with open(path) as fh:
            doc = json.load(fh)
        if "parsed" in doc:
            doc = doc["parsed"] or {}
        return doc.get("contamination", {}).get("cpu_median_sec")
    except (OSError, json.JSONDecodeError):
        return None


def compare(
    old: dict[str, float],
    new: dict[str, float],
    threshold: float,
    old_cpu: float | None = None,
    new_cpu: float | None = None,
) -> dict:
    shared = sorted(set(old) & set(new))
    rows = []
    for q in shared:
        ratio = new[q] / old[q] if old[q] > 0 else float("inf")
        rows.append(
            {
                "query": q,
                "old_sec": old[q],
                "new_sec": new[q],
                "ratio": round(ratio, 3),
            }
        )
    rows.sort(key=lambda r: -r["ratio"])
    old_sum = sum(old[q] for q in shared)
    new_sum = sum(new[q] for q in shared)
    raw_ratio = round(new_sum / old_sum, 3) if old_sum else None
    # CPU-normalized ratio (r13 VERDICT directive 2): divide each
    # run's total by its own CPU-control median before comparing, so
    # a host-throughput step reads as arithmetic instead of needing a
    # noise adjudication. raw 1.3x with old_cpu 0.28 / new_cpu 0.38
    # normalizes to ~0.96x — same code, slower host.
    norm_ratio = (
        round((new_sum / new_cpu) / (old_sum / old_cpu), 3)
        if old_sum and old_cpu and new_cpu
        else None
    )
    return {
        "shared_queries": len(shared),
        "old_shared_total_sec": round(old_sum, 4),
        "new_shared_total_sec": round(new_sum, 4),
        "shared_total_ratio": raw_ratio,
        "cpu_control_medians": {"old": old_cpu, "new": new_cpu},
        "cpu_normalized_shared_total_ratio": norm_ratio,
        "flagged": [r for r in rows if r["ratio"] > threshold],
        "improved": [r for r in rows if r["ratio"] < 1 / threshold],
        "only_in_new": sorted(set(new) - set(old)),
        "only_in_old": sorted(set(old) - set(new)),
        "per_query": rows,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old", help="previous round's bench JSON")
    ap.add_argument("new", help="this round's bench JSON")
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument(
        "--quiet", action="store_true", help="print only the summary JSON"
    )
    args = ap.parse_args()
    rep = compare(
        load_queries(args.old),
        load_queries(args.new),
        args.threshold,
        old_cpu=load_cpu_median(args.old),
        new_cpu=load_cpu_median(args.new),
    )
    if not args.quiet:
        for r in rep["per_query"]:
            mark = " <<< FLAG" if r["ratio"] > args.threshold else ""
            print(
                f"{r['query']:24s} {r['old_sec']:8.3f} -> {r['new_sec']:8.3f}"
                f"  x{r['ratio']:.2f}{mark}",
                file=sys.stderr,
            )
    summary = {k: v for k, v in rep.items() if k != "per_query"}
    print(json.dumps(summary))
    return 1 if rep["flagged"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
