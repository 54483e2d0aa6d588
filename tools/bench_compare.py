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


def sibling_adjudication(
    per_query: list[dict], uniform_tol: float = 1.15
) -> dict:
    """Auto-classify a suspicious run against a SAME-DAY, SAME-CODE
    sibling run (r15, VERDICT r14 directive 4 — this codifies the
    hand analysis in AB_BENCH.json `r14_second_run_adjudication`):
    on code-identical queries, per-query drift can only be the host
    or measurement noise, never the code. The telling pattern is
    UNIFORM whole-window inflation — the median ratio is elevated
    AND most queries sit within ``uniform_tol`` of that median —
    which is host steal even when every contamination control reads
    in-band (the r14 blind spot: a 1.25x window with all controls
    under their ceilings). Concentrated inflation (a few hot
    queries, flat median) is NOT adjudicated as host — investigate
    those queries.

    Verdicts:
    - ``equivalent``        median within 10% — runs agree
    - ``host_uniform``      elevated median, >=80% of queries within
                            tol of it: whole-window host inflation;
                            prefer the faster sibling as the record
    - ``query_specific``    elevated ratios concentrated in a subset:
                            not host-adjudicable from siblings alone
    """
    ratios = sorted(r["ratio"] for r in per_query if r["ratio"] > 0)
    if not ratios:
        return {"verdict": "no_shared_queries"}
    n = len(ratios)
    med = (
        ratios[n // 2]
        if n % 2
        else (ratios[n // 2 - 1] + ratios[n // 2]) / 2
    )
    within = [
        r for r in ratios if med / uniform_tol <= r <= med * uniform_tol
    ]
    uniform_frac = len(within) / n
    slow_side = med if med >= 1 else 1 / med
    hot = [r for r in ratios if r > 1.3 or r < 1 / 1.3]
    if slow_side <= 1.10:
        # flat median: the WINDOW agrees — but individually hot
        # queries on a flat window are exactly the concentrated
        # pattern to investigate, not an equivalence
        verdict = "query_specific" if hot else "equivalent"
    elif uniform_frac >= 0.8:
        verdict = "host_uniform"
    else:
        verdict = "query_specific"
    return {
        "verdict": verdict,
        "median_ratio": round(med, 3),
        "uniform_fraction": round(uniform_frac, 3),
        "uniform_tolerance": uniform_tol,
        "queries": n,
        "note": (
            "new run is uniformly slower on code-identical queries: "
            "host steal; use the faster sibling as the record"
            if verdict == "host_uniform" and med > 1
            else "new run is uniformly faster: the OLD window was "
            "the inflated one"
            if verdict == "host_uniform"
            else None
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old", help="previous round's bench JSON")
    ap.add_argument("new", help="this round's bench JSON")
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument(
        "--sibling",
        action="store_true",
        help="the two runs are SAME-DAY, SAME-CODE siblings: emit a "
        "host-vs-query-specific adjudication of whole-window drift "
        "(uniform inflation on code-identical queries = host, even "
        "with in-band contamination controls)",
    )
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
    if args.sibling:
        rep["sibling"] = sibling_adjudication(rep["per_query"])
    summary = {k: v for k, v in rep.items() if k != "per_query"}
    print(json.dumps(summary))
    if args.sibling and rep["sibling"]["verdict"] == "host_uniform":
        # adjudicated: per-query flags are the host's doing on
        # code-identical queries — don't gate on them.
        # query_specific (and equivalent-with-flags) keep the gate:
        # concentrated inflation is exactly the case to investigate
        # (r15 review find: an unconditional 0 waved those through)
        return 0
    return 1 if rep["flagged"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
