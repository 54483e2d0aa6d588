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


def load_meta(path: str) -> dict:
    """Run metadata beyond the query times: the CPU-throughput and
    job-floor control medians (contamination block) and, when the
    run recorded one (r16+), the git identity stamp. The CPU median
    normalizes away host-throughput steps (r13); the floor median
    feeds the floor-subtracted sibling reading (r16); the sha makes
    same-code adjudication checkable from the artifact instead of
    caller-asserted (r16, VERDICT r15 directive 2)."""
    try:
        with open(path) as fh:
            outer = json.load(fh)
        doc = outer
        if "parsed" in doc:
            doc = doc["parsed"] or {}
        cont = doc.get("contamination", {})
        return {
            "cpu_median": cont.get("cpu_median_sec"),
            "floor_median": cont.get("median_sec"),
            "git_sha": doc.get("git_sha"),
            "git_dirty": doc.get("git_dirty"),
            # run parameters: same sha with different sf/cpus is NOT
            # a comparable sibling — identity must not adjudicate it
            "sf": doc.get("sf"),
            "cpus": outer.get("cpus"),
        }
    except (OSError, json.JSONDecodeError):
        return {}


def load_cpu_median(path: str) -> float | None:
    """Back-compat shim: the CPU-control median only."""
    return load_meta(path).get("cpu_median")


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


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def sibling_adjudication(
    per_query: list[dict],
    uniform_tol: float = 1.15,
    meta_old: dict | None = None,
    meta_new: dict | None = None,
) -> dict:
    """Auto-classify a suspicious run against a SAME-DAY sibling run
    (r15, VERDICT r14 directive 4; r16 rework per VERDICT r15
    directive 2): on code-identical queries, per-query drift can
    only be the host or measurement noise, never the code.

    Classification order — identity first, statistics second:

    1. ``host_same_commit`` — both artifacts record the SAME clean
       git sha (r16 bench stamps it): any whole-window drift is
       environmental BY CONSTRUCTION, however heteroscedastic. This
       is the mode the r15 driver-run-vs-record pair needed: median
       1.38x with a 1.01-1.96x spread (scheduler-bound queries
       inflate with the job floor, CPU-bound ones with the CPU
       share) fails a flat-median uniformity test yet is host with
       certainty given byte-identical code.
    2. ``host_uniform`` — no identity proof, but the median ratio is
       elevated AND >=80% of queries sit within ``uniform_tol`` of
       it: whole-window host inflation even when every contamination
       control reads in-band (the r14 blind spot).
    3. ``host_control_envelope`` — no identity proof, inflation is
       heteroscedastic, but BOTH runs carry control medians and
       every per-query ratio is bounded by the most-inflated
       control's own ratio (x tol): the window's drift decomposes
       onto the controls (job-floor steal for scheduler-bound
       queries, CPU steal for compute-bound ones), which identical
       code would produce and a code regression would overshoot.
    4. ``query_specific`` — elevated ratios concentrated in a subset
       no control explains: not host-adjudicable from siblings
       alone; investigate those queries.

    A floor-subtracted median (each run's job-floor control median
    subtracted per query before the ratio) is reported alongside as
    a diagnostic — it reads through fixed scheduling overhead on
    short queries.
    """
    ratios = sorted(r["ratio"] for r in per_query if r["ratio"] > 0)
    if not ratios:
        return {"verdict": "no_shared_queries"}
    meta_old, meta_new = meta_old or {}, meta_new or {}
    n = len(ratios)
    med = _median(ratios)
    within = [
        r for r in ratios if med / uniform_tol <= r <= med * uniform_tol
    ]
    uniform_frac = len(within) / n
    slow_side = med if med >= 1 else 1 / med
    hot = [r for r in ratios if r > 1.3 or r < 1 / 1.3]
    same_params = all(
        meta_old.get(k) is None
        or meta_new.get(k) is None
        or meta_old[k] == meta_new[k]
        for k in ("sf", "cpus")
    )
    same_commit = bool(
        meta_old.get("git_sha")
        and meta_old.get("git_sha") == meta_new.get("git_sha")
        and not meta_old.get("git_dirty")
        and not meta_new.get("git_dirty")
        and same_params
    )
    # floor-subtracted diagnostic ratios (queries at/below ~2x their
    # run's floor are excluded: the subtraction leaves noise there)
    fo, fn = meta_old.get("floor_median"), meta_new.get("floor_median")
    floor_med = None
    if fo and fn:
        adj = [
            (r["new_sec"] - fn) / (r["old_sec"] - fo)
            for r in per_query
            if r["old_sec"] > 2 * fo
            and r["new_sec"] > 2 * fn
            and r["old_sec"] - fo > 0.01
            and r["new_sec"] - fn > 0.01
        ]
        floor_med = round(_median(adj), 3) if adj else None
    # control-envelope bound: the most-inflated control's own ratio
    control_ratios = []
    if meta_old.get("cpu_median") and meta_new.get("cpu_median"):
        control_ratios.append(
            meta_new["cpu_median"] / meta_old["cpu_median"]
        )
    if fo and fn:
        control_ratios.append(fn / fo)
    env_bound = max(control_ratios) if control_ratios else None
    env_frac = (
        sum(1 / uniform_tol <= r <= env_bound * uniform_tol
            for r in ratios) / n
        if env_bound
        else None
    )
    if same_commit:
        # identity proves the CODE didn't change — it does not prove
        # the runs are comparable: same code can plan differently
        # (AQE/stats/scratch state). Whole-window drift on identical
        # code is host; CONCENTRATED drift on a flat median is still
        # the investigate-these-queries pattern (r16 review find —
        # an unconditional host verdict would wave a reproducible
        # environment-triggered plan flip through the gate).
        if slow_side <= 1.10:
            verdict = (
                "same_commit_concentrated" if hot else "equivalent"
            )
        else:
            verdict = "host_same_commit"
    elif slow_side <= 1.10:
        # flat median: the WINDOW agrees — but individually hot
        # queries on a flat window are exactly the concentrated
        # pattern to investigate, not an equivalence
        verdict = "query_specific" if hot else "equivalent"
    elif uniform_frac >= 0.8:
        verdict = "host_uniform"
    elif env_bound and env_bound >= 1.10 and env_frac >= 0.95:
        verdict = "host_control_envelope"
    else:
        verdict = "query_specific"
    notes = {
        "host_same_commit": (
            "both artifacts record the same clean sha "
            f"({str(meta_old.get('git_sha'))[:12]}): drift is "
            "environmental by construction; use the faster sibling "
            "as the record"
        ),
        "host_uniform": (
            "new run is uniformly slower on code-identical queries: "
            "host steal; use the faster sibling as the record"
            if med > 1
            else "new run is uniformly faster: the OLD window was "
            "the inflated one"
        ),
        "host_control_envelope": (
            "heteroscedastic inflation bounded by the most-inflated "
            f"control ratio ({round(env_bound, 3) if env_bound else None}"
            "x): job-floor/CPU steal decomposition; use the faster "
            "sibling as the record"
        ),
        "same_commit_concentrated": (
            "code-identical runs, flat median, but a hot subset — "
            "not a code change, yet possibly a reproducible "
            "plan/environment flip: investigate the flagged queries"
        ),
    }
    return {
        "verdict": verdict,
        "median_ratio": round(med, 3),
        "uniform_fraction": round(uniform_frac, 3),
        "uniform_tolerance": uniform_tol,
        "same_commit": same_commit,
        "floor_subtracted_median_ratio": floor_med,
        "control_envelope_bound": (
            round(env_bound, 3) if env_bound else None
        ),
        "control_envelope_fraction": (
            round(env_frac, 3) if env_frac is not None else None
        ),
        "queries": n,
        "note": notes.get(verdict),
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
        "--assert-same-code",
        action="store_true",
        help="caller asserts the two runs are code-identical even "
        "though the artifacts carry no matching git stamp (pre-r16 "
        "files): lets a host verdict suppress the exit gate; "
        "without this OR a matching recorded sha, a statistical "
        "host verdict is reported but flags still gate (r15 ADVICE: "
        "a mislabeled pair could wave a uniform regression through)",
    )
    ap.add_argument(
        "--quiet", action="store_true", help="print only the summary JSON"
    )
    args = ap.parse_args()
    meta_old, meta_new = load_meta(args.old), load_meta(args.new)
    rep = compare(
        load_queries(args.old),
        load_queries(args.new),
        args.threshold,
        old_cpu=meta_old.get("cpu_median"),
        new_cpu=meta_new.get("cpu_median"),
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
        if args.assert_same_code:
            # caller-asserted identity: rank it like a matching sha
            # (the flag is an explicit, logged statement — distinct
            # from the silent premise the r15 ADVICE flagged). It
            # may FILL IN missing identity, never contradict
            # recorded identity: artifacts carrying two different
            # shas refute the assertion.
            o_sha, n_sha = meta_old.get("git_sha"), meta_new.get("git_sha")
            if o_sha and n_sha and o_sha != n_sha:
                print(
                    f"--assert-same-code contradicts the artifacts: "
                    f"recorded shas differ ({o_sha[:12]} vs "
                    f"{n_sha[:12]})",
                    file=sys.stderr,
                )
                return 2
            for k in ("sf", "cpus"):
                ov, nv = meta_old.get(k), meta_new.get(k)
                if ov is not None and nv is not None and ov != nv:
                    # same code at different run params is not a
                    # sibling pair — say WHICH premise failed instead
                    # of silently ignoring the flag (r16 review find)
                    print(
                        f"--assert-same-code refused: recorded {k} "
                        f"differs ({ov} vs {nv}) — the runs are not "
                        "comparable siblings regardless of code "
                        "identity",
                        file=sys.stderr,
                    )
                    return 2
            for m in (meta_old, meta_new):
                m["git_sha"] = "asserted-same-code"
                m["git_dirty"] = False
        rep["sibling"] = sibling_adjudication(
            rep["per_query"], meta_old=meta_old, meta_new=meta_new
        )
    summary = {k: v for k, v in rep.items() if k != "per_query"}
    print(json.dumps(summary))
    if args.sibling and rep["sibling"]["verdict"].startswith("host_"):
        # adjudicated host — but suppressing the nonzero exit needs
        # code identity from the artifacts (matching clean shas) or
        # the explicit --assert-same-code flag; a bare statistical
        # verdict on unproven inputs keeps the gate (r15 ADVICE: a
        # genuinely uniform regression on a mislabeled pair must not
        # exit green). The flagged list is in the summary either way.
        if rep["sibling"]["same_commit"]:
            return 0
        print(
            "sibling: host verdict WITHOUT code-identity proof — "
            "flags still gate (pass --assert-same-code or use "
            "r16+ artifacts with git stamps)",
            file=sys.stderr,
        )
    return 1 if rep["flagged"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
