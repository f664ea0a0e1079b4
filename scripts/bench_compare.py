#!/usr/bin/env python3
"""Headline-first bench gate (r9 verdict #3).

Compares a fresh BENCH_QUERIES.json against a reference snapshot
(default: the committed copy via `git show`), leading with the 28-query
headline tier and flagging headline movers >1.3x round-over-round --
the queries worth a Profile floor check before calling them regressions
(host drift routinely swings individual queries; the headline tier is
the low-variance core the round-over-round comparison is anchored on).

Usage:
  python3 scripts/bench_compare.py [NEW.json] [REF.json]
  # defaults: NEW = ./BENCH_QUERIES.json, REF = git show HEAD:BENCH_QUERIES.json
"""
import json
import re
import subprocess
import sys

def load(path):
    with open(path) as f:
        return json.load(f)

def load_ref(argv):
    if len(argv) > 2:
        return load(argv[2])
    out = subprocess.run(
        ["git", "show", "HEAD:BENCH_QUERIES.json"],
        capture_output=True, text=True, check=True).stdout
    return json.loads(out)

def bench_source():
    return open("src/main/scala/graft/Bench.scala").read()

def headline_set():
    # parsed from graft.Bench so the two tools cannot drift
    src = bench_source()
    start = src.index("val Headline")
    end = src.index(")", src.index("Set(", start))
    names = [t.strip().strip('"') for t in
             src[src.index("(", start) + 1:end].replace("\n", "").split(",")]
    return {n for n in names if n.startswith("q")}

def mover_gate():
    # the ratio/abs gate lives in Bench (it adjudicates inline); parse it
    # from the same source as the headline set so a threshold change in
    # either place cannot silently open a band the other doesn't cover
    src = bench_source()
    ratio = float(re.search(r"val MoverRatio = ([0-9.]+)", src).group(1))
    abs_s = float(re.search(r"val MoverAbsSecs = ([0-9.]+)", src).group(1))
    return ratio, abs_s

def tier(queries, names):
    hit = {k: v for k, v in queries.items() if k in names}
    return sum(hit.values()), hit

def main():
    new = load(sys.argv[1] if len(sys.argv) > 1 else "BENCH_QUERIES.json")
    ref = load_ref(sys.argv)
    nq, rq = new["queries"], ref["queries"]
    hl = headline_set()
    shared = sorted(set(nq) & set(rq))
    # headline sums restricted to hl & shared: summing each file's own
    # hits would silently skew the ratio by any added/renamed member's
    # whole runtime (and divide by zero on no ref-side overlap)
    hl_shared = hl & set(shared)
    n_hl, n_hit = tier(nq, hl_shared)
    r_hl, _ = tier(rq, hl_shared)
    n_sh = sum(nq[k] for k in shared)
    r_sh = sum(rq[k] for k in shared)
    if not hl_shared or r_hl == 0 or r_sh == 0:
        print("no shared headline surface to compare"); sys.exit(2)
    print(f"HEADLINE  {n_hl:8.1f} s vs {r_hl:8.1f} s  "
          f"({n_hl / r_hl:.3f}x, {len(n_hit)}/{len(hl)} shared headline queries)")
    print(f"full      {new['value']:8.1f} s ({new['n']} q) vs "
          f"{ref['value']:8.1f} s ({ref['n']} q); shared {len(shared)} q: "
          f"{n_sh / r_sh:.3f}x")
    # rq[k] can be 0.000 (a sub-ms query at %.3f precision) — treat any
    # growth from ~0 past the absolute floor as a mover, never divide
    threshold, abs_floor = mover_gate()
    # ---- floor-vs-floor gate (r11 verdict #2) ----
    # Both snapshots carry 3-rep Profile floors for the headline tier:
    # gate on THOSE. A floor is the estimator every r11 "drift"
    # adjudication ended at anyway — comparing floors directly removes
    # the sweep's 121-146 s same-code host-drift band from the gate, so
    # a floor mover is a genuine suspect with no further laundering step.
    # Sweep comparison above stays as context.
    # errored queries fail the gate outright — an error is never drift
    # (review r12: the floor branch used to be the only exit and a
    # regression-into-error had no floor to compare)
    # the '+N more' filter survives only for pre-r13 stdout snapshots;
    # current Bench signals truncation via the numeric errors_truncated
    # field and keeps the array pure query names (ADVICE r12)
    new_errors = [e for e in (new.get("errors") or [])
                  if not str(e).startswith("+")]
    if new.get("errors_truncated"):
        print(f"(errors list truncated by {new['errors_truncated']} — "
              "full list in the per_query file)")
    if new_errors:
        print(f"\nERRORED queries (always a gate failure): {new_errors}")
        sys.exit(1)
    nf = {k: v for k, v in (new.get("floors") or {}).items() if k in hl}
    rf = {k: v for k, v in (ref.get("floors") or {}).items() if k in hl}
    shared_f = sorted(set(nf) & set(rf))
    if shared_f:
        n_fl = sum(nf[k] for k in shared_f)
        r_fl = sum(rf[k] for k in shared_f)
        print(f"FLOORS    {n_fl:8.1f} s vs {r_fl:8.1f} s  "
              f"({n_fl / r_fl:.3f}x, {len(shared_f)} shared floors)")
        fl_movers = [(k, nf[k] / max(rf[k], 1e-3), rf[k], nf[k])
                     for k in shared_f
                     if nf[k] / max(rf[k], 1e-3) > threshold
                     and nf[k] - rf[k] > abs_floor]
        if fl_movers:
            print(f"\nfloor movers > {threshold}x "
                  "(floors are noise-adjudicated: genuine suspects):")
            for k, ratio, old, newv in sorted(fl_movers, key=lambda m: -m[1]):
                print(f"  {k:24s} {old:6.2f} -> {newv:6.2f}  ({ratio:.2f}x)")
            sys.exit(1)
        # a timed headline query MISSING a floor on either side is not
        # exempt (review r12: all its dedicated reps failing mints no
        # floor — the exact regression shape); route it through the sweep
        # mover gate below instead of silently passing
        floorless = sorted((hl & set(shared)) - set(shared_f))
        if not floorless:
            print("no floor mover exceeds the gate")
            return
        print(f"(no floors for {floorless} — checking their sweep numbers)")
        hl_shared = set(floorless)
    else:
        print("(no shared floors — ref snapshot predates r12; "
              "falling back to the sweep mover gate)")
    movers = [(k, nq[k] / max(rq[k], 1e-3), rq[k], nq[k])
              for k in sorted(hl_shared)
              if nq[k] / max(rq[k], 1e-3) > threshold
              and nq[k] - rq[k] > abs_floor]
    if movers:
        # r10 verdict #3: Bench adjudicates its own movers inline (3-rep
        # Profile floors vs the prior snapshot) and ships the verdicts as
        # movers_adjudicated — surface them here; only movers WITHOUT a
        # "drift" verdict still demand a manual floor check (exit 1).
        adjudicated = {m["query"]: m
                       for m in new.get("movers_adjudicated", [])}
        print(f"\nheadline movers > {threshold}x:")
        unresolved = []
        for k, ratio, old, newv in sorted(movers, key=lambda m: -m[1]):
            a = adjudicated.get(k)
            # trust a drift verdict ONLY when Bench adjudicated against the
            # SAME prior this comparison uses (review r11: Bench's prior is
            # the pre-run on-disk snapshot; ours is the committed one — a
            # stale/inflated working-tree snapshot would otherwise launder
            # a real regression into "drift")
            same_baseline = a is not None and abs(a["prior"] - old) <= 0.005
            if a and not same_baseline:
                note = (f"  (adjudicated vs a DIFFERENT prior {a['prior']:.2f}"
                        f" — run Profile vs the committed {old:.2f})")
            elif a:
                fl = a.get("floor")
                fls = f"{fl:.2f}" if fl is not None else "error"
                note = f"  floor {fls} => {a['verdict']}"
            else:
                note = "  (no inline adjudication — run Profile)"
            print(f"  {k:24s} {old:6.2f} -> {newv:6.2f}  ({ratio:.2f}x){note}")
            if not a or not same_baseline or a["verdict"] != "drift":
                unresolved.append(k)
        if unresolved:
            sys.exit(1)
        print("all movers adjudicated as host drift (floors at/below prior)")
        return
    print("\nno headline mover exceeds the gate")

if __name__ == "__main__":
    main()
