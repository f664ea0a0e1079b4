#!/usr/bin/env python3
"""Adversarial-fixture differential fuzz gate (r11 verdict #1; dev tool).

`graft.tools.FuzzGate` stages seeded fixture variants (the 7 singles
empty / single / alldup / nulls_a / nulls_b / unicode / extremes plus the
r13 composed/widened nulls_extremes / unicode_alldup / nulls_single /
unicode_keys / extremes_time) under <fuzz_root>/<variant>/data and
dumps the full 180-query surface to <fuzz_root>/<variant>/out, recording
Spark-side failures in errors.json. This script runs the DuckDB oracle
over every variant dump (check_oracle.py, one subprocess per variant) and
merges the verdicts:

  ok        spark and the oracle agree on the variant data
  declared  the query REFUSED the variant loudly, by contract, and the
            (variant, query, message) triple is listed in DECLARED below —
            e.g. an SCD2 batch with NULL event times is rejected by design
  fail      anything else: a silent divergence, an undeclared crash, or a
            declared entry whose message no longer matches (a contract
            drift is a finding, not a pass)

Usage: fuzz_gate.py <fuzz_root> <json_out> [variant...]
Exit 1 if any variant has a fail.
"""
import json
import os
import subprocess
import sys

# (variant, query) -> substring that MUST appear in the recorded Spark
# error for the refusal to count as declared. Keep the substrings tied to
# the production `require` messages: if the contract message drifts, the
# gate fails loudly instead of blessing a different error.
DECLARED = {
    # a one-row corpus cannot form the two-batch crawl split the streaming
    # dedup contract is defined over — the op refuses loudly by `require`
    ("single", "q_dedup_stream"): "two-batch split would be degenerate",
    # the single surviving event row carries at most one event_type; the
    # stream-stream attribution join needs both legs and says so
    ("single", "q_stream_join"): "needs both",
    # nulls_single composes onto the single-row corpus: the same one-row
    # contracts refuse for the same reasons
    ("nulls_single", "q_dedup_stream"): "two-batch split would be degenerate",
    ("nulls_single", "q_stream_join"): "needs both",
    # zero-input refusals on the EMPTY variant: each op's contract needs at
    # least one row to define the split/feed it is specified over, and each
    # names that in its `require`
    ("empty", "q_dedup_incr"): "nothing to split",
    ("empty", "q_dedup_stream"): "empty documents frame",
    ("empty", "q_stream_join"): "needs both",
    ("empty", "q_stream_sessions"): "the event feed is empty",
    ("empty", "q_stream_traillog"): "the event feed is empty",
    # unicode_keys rewrites every event_type value, so the type-filtered
    # attribution legs are empty and the driver refuses loudly
    ("unicode_keys", "q_stream_join"): "needs both",
    # extremes_time spans 1970..2255: one extreme timestamp would advance
    # the event-time watermark past every later normal event and drop it
    # SILENTLY as late — the r13 sanity-horizon guard refuses instead
    ("extremes_time", "q_stream_join"): "watermark sanity horizon",
    ("extremes_time", "q_stream_sessions"): "watermark sanity horizon",
}

VARIANTS = ["empty", "single", "alldup", "nulls_a", "nulls_b", "unicode",
            "extremes",
            # r13: composed + widened variants (graft.tools.FuzzGate doc)
            "nulls_extremes", "unicode_alldup", "nulls_single",
            "unicode_keys", "extremes_time"]


def run_variant(here, root, variant, timeout_s=2400):
    data = os.path.join(root, variant, "data")
    out = os.path.join(root, variant, "out")
    if not os.path.isdir(out):
        return None, f"no dump at {out} (run graft.tools.FuzzGate first)"
    errors = {}
    epath = os.path.join(out, "errors.json")
    if os.path.exists(epath):
        errors = json.load(open(epath))
    tmp = os.path.join(out, f".fuzz_gate_{os.getpid()}.json")
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(here, "check_oracle.py"),
             data, out, tmp],
            capture_output=True, text=True, timeout=timeout_s)
        oracle = json.load(open(tmp))["queries"]
    except subprocess.TimeoutExpired:
        return None, f"check_oracle timeout >{timeout_s}s"
    except Exception as e:
        return None, f"runner: {e}"
    finally:
        try:
            os.remove(tmp)
        except OSError:
            pass
    merged, fails, declared = {}, [], []
    for name in sorted(set(oracle) | set(errors)):
        r = dict(oracle.get(name, {"status": "fail",
                                   "detail": "no oracle verdict"}))
        if name in errors:
            want = DECLARED.get((variant, name))
            if want and want in errors[name]:
                r = {"status": "declared", "detail": errors[name][:200]}
                declared.append(name)
            else:
                r = {"status": "fail",
                     "detail": ("undeclared spark-side failure: "
                                + errors[name])[:300]}
        if r["status"] == "fail":
            fails.append(name)
        merged[name] = r
    return {"n": len(merged), "n_ok":
            sum(1 for r in merged.values() if r["status"] == "ok"),
            "n_declared": len(declared), "declared": declared,
            "failures": fails, "queries": merged}, None


def main():
    root = sys.argv[1]
    json_out = sys.argv[2]
    which = sys.argv[3:] or VARIANTS
    here = os.path.dirname(os.path.abspath(__file__))
    report, any_fail = {}, False
    for v in which:
        res, err = run_variant(here, root, v)
        if err:
            report[v] = {"status": "error", "detail": err}
            any_fail = True
            print(f"ERROR {v}: {err}", flush=True)
            continue
        report[v] = res
        any_fail = any_fail or bool(res["failures"])
        print(f"{v:10s} {res['n_ok']}/{res['n']} ok, "
              f"{res['n_declared']} declared, "
              f"{len(res['failures'])} FAIL"
              + (f": {res['failures'][:12]}" if res["failures"] else ""),
              flush=True)
    summary = {
        "variants": which,
        "total_fail": sum(len(r.get("failures", []) or [])
                          for r in report.values()
                          if isinstance(r, dict) and "failures" in r),
        "results": report,
    }
    with open(json_out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"wrote {json_out}")
    sys.exit(1 if any_fail else 0)


if __name__ == "__main__":
    main()
