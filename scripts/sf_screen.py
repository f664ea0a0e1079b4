#!/usr/bin/env python3
"""Scale-divergence oracle screen (dev tool, driver-shaped output).

Runs the full three-way DuckDB check per query IN AN ISOLATED SUBPROCESS
with a wall-clock timeout, over a Verify dump taken at a larger scale
factor than the graded sf0.01. Some oracle FORMULATIONS (unrolled
recursive CTEs, cross-join k-means rounds) are tractable at sf0.01 but
super-linear in DuckDB at sf0.1 even though the ENGINE side is linear —
those are recorded loudly as "skipped: oracle timeout", never silently
dropped, and never counted as engine failures.

Usage: sf_screen.py <sf_dir> <verify_out_dir> <json_out> [timeout_s]
"""
import json, os, subprocess, sys, time

def main(sf_dir, out_dir, json_out, timeout_s=240):
    here = os.path.dirname(os.path.abspath(__file__))
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    dumped = {d for d in os.listdir(out_dir)
              if os.path.isdir(os.path.join(out_dir, d))}
    # the UNION of declared oracles and dumped dirs (review r11): Verify
    # deletes a failed query's dump so a missing dir must read as a loud
    # failure here, not fall out of the enumeration and screen green
    names = sorted(set(oracle) | dumped)
    results, fails, skips = {}, [], []
    for i, name in enumerate(names):
        if name not in dumped:
            fails.append(name)
            results[name] = {"status": "fail",
                             "detail": "no dump dir — the Verify run failed "
                                       "this query (or never ran it)"}
            print(f"FAIL [{i+1}/{len(names)}] {name} (missing dump)",
                  flush=True)
            continue
        t0 = time.time()
        # per-run temp path (review r11): a shared /tmp name would let two
        # concurrent screens clobber each other's verdicts
        tmp_json = os.path.join(out_dir, f".sf_screen_{name}_{os.getpid()}.json")
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(here, "check_oracle.py"),
                 sf_dir, out_dir, tmp_json, name],
                capture_output=True, text=True, timeout=timeout_s)
            one = json.load(open(tmp_json))
            r = one["queries"].get(name,
                {"status": "fail", "detail": "no result emitted"})
            results[name] = r
            if r["status"] != "ok":
                fails.append(name)
            tag = "ok  " if r["status"] == "ok" else "FAIL"
            print(f"{tag} [{i+1}/{len(names)}] {name} "
                  f"({time.time()-t0:.1f}s)", flush=True)
            if r["status"] != "ok":
                print(p.stdout[-2000:], flush=True)
        except subprocess.TimeoutExpired:
            skips.append(name)
            results[name] = {
                "status": "skipped",
                "detail": f"oracle timeout >{timeout_s}s at this sf "
                          "(oracle formulation cost, not an engine check)"}
            print(f"SKIP [{i+1}/{len(names)}] {name} "
                  f"(oracle >{timeout_s}s)", flush=True)
        except Exception as e:  # torn temp json, child crash
            fails.append(name)
            results[name] = {"status": "fail", "detail": f"runner: {e}"[:200]}
            print(f"FAIL [{i+1}/{len(names)}] {name} runner: {e}", flush=True)
        finally:
            try: os.remove(tmp_json)
            except OSError: pass
    with open(json_out, "w") as f:
        json.dump({"sf_dir": sf_dir, "n": len(results),
                   "n_ok": sum(1 for r in results.values()
                               if r["status"] == "ok"),
                   "failures": fails, "skipped_oracle_timeout": skips,
                   "queries": results}, f, indent=1, sort_keys=True)
    print(f"\n{len(results)} checked, {len(fails)} failures, "
          f"{len(skips)} oracle-timeout skips -> {json_out}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         int(sys.argv[4]) if len(sys.argv) > 4 else 240)
