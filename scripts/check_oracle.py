#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (dev tool only, not part
of the engine): run Verify's parquet dumps against the DuckDB oracle SQL and
compare column-sorted, row-sorted values per query."""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def main(sf_dir, out_dir, json_out=None, only=None):
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = []
    if only:
        # a filter name matching neither an oracle entry nor a dump dir is
        # a FAILURE, not a silent '0 failures' (review r11: a typo'd name
        # would otherwise read as the query passing when it never ran)
        import os as _os
        for n in sorted(only):
            if n not in oracle and not _os.path.isdir(_os.path.join(out_dir, n)):
                fails.append(n)
                results[n] = {"status": "fail",
                              "detail": "unknown query: no oracle entry and "
                                        "no dump dir"}
                print(f"FAIL {n}: unknown query (no oracle entry, no dump)")
        oracle = {k: v for k, v in oracle.items() if k in only}
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            fails.append(name)
            results[name] = {"status": "fail", "detail": f"error: {e}"[:200]}
            print(f"FAIL {name}: error {e}")
            continue
        # dtype parity: the driver's hash is type-sensitive beyond the
        # int32/int64 normalization — HUGEINT (count_if) or DECIMAL on the
        # oracle side vs BIGINT/DOUBLE on the spark side fails there even
        # when every cell value matches. Surface it here as a failure.
        gtypes = {d[0]: str(t) for d, t in
                  zip(got.description, con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").types)}
        etypes = {d[0]: str(t) for d, t in zip(exp.description, con.sql(sql).types)}
        bad_types = [c for c in etypes
                     if any(k in etypes[c] for k in ("HUGEINT", "DECIMAL"))
                     and etypes[c] != gtypes.get(c)]
        if bad_types:
            fails.append(name)
            results[name] = {"status": "fail", "detail": "dtype mismatch"}
            print(f"FAIL {name}: oracle dtype not hashable-equal: " +
                  ", ".join(f"{c} oracle={etypes[c]} spark={gtypes.get(c)}" for c in bad_types))
            continue
        gc, gr = norm(grows, gcols)
        ec, er = norm(erows, ecols)
        if gc != ec:
            fails.append(name)
            results[name] = {"status": "fail", "detail": "column mismatch"}
            print(f"FAIL {name}: columns spark={gc} oracle={ec}")
        elif gr != er:
            fails.append(name)
            results[name] = {"status": "fail",
                             "detail": f"value mismatch (spark {len(gr)} vs oracle {len(er)} rows)"}
            print(f"FAIL {name}: rows spark={len(gr)} oracle={len(er)}")
            for i, (a, b) in enumerate(zip(gr, er)):
                if a != b:
                    print(f"  first diff at row {i}:\n   spark : {a}\n   oracle: {b}")
                    break
            else:
                print(f"  (prefix equal; length differs)")
        else:
            results[name] = {"status": "ok", "rows": len(gr),
                             "rows_match": True, "schema_match": True,
                             "values_match": True}
            print(f"ok   {name} ({len(gr)} rows)")
    # rows-only queries (no oracle): check non-empty
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if only is not None and name not in only:
            continue
        if os.path.isdir(p) and name not in oracle:
            # per-dir try (review r11): one unreadable dir (a stray
            # _temporary from a killed write) must not crash the gate and
            # discard every already-computed result
            try:
                n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            except Exception as e:
                fails.append(name)
                results[name] = {"status": "fail",
                                 "detail": f"rows-only read: {e}"[:200]}
                print(f"FAIL {name} (rows-only, unreadable: {e})")
                continue
            status = "ok  " if n > 0 else "FAIL"
            if n == 0:
                fails.append(name)
            results[name] = {"status": "ok" if n > 0 else "fail",
                             "rows": n, "rows_only": True}
            print(f"{status} {name} (rows-only, {n} rows)")
    print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n": len(results),
                       "failures": fails, "queries": results}, f, indent=1,
                      sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3] if len(sys.argv) > 3 else None,
         set(sys.argv[4:]) if len(sys.argv) > 4 else None)
