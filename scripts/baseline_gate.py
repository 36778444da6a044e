#!/usr/bin/env python3
"""Derive the bench-gate denominator (dev tooling only — the shipped
engine is pure Scala/Spark; this uses the driver-side DuckDB the same
way scripts/check.py does).

The gate convention (BASELINE.md §Gate): the engine's full-suite bench
total at sf0.1 must stay within 2x of a SINGLE-CORE reference engine
executing the SAME queries at the SAME scale — concretely, DuckDB
running every declared query's oracle SQL with `threads=1`. The old
~250 s ceiling was this number frozen at an earlier, smaller query set;
this script recomputes it PER QUERY so the denominator scales with the
suite and any judge can re-derive it:

  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vout"  # oracle_sql.json
  python3 scripts/baseline_gate.py /root/testdata/sf0.1 \
      /tmp/vout/oracle_sql.json BASELINE_GATE.json [cap_sec]

(The oracle SQL is scale-independent — Verify at any SF dumps the same
text; only the table views here bind the scale factor.)

PROTOCOL. Each query is fully materialized IN-ENGINE (CREATE TEMP TABLE
AS — the DuckDB analog of the Spark bench's `noop` write) and capped at
`cap_sec` (default 90 s) via connection interrupt. A query that caps is
EXCLUDED from the denominator and listed under "capped"; the gate then
compares engine total vs 2x oracle total over the COMPLETED subset only
(same queries both sides). The cap exists because a handful of oracles
are single-core-infeasible at sf0.1 by construction — e.g. the
dense-near-dup-graph recursive CTEs enumerate label paths over ~10^6
pairs — and "the reference engine cannot finish these in 90 s where the
Spark plans take seconds" is itself a result the gate should record,
not hide behind a hung run.

Output: {"sf", "threads": 1, "cap_sec", "n_queries", "total_sec",
         "queries": {name: sec}, "capped": [names], "failed": {name: err}}
"""
import json, sys, threading, time
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else "BASELINE_GATE.json"
cap = float(sys.argv[4]) if len(sys.argv) > 4 else 90.0

con = duckdb.connect()
con.sql("SET threads TO 1")
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(oracle_path))
times, capped, failed = {}, [], {}
for name in sorted(oracle):
    timer = threading.Timer(cap, con.interrupt)
    timer.start()
    t0 = time.monotonic()
    try:
        con.sql(f"CREATE OR REPLACE TEMP TABLE __gate AS ({oracle[name]})")
        times[name] = time.monotonic() - t0
        con.sql("DROP TABLE __gate")
        print(f"  {name}: {times[name]:.2f}s", flush=True)
    except duckdb.InterruptException:
        capped.append(name)
        print(f"  ~ {name}: capped at {cap:.0f}s (excluded from the gate)", flush=True)
    except Exception as e:
        msg = str(e)
        if "INTERRUPT" in msg.upper():
            capped.append(name)
            print(f"  ~ {name}: capped at {cap:.0f}s (excluded from the gate)", flush=True)
        else:  # a failed oracle is a correctness bug, not a gate input
            failed[name] = msg
            print(f"  ! {name}: {msg}", flush=True)
    finally:
        timer.cancel()

total = sum(times.values())
json.dump({"sf": sf, "threads": 1, "cap_sec": cap, "n_queries": len(times),
           "total_sec": round(total, 1),
           "queries": {k: round(v, 3) for k, v in times.items()},
           "capped": capped, "failed": failed},
          open(out_path, "w"), indent=1)
print(f"\n{len(times)} completed ({len(capped)} capped, {len(failed)} failed); "
      f"single-core oracle total {total:.1f}s -> gate (2x, completed subset) = "
      f"{2 * total:.0f}s; wrote {out_path}")
