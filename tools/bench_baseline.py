#!/usr/bin/env python3
"""Time the DuckDB oracle queries on the same parquet tables — the
same-scale, same-host single-node baseline the bench compares against
(the reference publishes no query benchmark; DuckDB running the
semantically identical SQL on identical data is the closest commensurable
anchor).

Usage: python3 tools/bench_baseline.py <sfdir> <oracle_sql.json> <out.json>

<oracle_sql.json> is the dump Verify writes (the SQL is scale-factor
independent; tables resolve against <sfdir>). Each query runs 3 times;
the MIN is recorded (steady-state, caches warm — the same discipline as
Bench's warmup pass). DuckDB uses all cores by default, comparable to
the bench's local[N].

The output is committed as BASELINE_LOCAL.json and embedded verbatim by
graft.Bench under the "baseline_duckdb" key.
"""
import json
import sys
import time
import os

import duckdb

from duck_views import setup_views


def main(sfdir, oracle_json, out_path):
    con = duckdb.connect()
    # view setup shared with the bench's in-epoch paired phase
    # (paired_oracle.py) — one resolution path for both comparators
    setup_views(con, sfdir)

    oracles = json.load(open(oracle_json))
    times = {}
    for name in sorted(oracles):
        sql = oracles[name]
        best = None
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 4)
        except Exception as e:  # noqa: BLE001 - record, don't abort the sweep
            times[name] = f"ERROR {str(e)[:120]}"
        print(f"{name}: {times[name]}")

    # Merge with an existing anchor: per-query MIN across independent
    # process runs. One in-process min-of-3 still inherits that process's
    # host-load epoch (observed headline-sum swings of 50% between
    # otherwise-identical regens); the cross-run min converges both
    # engines' anchors to the same steady-state discipline the Spark
    # bench applies per query.
    runs = 1
    if os.path.exists(out_path):
        try:
            with open(out_path) as fh:
                prev = json.load(fh)
            runs = prev.get("runs", 1) + 1
            for name, t in prev.get("times", {}).items():
                if isinstance(t, float) and isinstance(times.get(name), float):
                    times[name] = min(times[name], t)
                elif name not in times:
                    times[name] = t
        except Exception as e:  # noqa: BLE001 - a corrupt anchor just restarts
            print(f"no merge ({e}); writing fresh")

    out = {
        "sf": os.path.basename(os.path.normpath(sfdir)),
        "engine": "duckdb " + duckdb.__version__,
        "method": "min of 3 runs per oracle query, identical parquet, same "
                  "host; per-query min merged across independent regen runs",
        "runs": runs,
        "times": times,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {out_path} (runs={runs})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
