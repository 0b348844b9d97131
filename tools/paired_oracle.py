#!/usr/bin/env python3
"""Persistent DuckDB oracle co-process for graft.Bench's paired phase.

Why it exists: the committed anchor (BASELINE_MIRROR.json) is a
merged-minimum over many independent regen runs, while each bench
epoch's Spark walls are one epoch on a shared host — dividing one by
the other makes the headline ratio swing with co-tenant load the code
never sees (same-code official epochs have read 1.71x and 2.38x).
Pairing re-times the SAME oracle SQL with DuckDB INSIDE the measured
epoch, interleaved with the Spark walls, so both engines inherit the
same weather and the ratio isolates the engines.

Protocol: one JSON object per line on stdin, one JSON line on stdout
per request (stdout is flushed per line; nothing else is ever printed
to stdout — diagnostics go to stderr):

  {"open": "<dir>"}                      -> {"ok": true} | {"error": "..."}
  {"name": n, "sql": s, "samples": k}    -> {"name": n, "sec": min-of-k}
                                          | {"name": n, "error": "..."}

stdin EOF -> exit 0. A fresh connection per "open" (re-openable for a
different dir). View setup is shared with the anchor regen
(duck_views.setup_views), so paired and anchor timings resolve tables
identically.
"""
import json
import sys
import time

import duckdb

from duck_views import setup_views


def main():
    con = None
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except Exception as e:  # noqa: BLE001 - protocol error, keep serving
            print(json.dumps({"error": f"bad request: {str(e)[:120]}"}), flush=True)
            continue
        if "open" in req:
            try:
                con = duckdb.connect()
                setup_views(con, req["open"])
                print(json.dumps({"ok": True}), flush=True)
            except Exception as e:  # noqa: BLE001 - report, don't die
                con = None
                print(json.dumps({"error": str(e)[:200]}), flush=True)
            continue
        name = req.get("name", "?")
        if con is None:
            print(json.dumps({"name": name, "error": "no dir opened"}), flush=True)
            continue
        try:
            best = None
            for _ in range(int(req.get("samples", 3))):
                t0 = time.perf_counter()
                con.execute(req["sql"]).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(json.dumps({"name": name, "sec": round(best, 4)}), flush=True)
        except Exception as e:  # noqa: BLE001 - record, keep serving
            print(json.dumps({"name": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
