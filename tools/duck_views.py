"""Shared DuckDB view setup over a graft parquet dir (raw or mirror).

Extracted from bench_baseline.py so the committed-anchor regen and the
bench's in-epoch paired phase (paired_oracle.py) resolve tables
IDENTICALLY — one drift between the two and the paired ratio compares
layouts instead of engines.
"""
import glob
import json
import os


def setup_views(con, sfdir):
    """Create one view per parquet table under `sfdir` on `con`.

    The mirror stores ns-timestamp sources as raw int64 (the same
    representation Spark reads them back in); normalize to the
    TIMESTAMP the raw layout presents — make_timestamp(us) after the
    identical ns//1000 truncation — so one oracle SQL runs unchanged
    on both layouts. WHICH columns were ns is TYPE-driven: the mirror
    writer (Layout.rechunkMirror) records table -> [ns columns] in a
    sidecar, because the annotation is gone from the mirror's own
    footers. The name-based 'ts' match survives only as the fallback
    for mirrors that predate the sidecar.
    """
    ns_sidecar = {}
    sidecar_path = os.path.join(sfdir, "_ns_as_long.json")
    if os.path.exists(sidecar_path):
        ns_sidecar = json.load(open(sidecar_path))
    for f in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(f)[: -len(".parquet")]
        # a re-chunked mirror (graft.MakeMirror / Layout.rechunkMirror)
        # ships each table as a DIRECTORY of part files
        src = f"{f}/*.parquet" if os.path.isdir(f) else f
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
        cols = con.execute(f"DESCRIBE {name}").fetchall()
        bigint_cols = {c for c, t, *_ in cols if t == "BIGINT"}
        # a PRESENT sidecar is authoritative for every table — a table
        # absent from it has no ns columns, even if it carries a BIGINT
        # literally named 'ts' (an epoch-seconds or counter column must
        # not be rewritten). The name guess survives only for mirrors
        # that predate the sidecar entirely.
        if os.path.exists(sidecar_path):
            wanted = ns_sidecar.get(name, [])
        else:
            wanted = ["ts"]  # fallback: legacy name match
        ns_cols = [c for c in wanted if c in bigint_cols]
        if ns_cols:
            repl = ", ".join(f"make_timestamp({c} // 1000) AS {c}" for c in ns_cols)
            con.execute(f"DROP VIEW {name}")
            con.execute(f"CREATE VIEW {name} AS SELECT * REPLACE ({repl}) FROM '{src}'")
