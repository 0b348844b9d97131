#!/usr/bin/env python3
"""Build the long-document oracle-robustness dataset (driver-side tool).

Copies an sf dir and replaces documents.parquet with the same table
plus one appended document of >2000 whitespace tokens. The gram
oracles used to cap token enumeration at generate_series(1, 2000) —
silently diverging from the Spark kernels (which compute ALL tokens)
on any longer document. The cap is gone (bounds derive from len(t));
this dataset is the regression proof: `graft.Verify <out> <res>` +
`tools/check.py <out> <res>` must report every query hash-matching.

Usage: python3 tools/make_longdoc_sf.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.001 /tmp/longdoc_sf
"""
import glob
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/longdoc_sf"
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for f in glob.glob(os.path.join(src, "*.parquet")):
        b = os.path.basename(f)
        if b != "documents.parquet":
            shutil.copy(f, os.path.join(dst, b))

    t = pq.read_table(os.path.join(src, "documents.parquet"))
    cols = {name: t.column(name).to_pylist() for name in t.column_names}
    n = t.num_rows
    # Deterministic >2000-token text: 2600 tokens cycling a small
    # vocabulary, so it produces shingle/TF-IDF/BPE work in every gram
    # query rather than a degenerate single-token repeat.
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa", "lambda", "mu"]
    long_text = " ".join(vocab[i % len(vocab)] + ("x" if i % 7 == 0 else "")
                         for i in range(2600))
    row = {}
    for name in t.column_names:
        if name == "doc_id":
            row[name] = max(cols[name]) + 1
        elif name == "text":
            row[name] = long_text
        else:
            # copy the last row's value for every other column so the
            # appended row is schema-valid without guessing semantics
            row[name] = cols[name][n - 1]
    for name in t.column_names:
        cols[name].append(row[name])
    out = pa.table({name: pa.array(cols[name], type=t.schema.field(name).type)
                    for name in t.column_names})
    pq.write_table(out, os.path.join(dst, "documents.parquet"))
    toks = len(long_text.split())
    print(f"wrote {dst}: documents={out.num_rows} rows, "
          f"appended doc_id={row['doc_id']} with {toks} tokens")


if __name__ == "__main__":
    main()
