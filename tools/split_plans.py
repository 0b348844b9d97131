#!/usr/bin/env python3
"""Split a PlanDumpArgs log into plans/<round>/<query>_<suffix>.txt files.

Usage: split_plans.py <log> <outdir> <suffix>
Sections are delimited by '===== <query> =====' lines; everything
before the first delimiter (sbt noise) is dropped, and trailing sbt
'[success]'/EXIT lines are stripped from the last section.
"""
import re
import sys
import os

log, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(outdir, exist_ok=True)
name = None
buf = []

def flush():
    if name is None:
        return
    lines = [l for l in buf if not re.match(r"\[success\]|\[info\]|EXIT=", l)]
    while lines and not lines[-1].strip():
        lines.pop()
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {name}_{suffix}.txt ({len(lines)} lines)")

for line in open(log, errors="replace"):
    line = line.rstrip("\n")
    m = re.match(r"^===== (\S+) =====$", line)
    if m:
        flush()
        name = m.group(1)
        buf = []
    elif name is not None:
        buf.append(line)
flush()
