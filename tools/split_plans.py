#!/usr/bin/env python3
"""Split a graft.Explain log into plans/r11/<query>_<suffix>.txt files.

Usage: split_plans.py <explain_log> <suffix> [outdir]
Strips sbt's [info]/[error] prefixes; keeps each query's formatted plan.
"""
import re
import sys
import pathlib

log = pathlib.Path(sys.argv[1]).read_text().splitlines()
suffix = sys.argv[2]
outdir = pathlib.Path(sys.argv[3] if len(sys.argv) > 3 else "plans/r11")
outdir.mkdir(parents=True, exist_ok=True)

cur, buf = None, []
def flush():
    if cur:
        (outdir / f"{cur}_{suffix}.txt").write_text("\n".join(buf).strip() + "\n")
for line in log:
    line = re.sub(r"^\[(info|error)\]\s?", "", line)
    m = re.match(r"=+ (\S+) =+", line)
    if m:
        flush()
        cur, buf = m.group(1), []
    elif cur is not None:
        if line.startswith(("[success]", "[warn]", "sbt:")):
            continue
        buf.append(line)
flush()
print("wrote:", ", ".join(sorted(p.name for p in outdir.glob(f"*_{suffix}.txt"))))
