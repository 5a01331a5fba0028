#!/usr/bin/env python3
"""Split a Bench BENCH_EXPLAIN stderr capture into per-query plan
files: `=== <name>` starts a query's formatted plan; everything until
the next `===` (or a non-plan log line burst) belongs to it.

Usage: python3 tools/split_explain.py <stderr_file> <out_dir> <suffix>
Writes <out_dir>/<query>_<suffix>.txt
"""
import os
import re
import sys


def main(src, out_dir, suffix):
    os.makedirs(out_dir, exist_ok=True)
    name = None
    buf = []
    drop = re.compile(r"^(\d\d/\d\d/\d\d |\[info\]|\[warn\]|\[error\]|"
                      r"WARNING:|SLF4J|Using |log4j)")

    def flush():
        if name and buf:
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"),
                      "w") as f:
                f.write("\n".join(buf).rstrip() + "\n")

    for line in open(src, errors="replace"):
        line = line.rstrip("\n")
        for pre in ("[error] ", "[info] "):
            if line.startswith(pre):
                line = line[len(pre):]
                break
        if line.startswith("=== "):
            flush()
            name = line[4:].strip()
            buf = []
        elif name is not None and not drop.match(line):
            buf.append(line)
    flush()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
