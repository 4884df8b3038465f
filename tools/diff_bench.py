#!/usr/bin/env python
"""Diff two bench JSON lines per query: tools/diff_bench.py OLD NEW.

Prints one row per query with old/new seconds and the ratio, plus the
headline throughput.  Windows on the shared host vary up to ~3x, so
ratios within that band are noise; structural regressions show as
consistent multi-query blowups."""

import json
import sys


def _load(path: str) -> dict:
    """Accept a raw bench JSON line or the driver's BENCH_r{N} wrapper
    (which carries the line under 'parsed' / embedded in 'tail')."""
    import re

    d = json.load(open(path))
    if "queries" in d:
        return d
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]
    m = re.search(r'\{"metric".*\}', d.get("tail", ""))
    return json.loads(m.group(0)) if m else {}


def main(old_path: str, new_path: str) -> None:
    old = _load(old_path)
    new = _load(new_path)
    names = sorted(set(old.get("queries", {})) | set(new.get("queries", {})))
    print(f"{'query':24} {'old_s':>8} {'new_s':>8} {'ratio':>7}")
    for n in names:
        a = old.get("queries", {}).get(n)
        b = new.get("queries", {}).get(n)
        ratio = (f"{b / a:.2f}x" if a and b else "--")
        print(f"{n:24} {a if a is not None else '--':>8} "
              f"{b if b is not None else '--':>8} {ratio:>7}")
    for k in ("value", "pages_per_sec", "sf", "cpus"):
        print(f"{k}: {old.get(k)} -> {new.get(k)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
