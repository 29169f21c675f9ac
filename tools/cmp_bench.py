#!/usr/bin/env python3
"""Compare two bench recordings key by key.

Usage: cmp_bench.py OLD NEW

Each argument is either a driver BENCH_r0N.json (whose `tail` field holds a
truncated per-query JSON fragment — keys are recovered by regex) or a full
bench_out.json written by graft.Bench (complete `queries` map).
"""
import json
import re
import sys


def load(path):
    j = json.load(open(path))
    if "queries" in j:
        return {k: float(v) for k, v in j["queries"].items()}
    frag = j.get("tail", "")
    return {k: float(v) for k, v in
            re.findall(r'"([a-z]\d+[a-z_0-9]*)":([0-9.]+)', frag)}


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    common = sorted(set(old) & set(new))
    if not common:
        print("no common keys")
        return
    s_old = sum(old[k] for k in common)
    s_new = sum(new[k] for k in common)
    print(f"common keys: {len(common)}  old sum {s_old:.1f}s  "
          f"new sum {s_new:.1f}s  ratio {s_new / s_old:.3f}")
    movers = sorted(common, key=lambda k: new[k] - old[k])
    print("-- biggest improvements --")
    for k in movers[:8]:
        print(f"{k:28s} {old[k]:6.2f} -> {new[k]:6.2f}")
    print("-- biggest regressions --")
    for k in movers[-8:]:
        print(f"{k:28s} {old[k]:6.2f} -> {new[k]:6.2f}")
    added = sorted(set(new) - set(old))
    if added:
        print("-- keys only in NEW --")
        for k in added:
            print(f"{k:28s}           {new[k]:6.2f}")
    print(f"NEW total: {sum(new.values()):.1f}s over {len(new)} keys")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2])
