#!/usr/bin/env python3
"""Per-query bench regression diff between two rounds.

Usage: python3 tools/bench_diff.py [BENCH_rOLD.json] [BENCH_rNEW.json]
With no args, diffs the two highest-numbered BENCH_r*.json in the repo
root. Accepts either the driver's wrapper JSON (metric line embedded in
`tail`/`parsed`) or a raw Bench stdout line. Prints one row per query
with the new/old ratio, sorted worst-first, and flags >1.3x as REGRESSED
(ratios on sub-0.3s queries are mostly JVM noise and are marked dim).
"""
import glob
import json
import os
import re
import sys


def load(path):
    with open(path) as f:
        txt = f.read()
    try:
        d = json.loads(txt)
    except json.JSONDecodeError:
        d = {"tail": txt}
    if isinstance(d, dict) and "queries" in d:
        return d
    if isinstance(d, dict):
        if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
            return d["parsed"]
        m = re.findall(r'\{"metric"[^\n]*\}', d.get("tail", ""))
        if m:
            return json.loads(m[-1])
        # driver artifacts may truncate the metric line mid-way (the
        # head of `tail` is cut); the per-query pairs that survive are
        # still a usable diff base — scrape them. A mid-key head cut
        # can't mint a bogus name (the regex needs the opening quote),
        # but ScaleProbe-style artifacts ("base_sec"/"scaled_sec"
        # floats) could masquerade as queries, so *_sec keys are
        # excluded and a small scrape is refused loudly rather than
        # silently diffing garbage.
        pairs = re.findall(r'"([A-Za-z0-9_]+)":([0-9]+\.[0-9]+)', d.get("tail", ""))
        qs = {k: float(v) for k, v in pairs
              if k not in ("metric", "value", "total") and not k.endswith("_sec")}
        if len(qs) >= 10:
            return {"queries": qs, "value": sum(qs.values()), "truncated": True}
    sys.exit(f"no bench metric line found in {path}")


def main():
    if len(sys.argv) == 3:
        old_path, new_path = sys.argv[1], sys.argv[2]
    else:
        rounds = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "BENCH_r*.json")))
        if len(rounds) < 2:
            sys.exit("need two BENCH_r*.json rounds (or pass two paths)")
        old_path, new_path = rounds[-2], rounds[-1]
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    rows = []
    for name in sorted(nq):
        if name in oq and oq[name] > 0:
            rows.append((nq[name] / oq[name], name, oq[name], nq[name]))
    rows.sort(reverse=True)
    print(f"{os.path.basename(old_path)} -> {os.path.basename(new_path)}")
    print(f"total: {old.get('value', 0):.2f}s ({len(oq)} queries) -> "
          f"{new.get('value', 0):.2f}s ({len(nq)} queries)\n")
    print(f"{'query':<28} {'old_s':>8} {'new_s':>8} {'ratio':>7}")
    for ratio, name, o, n in rows:
        flag = ""
        if ratio > 1.3:
            flag = " REGRESSED" if max(o, n) >= 0.3 else " (noise-scale)"
        elif ratio < 0.77:
            flag = " improved"
        print(f"{name:<28} {o:>8.3f} {n:>8.3f} {ratio:>7.2f}{flag}")
    for name in sorted(set(nq) - set(oq)):
        print(f"{name:<28} {'-':>8} {nq[name]:>8.3f}    new")
    for name in sorted(set(oq) - set(nq)):
        print(f"{name:<28} {oq[name]:>8.3f} {'-':>8}    removed")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into head
        # point stdout at devnull so the interpreter-shutdown flush
        # doesn't re-raise on the closed pipe (exit 120 + stderr noise)
        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        sys.exit(0)
