#!/usr/bin/env python3
"""Community-family in-suite inflation A/B analysis (r15, verdict item 5).

Reads the two SPARK_GRAFT_ORDER bench logs + diag artifacts and prints,
for the heavy graph block (community_* + ktruss_peel):
  - per-query suite time when the block ran FIRST vs LAST;
  - the telemetry at that point in each sweep (code cache, GC, heap,
    block-manager disk store) so a difference is attributable.

Usage: tools/ab_community.py [first.log last.log]
"""
import json
import re
import sys


def parse_queries(log_path):
    txt = open(log_path, errors="replace").read()
    m = re.findall(r'\{"metric":"total".*\}', txt)
    if not m:
        return None, {}
    line = json.loads(m[-1])
    return line.get("value"), line.get("queries", {})


def family(n):
    return n.startswith("community_") or n == "ktruss_peel"


def main():
    first_log = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/bench_community_first.log"
    last_log = sys.argv[2] if len(sys.argv) > 2 else \
        "/tmp/bench_community_last.log"
    tf, qf = parse_queries(first_log)
    tl, ql = parse_queries(last_log)
    df = {r["q"]: r for r in json.load(open("bench_diag_community_first.json"))}
    dl = {r["q"]: r for r in json.load(open("bench_diag_community_last.json"))}
    names = sorted(n for n in df if family(n))
    print(f"{'query':24s} {'first(s)':>9s} {'last(s)':>9s} {'ratio':>6s}  "
          f"{'cc_f':>5s} {'cc_l':>5s}  {'gc_f':>6s} {'gc_l':>6s}  "
          f"{'disk_f':>7s} {'disk_l':>7s}")
    fam_f = fam_l = 0.0
    for n in names:
        a = qf.get(n)
        b = ql.get(n)
        if a is None or b is None:
            continue
        fam_f += a
        fam_l += b
        print(f"{n:24s} {a:9.2f} {b:9.2f} {b / a if a else 0:6.2f}  "
              f"{df[n]['code_cache_mb']:5d} {dl[n]['code_cache_mb']:5d}  "
              f"{df[n]['gc_ms']:6d} {dl[n]['gc_ms']:6d}  "
              f"{df[n]['disk_mb']:7d} {dl[n]['disk_mb']:7d}")
    # the canary normalizes any whole-machine drift between the two runs
    def canary(path):
        try:
            j = json.load(open(path))
            c = j.get("canary", {})
            return (c.get("start", 0) + c.get("mid", 0) + c.get("end", 0)) / 3
        except Exception:
            return None
    print(f"\nfamily subtotal: first={fam_f:.2f}s last={fam_l:.2f}s "
          f"ratio={fam_l / fam_f if fam_f else 0:.3f}")
    print(f"suite totals: first={tf} last={tl}")
    # telemetry at family start: what state did the block inherit?
    for tag, d in (("first", df), ("last", dl)):
        rows = [d[n] for n in names if n in d]
        if rows:
            print(f"{tag}: family code-cache {min(r['code_cache_mb'] for r in rows)}"
                  f"-{max(r['code_cache_mb'] for r in rows)} MB, "
                  f"disk {min(r['disk_mb'] for r in rows)}"
                  f"-{max(r['disk_mb'] for r in rows)} MB, "
                  f"heap {min(r['heap_mb'] for r in rows)}"
                  f"-{max(r['heap_mb'] for r in rows)} MB")


if __name__ == "__main__":
    main()
