#!/usr/bin/env python3
"""Mechanically audit a CORRECTNESS_r{N}.json against the freeze
(driver-side dev tooling — NOT part of the Scala library).

The repo's correctness state has been frozen since round 13 at
282 queries = 253 oracle-green + 29 justified rows-only + 0 failures.
This tool classifies every entry and, with a prior round's file,
diffs the two so a freeze break (a query added/removed/renamed, an
oracle-green query degrading to rows-only or failing, a rows-only
query silently gaining an oracle without the survey being updated)
is a FAIL line instead of a judge-side recount.

Classes per entry:
  green      rows_match, schema_match, hash_match all true
  rows-only  err == "no_oracle" and spark_rows > 0 (the 29 documented
             no-content-oracle queries — ML fits, probabilistic LSH
             candidate sets, sketches, etc.)
  failure    anything else (a real err, a hash/schema/rows mismatch,
             or a rows-only entry that produced zero rows)

Usage: audit_correctness.py <CORRECTNESS.json> [--prev <prior.json>]
       [--expect green,rows_only,failures]   (default 253,29,0)

Exit 0 on PASS; exit 1 listing every FAIL. Row-count drift on
rows-only entries is WARN-level (same-SF runs should be
deterministic, but the count is not part of the freeze).
"""
import json
import sys


def classify(v):
    if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"):
        return "green"
    if v.get("err") == "no_oracle" and (v.get("spark_rows") or 0) > 0:
        return "rows-only"
    return "failure"


def main():
    args = sys.argv[1:]
    if not args:
        raise SystemExit(__doc__)
    path, prev_path, expect = args[0], None, (253, 29, 0)
    i = 1
    while i < len(args):
        if args[i] in ("--prev", "--expect"):
            if i + 1 >= len(args):
                raise SystemExit(f"{args[i]} needs an operand\n\n{__doc__}")
            if args[i] == "--prev":
                prev_path = args[i + 1]
            else:
                expect = tuple(int(x) for x in args[i + 1].split(","))
            i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")

    d = json.load(open(path))
    fails, warns = [], []
    cls = {k: classify(v) for k, v in d.items()}
    counts = (sum(1 for c in cls.values() if c == "green"),
              sum(1 for c in cls.values() if c == "rows-only"),
              sum(1 for c in cls.values() if c == "failure"))
    if counts != expect:
        fails.append(f"class counts (green, rows-only, failure) = {counts}, "
                     f"expected {expect}")
    for k, c in sorted(cls.items()):
        if c == "failure":
            fails.append(f"{k}: FAILURE class — {json.dumps(d[k])}")

    if prev_path:
        p = json.load(open(prev_path))
        pcls = {k: classify(v) for k, v in p.items()}
        gone = sorted(set(pcls) - set(cls))
        new = sorted(set(cls) - set(pcls))
        if gone:
            fails.append(f"queries removed vs prior: {gone}")
        if new:
            fails.append(f"queries added vs prior: {new}")
        for k in sorted(set(cls) & set(pcls)):
            if cls[k] != pcls[k]:
                fails.append(f"{k}: class changed {pcls[k]} -> {cls[k]}")
            elif cls[k] == "rows-only" and \
                    d[k].get("spark_rows") != p[k].get("spark_rows"):
                warns.append(f"{k}: rows-only row count drifted "
                             f"{p[k].get('spark_rows')} -> "
                             f"{d[k].get('spark_rows')}")

    for w in warns:
        print(f"WARN  {w}")
    for f in fails:
        print(f"FAIL  {f}")
    print(f"{'FAIL' if fails else 'PASS'}  {path}: "
          f"{counts[0]} green / {counts[1]} rows-only / "
          f"{counts[2]} failures over {len(d)} queries"
          + (f"; freeze diff vs {prev_path} clean" if prev_path and not fails
             else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
