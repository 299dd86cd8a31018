#!/usr/bin/env python3
"""Mechanically audit a CORRECTNESS_r{N}.json against the freeze
(driver-side dev tooling — NOT part of the Scala library).

The repo's correctness state has been frozen since round 13 at
282 queries = 253 oracle-green + 29 justified rows-only + 0 failures.
This tool classifies every entry, REPLAYS each entry's internal
consistency (a self-reported flag is not trusted on its own), and,
with a prior round's file, diffs the two so a freeze break (a query
added/removed/renamed, an oracle-green query degrading to rows-only
or failing, a rows-only query silently gaining an oracle without the
survey being updated) is a FAIL line instead of a judge-side recount.

Classes per entry:
  green      rows_match, schema_match, hash_match all true — and, by
             replay, err null with spark_rows == oracle_rows (a
             "green" entry whose own row counts disagree is forged or
             corrupted and FAILs as inconsistent)
  rows-only  err == "no_oracle" and spark_rows > 0 — and, by replay,
             oracle_rows null with every match flag null (the 29
             documented no-content-oracle queries)
  failure    anything else (a real err, a mismatch, a rows-only entry
             with zero rows, or a non-dict/malformed entry)

Usage: audit_correctness.py <CORRECTNESS.json> [--prev <prior.json>]
       [--expect green,rows_only,failures]   (default 253,29,0)

Exit 0 on PASS; exit 1 listing every FAIL. When --expect declares a
nonzero failure budget and the counts match it exactly, the failure
entries are listed as WARNs (documented failures), not FAILs.
Row-count drift on rows-only entries is WARN-level (same-SF runs
should be deterministic, but the count is not part of the freeze).
"""
from audit_common import Audit, load_json, parse_flags


def classify(v):
    if not isinstance(v, dict):
        return "failure"
    if v.get("rows_match") and v.get("schema_match") and v.get("hash_match"):
        return "green"
    if v.get("err") == "no_oracle" and (v.get("spark_rows") or 0) > 0:
        return "rows-only"
    return "failure"


def replay_consistency(k, v, a):
    """A classification is only as good as the entry behind it:
    re-derive what each class implies and FAIL contradictions."""
    if not isinstance(v, dict):
        a.ok(False, f"{k}: entry is not an object — {json.dumps(v)[:120]}")
        return
    c = classify(v)
    if c == "green":
        a.ok(v.get("err") is None,
             f"{k}: green but err={v.get('err')!r}")
        a.ok(v.get("spark_rows") == v.get("oracle_rows"),
             f"{k}: green but spark_rows {v.get('spark_rows')} != "
             f"oracle_rows {v.get('oracle_rows')}")
    elif c == "rows-only":
        a.ok(v.get("oracle_rows") is None,
             f"{k}: rows-only (no_oracle) but oracle_rows="
             f"{v.get('oracle_rows')}")
        a.ok(all(v.get(f) is None for f in
                 ("rows_match", "schema_match", "hash_match")),
             f"{k}: rows-only but carries non-null match flags")


def expect_triple(s):
    parts = s.split(",")
    if len(parts) != 3:
        raise ValueError("need exactly green,rows_only,failures")
    return tuple(int(x) for x in parts)


def main():
    path, flags = parse_flags(
        __import__("sys").argv[1:],
        {"--prev": str, "--expect": expect_triple},
        __doc__)
    prev_path = flags.get("--prev")
    expect = flags.get("--expect", (253, 29, 0))

    d = load_json(path)
    a = Audit()
    cls = {k: classify(v) for k, v in d.items()}
    for k, v in sorted(d.items()):
        replay_consistency(k, v, a)
    counts = (sum(1 for c in cls.values() if c == "green"),
              sum(1 for c in cls.values() if c == "rows-only"),
              sum(1 for c in cls.values() if c == "failure"))
    a.ok(counts == expect,
         f"class counts (green, rows-only, failure) = {counts}, "
         f"expected {expect}")
    budgeted = counts == expect and expect[2] > 0
    for k, c in sorted(cls.items()):
        if c == "failure":
            line = f"{k}: FAILURE class — {json.dumps(d[k])[:200]}"
            if budgeted:
                a.warn(line + " (within the declared --expect budget)")
            else:
                a.ok(False, line)

    if prev_path:
        p = load_json(prev_path)
        pcls = {k: classify(v) for k, v in p.items()}
        gone = sorted(set(pcls) - set(cls))
        new = sorted(set(cls) - set(pcls))
        a.ok(not gone, f"queries removed vs prior: {gone}")
        a.ok(not new, f"queries added vs prior: {new}")
        for k in sorted(set(cls) & set(pcls)):
            if cls[k] != pcls[k]:
                a.ok(False, f"{k}: class changed {pcls[k]} -> {cls[k]}")
            elif cls[k] == "rows-only" and isinstance(d[k], dict) \
                    and isinstance(p[k], dict) \
                    and d[k].get("spark_rows") != p[k].get("spark_rows"):
                a.warn(f"{k}: rows-only row count drifted "
                       f"{p[k].get('spark_rows')} -> "
                       f"{d[k].get('spark_rows')}")

    a.finish(f"{path}: {counts[0]} green / {counts[1]} rows-only / "
             f"{counts[2]} failures over {len(d)} queries"
             + (f"; freeze diff vs {prev_path} clean"
                if prev_path and not a.fails else ""))


if __name__ == "__main__":
    main()
