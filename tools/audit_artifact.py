#!/usr/bin/env python3
"""Mechanically audit a committed bench artifact (driver-side dev
tooling — NOT part of the Scala library).

Every invariant the artifact claims about itself is replayed here from
the JSON alone, so a reader (or the round judge) does not need to
trust prose or re-derive Bench.scala's conventions by hand:

  structural   value == sum(queries); every queries[q] is the strict
               median of runs[q] (Bench's med: odd → middle, even →
               mean of middles); failed == |errors|; every requeued/
               spliced/isolated key exists in queries.
  controls     noise_floor == worst max/min dispersion over the
               warmup-dropped (drop first sample when >=3) map-phase
               control vectors; control_ratio == median over the
               non-probe controls of med(warmup-dropped)/builtin-ref;
               probe_ratio likewise for ctl_shuffle_probe. Builtin
               references are keyed by refs_source and mirrored from
               Bench.scala — an "env" refs_source skips ratio replay.
  requeue      for each record: quiet == median(quiet_runs); the
               replaced flag matches the symmetric divergence test
               (max(in_map/quiet, quiet/in_map) > requeue_replace_bar);
               queries[q]/runs[q] hold the quiet number iff replaced,
               the in-map one otherwise; pre/post pass levels <=
               requeue_quiet_bar; pre_probe/post_probe raw seconds <=
               requeue_probe_abs_bar and their levels (raw / the
               probe's best warmup-dropped map sample) <=
               requeue_probe_quiet_bar.
  detector     with controls_failed == 0 the per-pass control samples
               align positionally, so the in-run burst detector is
               replayed: requeue_quiet_bar == median pass level x 1.2
               (default slack), and a map with hot passes must show
               requeue activity (records, give-ups, errors, or the
               run-wide skip) while a map with none must show none.
  movers       with --prev <prior artifact>: every query whose median
               moved by >= --mover-bar (default 2.0) in EITHER
               direction vs the prior round must carry in-artifact
               evidence (a spliced / isolated / requeued key) — the
               round protocol's evidence rule, checked mechanically.

Exit 0 with a PASS summary, exit 1 listing every FAIL. WARNs (checks
skipped for stated structural reasons) never fail the audit.

Usage: audit_artifact.py <artifact.json> [--prev prior.json]
                         [--mover-bar 2.0]
"""
import json
import statistics

from audit_common import Audit, parse_flags

PROBE = "ctl_shuffle_probe"

# Mirrors Bench.scala's builtin control references (r11 sf0.1 quiet
# window / r14 sf1u quiet window; probe refs are r16, per-JVM-config).
# Keyed by the artifact's own refs_source so a future ref bump that
# forgets this table fails loudly instead of replaying stale refs.
BUILTIN_REFS = {
    "builtin-sf0.1-host-specific": {
        "q01_read_project": 0.0891,
        "q21_multimodal_meta": 0.1956,
        "q220_k_anonymity": 0.3728,
        PROBE: 0.75,
    },
    "builtin-sf1u-host-specific": {
        "q01_read_project": 0.1564,
        "q21_multimodal_meta": 0.2455,
        "q220_k_anonymity": 0.2942,
        PROBE: 0.65,
    },
}

DEFAULT_QUIET_SLACK = 1.2  # SPARK_GRAFT_BENCH_REQUEUE_QUIET_SLACK


def med(xs):
    """Bench.scala's strict median: odd -> middle, even -> mean of the
    two middles (statistics.median matches exactly)."""
    return statistics.median(xs)


def drop_warmup(ts):
    return ts[1:] if len(ts) >= 3 else ts


def close(a, b, rel=1e-6, abs_tol=1e-9):
    return abs(a - b) <= max(abs_tol, rel * max(abs(a), abs(b)))


def audit_structural(d, a):
    q, runs = d["queries"], d.get("runs", {})
    a.ok(close(d["value"], sum(q.values())),
         f"value {d['value']} != sum(queries) {sum(q.values())}")
    a.ok(d.get("failed", 0) == len(d.get("errors", {})),
         f"failed {d.get('failed')} != |errors| {len(d.get('errors', {}))}")
    bad_med = [k for k in q
               if k in runs and runs[k] and not close(q[k], med(runs[k]))]
    a.ok(not bad_med, f"queries median != median(runs) for: {bad_med}")
    missing_runs = [k for k in q if k not in runs or not runs[k]]
    a.ok(not missing_runs, f"queries without runs arrays: {missing_runs}")
    for key in ("requeued", "spliced", "isolated"):
        orphans = [k for k in d.get(key, {}) or {} if k not in q]
        a.ok(not orphans, f"{key} keys not in queries: {orphans}")


def audit_controls(d, a):
    ctl = d.get("controls", {}) or {}
    if not ctl:
        a.warn("no controls in artifact — floor/ratio replay skipped")
        return
    floors = [max(k) / min(k) for k in (drop_warmup(v) for v in ctl.values())
              if len(k) >= 2 and min(k) > 0]
    if d.get("noise_floor") is not None:
        if floors:
            a.ok(close(d["noise_floor"], max(floors)),
                 f"noise_floor {d['noise_floor']} != recomputed "
                 f"{max(floors)}")
        else:
            a.warn("noise_floor claimed but no control vector supports "
                   "recomputation — floor NOT replayed")
    # informational: the honest quiet test's dispersion term (SURVEY
    # §6 round-16): worst control max/min over MAP-PHASE samples only —
    # warmup (first timed sample) and the closing pass (whose idle-tail
    # dip dominates the headline floor at sf1) both excluded
    mp = [max(k) / min(k)
          for k in (v[1:-1] for v in ctl.values() if len(v) >= 4)
          if k and min(k) > 0]
    if mp:
        a.info(f"map-phase-only dispersion {max(mp):.2f} "
               "(warmup + closing pass excluded; the headline "
               "noise_floor includes the closing-dip term)")
    refs = BUILTIN_REFS.get(d.get("refs_source"))
    if refs is None:
        a.warn(f"refs_source {d.get('refs_source')!r} has no mirrored "
               "builtin table — ratio replay skipped")
        return
    ratios = [med(drop_warmup(ts)) / refs[cn]
              for cn, ts in ctl.items()
              if cn != PROBE and cn in refs and drop_warmup(ts)]
    if d.get("control_ratio") is not None:
        if ratios:
            a.ok(close(d["control_ratio"], med(ratios)),
                 f"control_ratio {d['control_ratio']} != recomputed "
                 f"{med(ratios)}")
        else:
            a.warn("control_ratio claimed but no control has samples and "
                   "a mirrored ref — ratio NOT replayed")
    if d.get("probe_ratio") is not None:
        if PROBE in ctl and PROBE in refs and drop_warmup(ctl[PROBE]):
            pr = med(drop_warmup(ctl[PROBE])) / refs[PROBE]
            a.ok(close(d["probe_ratio"], pr),
                 f"probe_ratio {d['probe_ratio']} != recomputed {pr}")
        else:
            a.warn("probe_ratio claimed but the probe has no usable "
                   "samples/ref — NOT replayed")


def audit_requeue(d, a):
    req = d.get("requeued", {}) or {}
    q, runs = d["queries"], d.get("runs", {})
    bar = d.get("requeue_replace_bar")
    quiet_bar = d.get("requeue_quiet_bar")
    probe_quiet_bar = d.get("requeue_probe_quiet_bar")
    probe_abs_bar = d.get("requeue_probe_abs_bar")
    ctl = d.get("controls", {}) or {}
    probe_min = None
    if PROBE in ctl and drop_warmup(ctl[PROBE]):
        probe_min = min(drop_warmup(ctl[PROBE]))
    spliced = set(d.get("spliced", {}) or {})
    prose = [n for n, r in req.items() if not isinstance(r, dict)]
    if prose:
        a.warn(f"{len(prose)} requeued records are pre-r16 prose strings — "
               "record-level replay skipped for them")
    for name, r in req.items():
        if not isinstance(r, dict):
            continue
        pre = f"requeued[{name}]"
        missing = [f for f in ("in_map", "quiet", "quiet_runs", "pre",
                               "post", "replaced") if f not in r]
        if missing or name not in q:
            a.ok(False, f"{pre}: record unusable (missing fields {missing}"
                 f"{', name not in queries' if name not in q else ''})")
            continue
        a.ok(bool(r["quiet_runs"]) and close(r["quiet"],
                                             med(r["quiet_runs"])),
             f"{pre}: quiet {r['quiet']} != median(quiet_runs)")
        if bar:
            if r["in_map"] > 0 and r["quiet"] > 0:
                div = max(r["in_map"] / r["quiet"], r["quiet"] / r["in_map"])
                a.ok(r["replaced"] == (div > bar),
                     f"{pre}: replaced={r['replaced']} but divergence "
                     f"{div:.4f} vs bar {bar}")
            else:
                # Bench forces replaced=false when either median is
                # non-positive — a replaced=true here is provably forged
                a.ok(r["replaced"] is False,
                     f"{pre}: replaced=true with non-positive median "
                     f"(in_map={r['in_map']}, quiet={r['quiet']})")
        if name in spliced:
            # splice_map.py legitimately overwrites queries/runs after
            # the requeue record was emitted; the spliced evidence, not
            # the record, owns the final number
            a.warn(f"{pre}: later spliced — final-number check deferred "
                   "to the spliced evidence")
        else:
            want = r["quiet"] if r["replaced"] else r["in_map"]
            a.ok(close(q[name], want),
                 f"{pre}: queries[{name}]={q[name]} != "
                 f"{'quiet' if r['replaced'] else 'in_map'} {want}")
            if r["replaced"]:
                a.ok(name in runs
                     and len(runs[name]) == len(r["quiet_runs"])
                     and all(close(x, y) for x, y
                             in zip(runs[name], r["quiet_runs"])),
                     f"{pre}: replaced but runs[{name}] != quiet_runs")
        if quiet_bar:
            a.ok(r["pre"] <= quiet_bar and r["post"] <= quiet_bar,
                 f"{pre}: pre/post {r['pre']:.3f}/{r['post']:.3f} exceed "
                 f"quiet bar {quiet_bar:.3f}")
        for side in ("pre_probe", "post_probe"):
            raw = r.get(side)
            if raw is None:
                continue
            if probe_abs_bar:
                a.ok(raw <= probe_abs_bar,
                     f"{pre}: {side} {raw} exceeds absolute bar "
                     f"{probe_abs_bar}")
            if probe_quiet_bar and probe_min:
                a.ok(raw / probe_min <= probe_quiet_bar * (1 + 1e-9),
                     f"{pre}: {side} level {raw / probe_min:.3f} exceeds "
                     f"probe quiet bar {probe_quiet_bar:.3f}")


def audit_detector(d, a):
    """Replay the in-run burst detector from the positional alignment
    of the map-phase control vectors (valid only when no timed control
    run failed — a failure leaves a hole that misaligns passes)."""
    ctl = d.get("controls", {}) or {}
    if not ctl or d.get("controls_failed", 0) != 0:
        a.warn("detector replay skipped (no controls or controls_failed>0)")
        return
    npass = min(len(v) for v in ctl.values())
    if npass < 3:
        a.warn("detector replay skipped (<3 control passes)")
        return
    quiet_min = {cn: min(drop_warmup(ts)) for cn, ts in ctl.items()
                 if drop_warmup(ts) and min(drop_warmup(ts)) > 0}

    def pass_ratio(i):
        rs = [ctl[cn][i] / quiet_min[cn] for cn in ctl
              if cn in quiet_min and i < len(ctl[cn])]
        return med(rs) if rs else None

    levels = [pass_ratio(i) for i in range(npass)]
    body = [x for x in levels[1:] if x is not None]
    if not body:
        a.warn("detector replay skipped (no pass levels)")
        return
    median_level = med(body)
    # the artifact stores only the derived bars, not the slack knob —
    # recover the slack from the main bar and require the probe bar to
    # be consistent with it (both come from the SAME quietSlack in
    # Bench), warning when the run demonstrably used a non-default env
    slack = None
    if d.get("requeue_quiet_bar") is not None and median_level > 0:
        slack = d["requeue_quiet_bar"] / median_level
        if not close(slack, DEFAULT_QUIET_SLACK, rel=1e-6):
            a.warn(f"derived quiet slack {slack:.4f} differs from the "
                   f"default {DEFAULT_QUIET_SLACK} — non-default "
                   "SPARK_GRAFT_BENCH_REQUEUE_* env; detector replay uses "
                   "the derived value")
    probe_levels = None
    probe_med = None
    if PROBE in quiet_min:
        probe_levels = [ctl[PROBE][i] / quiet_min[PROBE]
                        for i in range(1, npass)]
        probe_med = med(probe_levels)
        if d.get("requeue_probe_quiet_bar") is not None and slack:
            want = probe_med * slack
            a.ok(close(d["requeue_probe_quiet_bar"], want, rel=1e-6),
                 f"requeue_probe_quiet_bar {d['requeue_probe_quiet_bar']} "
                 f"!= median probe level {probe_med:.4f} x the derived "
                 f"slack {slack:.4f} — the two bars must share one slack")
    # the hot ratio (default 1.5) is NOT recoverable from the artifact;
    # replay with the default and treat a mismatch as hard only when the
    # derived slack shows the run used default knobs
    hot = []
    for i in range(1, npass):
        med_hot = levels[i] is not None and levels[i] / median_level > 1.5
        probe_hot = (probe_med is not None
                     and probe_levels[i - 1] / probe_med > 1.5)
        if med_hot or probe_hot:
            hot.append(i)
    activity = (len(d.get("requeued", {}) or {})
                + d.get("requeue_gave_up", 0)
                + d.get("requeue_errored", 0)) > 0 \
        or d.get("requeue_runwide_skip", False)
    defaults = slack is not None and close(slack, DEFAULT_QUIET_SLACK,
                                           rel=1e-6)
    label = (f"hot passes {hot} vs requeue activity {activity} disagree "
             "(a flagged pass must leave requeue records / give-ups / the "
             "run-wide skip, and activity needs a flagged pass)")
    if d.get("requeue_quiet_bar") is None:
        a.warn("requeue disabled in this run — hot-pass/activity "
               f"cross-check informational only (hot passes: {hot})")
    elif not defaults:
        a.warn("non-default detector knobs — hot-pass/activity cross-check "
               f"informational only (replay at 1.5 gives hot={hot}, "
               f"activity={activity})")
    elif hot and not activity and (d.get("failed", 0) > 0
                                   or d.get("errors")):
        # Bench's suspect filter drops errored queries, so a hot pass
        # bracketing only failures legitimately leaves no activity
        a.warn(f"hot passes {hot} with no requeue activity, but the run "
               "has errored queries — possibly all bracketed queries "
               "errored; not failing")
    else:
        a.ok(bool(hot) == activity, label)


def audit_movers(d, prev, mover_bar, a):
    q, pq = d["queries"], prev["queries"]
    evidence = set()
    for key in ("requeued", "spliced", "isolated"):
        evidence |= set(d.get(key, {}) or {})
    naked = []
    for name in q:
        if name not in pq or q[name] <= 0 or pq[name] <= 0:
            continue
        ratio = max(q[name] / pq[name], pq[name] / q[name])
        if ratio >= mover_bar and name not in evidence:
            naked.append(f"{name} ({pq[name]:.3f} -> {q[name]:.3f}, "
                         f"{ratio:.2f}x)")
    a.ok(not naked,
         f">= {mover_bar}x movers vs prior artifact without in-artifact "
         f"evidence: {naked}")


def main():
    import sys
    path, flags = parse_flags(sys.argv[1:],
                              {"--prev": str, "--mover-bar": float},
                              __doc__)
    prev_path = flags.get("--prev")
    mover_bar = flags.get("--mover-bar", 2.0)
    d = json.load(open(path))
    a = Audit()
    if not isinstance(d.get("queries"), dict) or not d["queries"]:
        # e.g. the round driver's BENCH_r{N}.json stdout-wrapper files
        # (n/rc/tail keys) — not a Bench artifact at all
        a.ok(False, "no usable `queries` object — not a graft.Bench "
             f"artifact (top-level keys: {sorted(d)[:8]})")
        a.finish(f"{path}: not auditable")
    audit_structural(d, a)
    audit_controls(d, a)
    audit_requeue(d, a)
    audit_detector(d, a)
    if prev_path:
        audit_movers(d, json.load(open(prev_path)), mover_bar, a)
    a.finish(f"{path}: {a.passes} checks passed, {len(a.fails)} failed, "
             f"{len(a.warns)} skipped")


if __name__ == "__main__":
    main()
