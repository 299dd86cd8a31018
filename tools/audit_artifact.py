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
               non-probe controls of med(warmup-dropped)/active-ref;
               probe_ratio likewise for ctl_shuffle_probe. The active
               references are the artifact's own `control_refs`
               (r17+), HARD-cross-checked against the mirror of
               Bench.scala's builtin tables below when refs_source is
               builtin-* — a re-anchor that updates only one side
               FAILS here instead of silently replaying stale refs;
               pre-r17 artifacts fall back to the mirror alone.
  dispersion   the honest quiet GATE (r16 verdict ask #1):
               map_phase_dispersion == worst per-control max/min over
               the interleave passes proper (pass 0 = warmup, the
               closing pass, and the certified-caught hot passes in
               map_phase_excluded_passes all excluded) — recomputed,
               each excluded pass verified detector-hot with requeue
               records behind it, and GATED: FAIL above 2.0 (sf0.1) /
               2.2 (sf1u) (override: --dispersion-bar), and FAIL when
               control_ratio > 1.15 with zero per-query evidence keys
               (an ambient-slow window cannot self-certify a map).
               This field replaces noise_floor as the window's quiet
               claim: the probe's own in-map-vs-closing-dip gap sets
               the headline floor by construction (~2.0-2.4 even when
               genuinely quiet), so a floor bar stopped measuring the
               host in r16.
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
               replayed at the artifact's own requeue_ratio (r17+;
               pre-r17 artifacts lack the field, so the replay runs at
               the 1.5 default and the cross-check is informational —
               a custom-ratio run must not be FAILed at the wrong
               ratio): requeue_quiet_bar == median pass level x the
               derived slack, and a map with hot passes must show
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
                         [--mover-bar 2.0] [--dispersion-bar X]
"""
import statistics

from audit_common import Audit, load_json, parse_flags

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
DEFAULT_REQUEUE_RATIO = 1.5  # pre-r17 artifacts don't carry the knob

# map_phase_dispersion bars (r16 verdict ask #1), keyed like the refs:
# sf0.1's quiet interleave windows read 1.3-1.4, sf1's 1.4-1.7 (larger
# working set, more cache-pressure spread), so 2.0/2.2 separates a
# quiet map from one a burst actually touched
DISPERSION_BARS = {
    "builtin-sf0.1-host-specific": 2.0,
    "builtin-sf1u-host-specific": 2.2,
}
AMBIENT_RATIO_BAR = 1.15


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


def resolve_refs(d, a):
    """The active control references for ratio replay, single-sourced
    from the artifact (r16 verdict ask #2): an r17+ artifact carries
    the refs Bench actually applied in `control_refs`, and when
    refs_source claims a builtin table the emitted refs must MATCH the
    mirror above key-for-key — a re-anchor that updated Bench.scala but
    not this tool (or vice versa) FAILS here instead of silently
    replaying one side's stale numbers. Pre-r17 artifacts (no
    control_refs) fall back to the mirror keyed by refs_source; an
    env-sourced r17+ artifact replays against its own emitted refs
    (previously unreplayable). Returns None when no refs are usable."""
    src = d.get("refs_source")
    emitted = d.get("control_refs")
    mirror = BUILTIN_REFS.get(src)
    heap = d.get("max_heap_bytes")
    # the probe's builtin quiet refs are per-JVM-config (default heap vs
    # -Xmx64g, a measured ~15% gap) while refs_source is keyed by the
    # sfDir basename — surface a heap/refs mismatch the basename hides
    if isinstance(heap, (int, float)) and heap > 0:
        gib = heap / 2**30
        if src == "builtin-sf0.1-host-specific" and gib >= 48:
            a.warn(f"refs_source {src} (probe ref measured at default "
                   f"heap) but the run's max heap was {gib:.0f} GiB — the "
                   "probe's absolute quiet bar is ~15% loose for this "
                   "JVM config")
        if src == "builtin-sf1u-host-specific" and gib < 48:
            a.warn(f"refs_source {src} (probe ref measured at -Xmx64g) "
                   f"but the run's max heap was {gib:.0f} GiB — the "
                   "probe's absolute quiet bar is ~15% tight for this "
                   "JVM config")
    if isinstance(emitted, dict) and emitted:
        if isinstance(src, str) and src.startswith("builtin-"):
            if mirror is None:
                a.ok(False, f"refs_source {src!r} claims a builtin table "
                     "this auditor has no mirror for — Bench.scala and "
                     "audit_artifact.py re-anchored apart")
            else:
                drift = sorted(k for k in set(emitted) | set(mirror)
                               if k not in emitted or k not in mirror
                               or not close(emitted[k], mirror[k]))
                a.ok(not drift, "control_refs drift vs the auditor's "
                     f"mirror for {src}: {drift} — Bench.scala and "
                     "audit_artifact.py must be re-anchored TOGETHER")
        return emitted
    if mirror is not None:
        a.warn("pre-r17 artifact (no control_refs field) — ratios "
               "replayed against the auditor's mirrored builtin table")
        return mirror
    a.warn(f"refs_source {src!r} has no usable refs (no control_refs "
           "in the artifact, no mirrored builtin table) — ratio replay "
           "skipped")
    return None


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
    refs = resolve_refs(d, a)
    if refs is None:
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
    run failed — a failure leaves a hole that misaligns passes).
    Returns the replayed hot-pass list (None when not replayable) so
    the dispersion gate can verify excluded passes against it."""
    ctl = d.get("controls", {}) or {}
    if not ctl or d.get("controls_failed", 0) != 0:
        a.warn("detector replay skipped (no controls or controls_failed>0)")
        return None
    npass = min(len(v) for v in ctl.values())
    if npass < 3:
        a.warn("detector replay skipped (<3 control passes)")
        return None
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
        return None
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
    # the hot ratio rides in the artifact from r17 (requeue_ratio); a
    # pre-r17 artifact is replayed at the 1.5 default but the cross-check
    # stays informational for it — a run with a custom RATIO (and any
    # quiet-slack setting) must not be FAILed at the wrong ratio
    known_ratio = d.get("requeue_ratio")
    ratio = known_ratio if isinstance(known_ratio, (int, float)) \
        else DEFAULT_REQUEUE_RATIO
    hot = []
    for i in range(1, npass):
        med_hot = levels[i] is not None and levels[i] / median_level > ratio
        probe_hot = (probe_med is not None
                     and probe_levels[i - 1] / probe_med > ratio)
        if med_hot or probe_hot:
            hot.append(i)
    activity = (len(d.get("requeued", {}) or {})
                + d.get("requeue_gave_up", 0)
                + d.get("requeue_errored", 0)) > 0 \
        or d.get("requeue_runwide_skip", False)
    label = (f"hot passes {hot} vs requeue activity {activity} disagree "
             "(a flagged pass must leave requeue records / give-ups / the "
             "run-wide skip, and activity needs a flagged pass)")
    if d.get("requeue_quiet_bar") is None:
        a.warn("requeue disabled in this run — hot-pass/activity "
               f"cross-check informational only (hot passes: {hot})")
    elif known_ratio is None:
        a.warn("no requeue_ratio in the artifact (pre-r17) — hot-pass/"
               "activity cross-check informational only (replay at "
               f"{DEFAULT_REQUEUE_RATIO} gives hot={hot}, "
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
    return hot


def audit_dispersion(d, hot, bar_override, a):
    """The honest quiet GATE (r16 verdict ask #1). The headline
    noise_floor stopped measuring the host when the probe joined the
    controls (its in-map-vs-closing-dip gap sets the floor by
    construction, ~2.0-2.4 in certifiably quiet windows), so the
    window's quiet claim is now map_phase_dispersion: worst per-control
    max/min over the interleave passes proper — warmup (pass 0), the
    closing pass, and the certified-caught hot passes listed in
    map_phase_excluded_passes all excluded. Replayed from the control
    vectors, each exclusion verified against the detector replay (`hot`
    from audit_detector) plus the requeue records it leans on, then
    GATED against the scale's bar. An ambient-slow window additionally
    cannot self-certify: control_ratio > 1.15 with zero per-query
    evidence keys is a FAIL."""
    mpd = d.get("map_phase_dispersion")
    excl = d.get("map_phase_excluded_passes") or []
    if mpd is None:
        a.warn("no map_phase_dispersion field (pre-r17 artifact) — the "
               "honest quiet gate is not replayable for it; skipped")
        return
    ctl = d.get("controls", {}) or {}
    if ctl and d.get("controls_failed", 0) == 0:
        npass = min(len(v) for v in ctl.values())
        keep = [i for i in range(1, npass - 1) if i not in set(excl)]
        disps = [max(kept) / min(kept)
                 for kept in ([ts[i] for i in keep if i < len(ts)]
                              for ts in ctl.values())
                 if len(kept) >= 2 and min(kept) > 0]
        if disps:
            a.ok(close(mpd, max(disps)),
                 f"map_phase_dispersion {mpd} != recomputed {max(disps)}")
        else:
            a.warn("map_phase_dispersion claimed but no control vector "
                   "supports recomputation — NOT replayed")
        if excl:
            if hot is None:
                a.warn(f"map_phase_excluded_passes {excl} not verifiable "
                       "(detector replay unavailable)")
            else:
                bogus = [p for p in excl if p not in hot]
                a.ok(not bogus,
                     f"map_phase_excluded_passes {bogus} do not replay as "
                     "detector-hot — the exclusion is not justified by "
                     "the artifact")
            a.ok(bool(d.get("requeued")),
                 f"map_phase_excluded_passes {excl} with no requeued "
                 "records — a caught-burst exclusion needs the requeue "
                 "certification it claims")
    else:
        a.warn("map_phase_dispersion not recomputable (no controls or "
               "controls_failed>0) — gated on the emitted value")
    bar = bar_override if bar_override is not None \
        else DISPERSION_BARS.get(d.get("refs_source"))
    if bar is None:
        a.warn(f"no dispersion bar for refs_source "
               f"{d.get('refs_source')!r} — pass --dispersion-bar; "
               "quiet gate skipped")
    else:
        a.ok(mpd <= bar,
             f"map_phase_dispersion {mpd} exceeds the quiet bar {bar} — "
             "the map window is not quiet; re-run the map or carry "
             "per-query evidence for every number it quotes")
        a.info(f"map_phase_dispersion {mpd:.3f} vs bar {bar} "
               f"(excluded passes: {excl or 'none'})")
    cr = d.get("control_ratio")
    if cr is not None and cr > AMBIENT_RATIO_BAR:
        evid = sum(len(d.get(k) or {})
                   for k in ("requeued", "spliced", "isolated"))
        a.ok(evid > 0,
             f"control_ratio {cr} > {AMBIENT_RATIO_BAR} (ambient-slow "
             "window) with zero per-query evidence keys — an ambient-"
             "slow map cannot self-certify its numbers")


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
                              {"--prev": str, "--mover-bar": float,
                               "--dispersion-bar": float},
                              __doc__)
    prev_path = flags.get("--prev")
    mover_bar = flags.get("--mover-bar", 2.0)
    d = load_json(path)
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
    hot = audit_detector(d, a)
    audit_dispersion(d, hot, flags.get("--dispersion-bar"), a)
    if prev_path:
        audit_movers(d, load_json(prev_path), mover_bar, a)
    a.finish(f"{path}: {a.passes} checks passed, {len(a.fails)} failed, "
             f"{len(a.warns)} skipped")


if __name__ == "__main__":
    main()
