#!/usr/bin/env python3
"""Unit tests for the artifact auditor's r17 checks (driver-side dev
tooling — NOT part of the Scala library). Run: python3 tools/test_audits.py

Covers the round-16 verdict's "done" criteria:
  ask #2  a deliberately mismatched control ref (artifact vs the
          auditor's mirror) makes the auditor FAIL;
  ask #1  the map_phase_dispersion gate fails above its bar, the
          recomputation catches a falsified value, an excluded pass
          that does not replay detector-hot fails, and an ambient-slow
          window (control_ratio > 1.15) with no per-query evidence
          fails;
plus the ADVICE items: an unknown requeue_ratio downgrades the
hot-pass/activity cross-check to WARN (never a wrong-ratio FAIL), and
a known ratio keeps it gating.
"""
import audit_artifact as aa
from audit_common import Audit


PASSED = []


def check(name, cond):
    assert cond, name
    PASSED.append(name)


def run_refs(d):
    a = Audit()
    aa.resolve_refs(d, a)
    return a


def fails_mention(a, needle):
    return any(needle in f for f in a.fails)


SRC = "builtin-sf0.1-host-specific"
GOOD_REFS = dict(aa.BUILTIN_REFS[SRC])

# ---- ask #2: emitted-refs vs mirror cross-check ----
a = run_refs({"refs_source": SRC, "control_refs": dict(GOOD_REFS)})
check("matching refs pass", not a.fails)

bad = dict(GOOD_REFS)
bad[aa.PROBE] = 0.70  # a re-anchor that forgot the auditor's mirror
a = run_refs({"refs_source": SRC, "control_refs": bad})
check("mismatched ref FAILS", fails_mention(a, "control_refs drift"))

a = run_refs({"refs_source": SRC,
              "control_refs": {k: v for k, v in GOOD_REFS.items()
                               if k != aa.PROBE}})
check("missing ref key FAILS", fails_mention(a, "control_refs drift"))

a = run_refs({"refs_source": "builtin-sf9-host-specific",
              "control_refs": dict(GOOD_REFS)})
check("unknown builtin refs_source FAILS",
      fails_mention(a, "no mirror"))

a = run_refs({"refs_source": "env", "control_refs": {"q01": 0.1}})
check("env-sourced emitted refs pass without a mirror", not a.fails)

a = run_refs({"refs_source": SRC})
check("pre-r17 artifact falls back to the mirror with a WARN",
      not a.fails and any("pre-r17" in w for w in a.warns))

# heap/refs-source mismatch is surfaced (WARN, not FAIL)
a = run_refs({"refs_source": SRC, "control_refs": dict(GOOD_REFS),
              "max_heap_bytes": 64 * 2**30})
check("sf0.1 refs under -Xmx64g WARNs",
      not a.fails and any("max heap" in w for w in a.warns))


# ---- ask #1: the map_phase_dispersion gate ----
def run_disp(d, hot=None, bar=None):
    a = Audit()
    aa.audit_dispersion(d, hot, bar, a)
    return a


# controls misaligned (controls_failed>0): gate runs on the emitted value
base = {"refs_source": SRC, "controls": {"a": [1, 1, 1]},
        "controls_failed": 1}
a = run_disp(dict(base, map_phase_dispersion=1.4))
check("dispersion under the sf0.1 bar passes", not a.fails)
a = run_disp(dict(base, map_phase_dispersion=2.4))
check("dispersion over the sf0.1 bar FAILS",
      fails_mention(a, "exceeds the quiet bar"))
a = run_disp(dict(base, map_phase_dispersion=2.4,
                  refs_source="builtin-sf1u-host-specific"))
check("sf1u bar is 2.2", fails_mention(a, "exceeds the quiet bar"))
a = run_disp(dict(base, map_phase_dispersion=2.4), bar=3.0)
check("--dispersion-bar override wins", not a.fails)
a = run_disp({"refs_source": SRC, "controls": {}, "controls_failed": 0})
check("pre-r17 artifact (no field) is a WARN, not a FAIL",
      not a.fails and any("pre-r17" in w for w in a.warns))

# aligned controls: the emitted value must replay from the vectors
# (pass 0 = warmup, last pass = closing, both excluded; keep = [1, 2])
ctl = {"a": [9.0, 1.0, 2.0, 0.1], "b": [9.0, 1.0, 1.0, 0.1]}
ok = {"refs_source": SRC, "controls": ctl, "controls_failed": 0,
      "map_phase_dispersion": 2.0}
a = run_disp(dict(ok))
check("recomputed dispersion matches", not a.fails)
a = run_disp(dict(ok, map_phase_dispersion=1.2))
check("falsified dispersion FAILS", fails_mention(a, "!= recomputed"))

# excluded passes must replay detector-hot and carry requeue records
exc = {"refs_source": SRC, "controls": {"a": [9.0, 1.0, 5.0, 1.0, 0.1]},
       "controls_failed": 0, "map_phase_dispersion": 1.0,
       "map_phase_excluded_passes": [2]}
a = run_disp(dict(exc, requeued={"q": {}}), hot=[2])
check("hot+certified exclusion passes", not a.fails)
a = run_disp(dict(exc, requeued={"q": {}}), hot=[])
check("non-hot exclusion FAILS",
      fails_mention(a, "do not replay as detector-hot"))
a = run_disp(dict(exc), hot=[2])
check("exclusion without requeue records FAILS",
      fails_mention(a, "no requeued records"))
a = run_disp(dict(exc, requeued={"q": {}}), hot=None)
check("exclusion with unavailable replay WARNs",
      not fails_mention(a, "detector-hot")
      and any("not verifiable" in w for w in a.warns))

# ambient-slow windows cannot self-certify
amb = dict(base, map_phase_dispersion=1.4, control_ratio=1.3)
a = run_disp(dict(amb))
check("ratio>1.15 with zero evidence FAILS",
      fails_mention(a, "cannot self-certify"))
a = run_disp(dict(amb, isolated={"q": {}}))
check("ratio>1.15 with evidence passes", not a.fails)
a = run_disp(dict(amb, control_ratio=1.05))
check("quiet ratio passes", not a.fails)


# ---- ADVICE: requeue_ratio in the detector cross-check ----
def run_det(d):
    a = Audit()
    hot = aa.audit_detector(d, a)
    return a, hot


# 5 aligned passes; pass 2 reads 3x the median level on every control
# (hot at ratio 1.5) but there is NO requeue activity -> with a known
# ratio that is a FAIL, without one it must stay a WARN
hotctl = {"a": [2.0, 1.0, 3.0, 1.0, 1.0], "b": [2.0, 1.0, 3.0, 1.0, 1.0]}
det = {"controls": hotctl, "controls_failed": 0,
       "requeue_quiet_bar": 1.2}
a, hot = run_det(dict(det, requeue_ratio=1.5))
check("known ratio: hot pass with no activity FAILS",
      hot == [2] and fails_mention(a, "disagree"))
a, hot = run_det(dict(det))
check("unknown ratio: cross-check is WARN only",
      hot == [2] and not a.fails
      and any("no requeue_ratio" in w for w in a.warns))
a, hot = run_det(dict(det, requeue_ratio=5.0))
check("custom ratio replayed as emitted (nothing hot at 5.0)",
      hot == [] and not a.fails)
a, hot = run_det(dict(det, requeue_ratio=1.5, requeued={"q": {}}))
check("known ratio: hot pass with activity passes", not a.fails)

print(f"PASS  {len(PASSED)} auditor unit checks")
