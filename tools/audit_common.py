"""Shared scaffolding for the artifact/correctness auditors
(driver-side dev tooling — NOT part of the Scala library).

One Audit reporter, one flag-parsing loop, and one JSON loader, so a
fix to any of them (message wording, a new severity, operand
validation, error handling) lands in both tools at once instead of
silently diverging.
"""
import json
import sys


def load_json(path):
    """Load a JSON file, exiting with a one-line message (never a
    traceback) on a missing/unreadable path or malformed JSON — the
    same no-traceback contract parse_flags enforces for bad flags."""
    try:
        with open(path) as f:
            return json.load(f)
    except OSError as e:
        raise SystemExit(f"cannot read {path}: {e}")
    except json.JSONDecodeError as e:
        raise SystemExit(f"{path} is not valid JSON: {e}")


class Audit:
    def __init__(self):
        self.fails, self.warns, self.infos, self.passes = [], [], [], 0

    def ok(self, cond, label):
        if cond:
            self.passes += 1
        else:
            self.fails.append(label)

    def warn(self, label):
        self.warns.append(label)

    def info(self, label):
        self.infos.append(label)

    def finish(self, headline):
        """Print INFO/WARN/FAIL lines and the summary, then exit
        (0 on pass, 1 on any FAIL)."""
        for n in self.infos:
            print(f"INFO  {n}")
        for w in self.warns:
            print(f"WARN  {w}")
        for f in self.fails:
            print(f"FAIL  {f}")
        print(f"{'FAIL' if self.fails else 'PASS'}  {headline}")
        sys.exit(1 if self.fails else 0)


def parse_flags(args, spec, usage):
    """Parse trailing `--flag operand` pairs after the positional
    artifact path. `spec` maps flag name -> converter (a callable that
    raises ValueError on bad input). Returns (path, {flag: value}).
    Every malformed input exits with the usage text, never a
    traceback."""
    if not args:
        raise SystemExit(usage)
    path, out, i = args[0], {}, 1
    while i < len(args):
        flag = args[i]
        if flag not in spec:
            raise SystemExit(f"unknown arg {flag}\n\n{usage}")
        if i + 1 >= len(args):
            raise SystemExit(f"{flag} needs an operand\n\n{usage}")
        try:
            out[flag] = spec[flag](args[i + 1])
        except ValueError as e:
            raise SystemExit(f"bad {flag} operand {args[i + 1]!r}: {e}"
                             f"\n\n{usage}")
        i += 2
    return path, out
