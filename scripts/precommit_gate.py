"""Pre-commit test gate (r09 verdict ask #8): the round-9 defect shipped
in the final end-of-round snapshot because a new operator was committed
without running its tests. This script runs the MINIMUM suite the staged
diff demands — the test modules that reference any changed source module,
every staged test module itself, plus tests/test_plans.py whenever
operator/plan source changed (budgets and plan-shape bans are exactly
what silent last-minute edits break) — and exits nonzero on any failure.

Round checklist usage (documented in SURVEY.md §7):

    python scripts/precommit_gate.py        # gate the staged diff
    python scripts/precommit_gate.py --all  # gate the working tree diff

Not installed as a blocking git hook on purpose: the end-of-round
snapshot is driver-side and must never be blocked into losing work; the
gate is the builder's discipline before every `git commit`, cheap
because it only runs what the diff touches.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def staged_files(working_tree: bool) -> list[str]:
    args = ["git", "diff", "--name-only", "--cached"]
    if working_tree:
        args = ["git", "diff", "--name-only", "HEAD"]
    out = subprocess.run(args, cwd=REPO, capture_output=True, text=True,
                         check=True).stdout
    return [ln.strip() for ln in out.splitlines() if ln.strip()]


def tests_for(changed: list[str]) -> list[str]:
    tests: set[str] = set()
    plan_gate = False
    src_mods = []
    for f in changed:
        if f.startswith("tests/") and f.endswith(".py") \
                and os.path.basename(f).startswith("test_"):
            tests.add(f)
        elif f.endswith(".py") and f.startswith("fts_errors_clustering_spark"):
            src_mods.append(os.path.splitext(os.path.basename(f))[0])
            plan_gate = True
        elif f in ("__spark_entry__.py", "bench.py"):
            plan_gate = True
    if src_mods:
        # any test module that mentions a changed source module by name
        test_dir = os.path.join(REPO, "tests")
        for tf in sorted(os.listdir(test_dir)):
            if not (tf.startswith("test_") and tf.endswith(".py")):
                continue
            body = open(os.path.join(test_dir, tf), encoding="utf-8").read()
            if any(m in body for m in src_mods):
                tests.add(f"tests/{tf}")
    if plan_gate:
        tests.add("tests/test_plans.py")
    return sorted(tests)


def main() -> int:
    working_tree = "--all" in sys.argv[1:]
    changed = staged_files(working_tree)
    if not changed:
        print("precommit_gate: nothing staged")
        return 0
    tests = tests_for(changed)
    if not tests:
        print("precommit_gate: no source/test changes to gate "
              f"({len(changed)} files, docs/artifacts only)")
        return 0
    print(f"precommit_gate: {len(changed)} changed files -> "
          f"{len(tests)} test modules:\n  " + "\n  ".join(tests))
    r = subprocess.run([sys.executable, "-m", "pytest", "-x", "-q", *tests],
                       cwd=REPO)
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
