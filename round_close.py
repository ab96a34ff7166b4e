"""Atomic round-close: regenerate EVERY evidence artifact, then print
the changelog figures — as ONE final step.

The r9 verdict's #1 task: four rounds running, a changelog figure
drifted from its committed artifact because the artifacts were
refreshed piecemeal and the prose written from an earlier run.  The
fix is structural: this script is the LAST act of a round.  It re-runs,
in order,

  1. ``full_registry_sweep.py <N>``   -> CORRECTNESS_FULL_r{N}.json
  2. ``determinism_audit.py <N>``     -> DETERMINISM_r{N}.json
  3. ``plan_audit.py <N>``            -> PLAN_AUDIT_r{N}.json
  4. ``pytest tests/ -q``             (must be green)
  5. ``round_figures.py <N>``         (prints the ONLY numbers allowed
                                       into CHANGES_r{N}.md / README)

and exits nonzero if ANY step fails, so a half-refreshed evidence set
cannot be committed by accident.  If any source file changes after
this script ran, it must be run again — the figures it printed are
stale the moment the code moves.

Usage:  python round_close.py <round>        (e.g. 10)
        ROUND_CLOSE_SKIP_PYTEST=1 for a quick artifact-only refresh
        (NOT valid for the final commit of a round).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def run(step: str, cmd: list[str]) -> None:
    t0 = time.time()
    print(f"\n=== round_close: {step}: {' '.join(cmd)} ===", flush=True)
    res = subprocess.run(cmd, cwd=HERE)
    dt = time.time() - t0
    if res.returncode != 0:
        raise SystemExit(
            f"round_close FAILED at step '{step}' "
            f"(exit {res.returncode}, {dt:.0f}s) — fix and re-run; do not "
            f"commit a partially refreshed evidence set"
        )
    print(f"=== round_close: {step} OK ({dt:.0f}s) ===", flush=True)


def main() -> None:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        raise SystemExit("usage: python round_close.py <round-number>")
    rnd = sys.argv[1]
    py = sys.executable
    run("full sweep", [py, "full_registry_sweep.py", rnd])
    run("determinism audit", [py, "determinism_audit.py", rnd])
    run("plan audit", [py, "plan_audit.py", rnd])
    run("shuffle audit", [py, "shuffle_audit.py", rnd])
    if os.environ.get("ROUND_CLOSE_SKIP_PYTEST") != "1":
        run("pytest", [py, "-m", "pytest", "tests/", "-q"])
    else:
        print("\n=== round_close: pytest SKIPPED (quick refresh only — "
              "rerun without ROUND_CLOSE_SKIP_PYTEST before the final "
              "commit) ===")
    run("figures", [py, "round_figures.py", rnd])
    print(
        "\nround_close COMPLETE: the figures above are the only numbers "
        f"CHANGES_r{int(rnd):02d}.md may cite; commit the refreshed "
        "artifacts together with the changelog in the SAME commit."
    )


if __name__ == "__main__":
    main()
