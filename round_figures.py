"""Print the round's citable figures FROM the committed artifacts.

Three rounds running (r6, r7, r8 verdicts), changelog prose cited
numbers — bench totals, sweep counts — that the committed JSON
artifacts did not show, because the prose was written from in-session
runs that were later superseded.  The structural fix (round-8 verdict
#3): changelog/README figures are generated from the artifacts, never
typed.  Run this at round close and paste its output; any number in
CHANGES_r{N}.md that this script cannot print does not belong there.

Usage:  python round_figures.py <round>          (e.g. 9)

Reads (whichever exist): BENCH_r{N}.json, CORRECTNESS_r{N}.json,
CORRECTNESS_FULL_r{N}.json.  Exits nonzero if none exist.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        raise SystemExit("usage: python round_figures.py <round-number>")
    rnd = int(sys.argv[1])
    found = False
    lines: list[str] = []

    p = os.path.join(HERE, f"BENCH_r{rnd:02d}.json")
    if os.path.exists(p):
        found = True
        b = json.load(open(p))
        # the driver wraps bench.py's JSON line under "parsed"
        b = b.get("parsed", b)
        qs = b.get("queries", {})
        lines.append(
            f"bench (BENCH_r{rnd:02d}.json): {b.get('value')} "
            f"{b.get('unit', 'sec')} total / {len(qs)} headliners "
            f"at sf={b.get('sf')}"
        )
        if qs:
            worst = max(qs, key=qs.get)
            lines.append(
                f"  slowest headliner: {worst} = {qs[worst]} sec"
            )

    p = os.path.join(HERE, f"CORRECTNESS_r{rnd:02d}.json")
    if os.path.exists(p):
        found = True
        c = json.load(open(p))
        rows = c.get("queries", c)  # driver artifact is flat
        ok = sum(
            1
            for v in rows.values()
            if isinstance(v, dict)
            and v.get("rows_match")
            and v.get("schema_match")
            and v.get("hash_match")
        )
        lines.append(
            f"driver window (CORRECTNESS_r{rnd:02d}.json): "
            f"{ok}/{len(rows)} rows+schema+hash"
        )

    p = os.path.join(HERE, f"CORRECTNESS_FULL_r{rnd:02d}.json")
    if os.path.exists(p):
        found = True
        s = json.load(open(p))
        lines.append(
            f"full sweep (CORRECTNESS_FULL_r{rnd:02d}.json): "
            f"{s.get('match')}/{s.get('total')} match, "
            f"{s.get('fail')} fail, {s.get('wall_sec')} s wall, "
            f"sf={s.get('sf')}, {s.get('session')}"
        )
        bad = [
            k
            for k, v in s.get("queries", {}).items()
            if v.get("status") != "match"
        ]
        if bad:
            lines.append(f"  NON-MATCHING: {bad}")

    p = os.path.join(HERE, f"DETERMINISM_r{rnd:02d}.json")
    if os.path.exists(p):
        found = True
        d = json.load(open(p))
        issues = d.get("issues", [])
        lines.append(
            f"determinism (DETERMINISM_r{rnd:02d}.json): "
            f"{d.get('audited')} queries audited under shuffle layouts "
            f"{d.get('shuffle_partition_settings')}, "
            f"{len(issues)} issues, {d.get('wall_sec')} s wall"
        )
        if issues:
            lines.append(f"  NONDETERMINISTIC: {issues}")

    p = os.path.join(HERE, f"PLAN_AUDIT_r{rnd:02d}.json")
    if os.path.exists(p):
        found = True
        a = json.load(open(p))
        lines.append(
            f"plan audit (PLAN_AUDIT_r{rnd:02d}.json): "
            f"{a.get('total')} plans, "
            f"{a.get('violations')} unexplained anti-patterns, "
            f"{a.get('whitelisted')} whitelisted, "
            f"{a.get('wall_sec')} s wall"
        )

    p = os.path.join(HERE, f"SHUFFLE_r{rnd:02d}.json")
    if os.path.exists(p):
        found = True
        sh = json.load(open(p))
        lines.append(
            f"shuffle audit (SHUFFLE_r{rnd:02d}.json): "
            f"{len(sh.get('queries', {}))} headliners, "
            f"{sh.get('total_shuffle_write_bytes'):,} shuffle bytes "
            f"written, {sh.get('total_spill_bytes'):,} spill bytes, "
            f"sf={sh.get('sf')}"
        )
        if sh.get("missing"):
            lines.append(f"  UNATTRIBUTED: {sh['missing']}")
        if sh.get("baseline_round") is not None:
            d = sh.get("diff", {})
            n_ok = sum(1 for r in d.values() if r["status"] == "ok")
            n_new = sum(1 for r in d.values() if r["status"] == "new")
            n_wl = sum(
                1 for r in d.values()
                if str(r["status"]).startswith("whitelisted")
            )
            lines.append(
                f"  diff vs SHUFFLE_r{sh['baseline_round']:02d}: "
                f"{n_ok} ok, {n_new} new, {n_wl} whitelisted, "
                f"{len(sh.get('diff_violations', []))} violations"
            )
            for name, r in sorted(d.items()):
                st = str(r["status"])
                if st.startswith(("VIOLATION", "whitelisted")):
                    lines.append(f"    {name}: {st}")

    if not found:
        raise SystemExit(f"no r{rnd:02d} artifacts found in {HERE}")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
