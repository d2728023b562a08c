"""One pytest-count source of truth (VERDICT r07 #8: SURVEY said 575
in one place and 574 in another while README said 460+). This tool
collects the suite (no execution), and rewrites every marked count
line in SURVEY.md / README.md to the same number. Run it before the
round-end commit:

    python tools/sync_test_count.py            # update the docs
    python tools/sync_test_count.py --check    # fail if out of sync

Docs opt in with the literal marker ``<!-- test-count -->`` on the
line; the tool replaces the first ``NNN pytest`` / ``NNN unit`` style
number on that line. Counts come from ``pytest --collect-only -q``
(parametrized cases counted individually — the same number a full run
reports as "N passed").
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["SURVEY.md", "README.md"]
MARKER = "<!-- test-count -->"


def collected_count() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    m = re.search(r"(\d+) tests? collected", out.stdout)
    if not m:
        raise SystemExit(
            f"could not parse collect-only output:\n{out.stdout[-800:]}"
        )
    return int(m.group(1))


def sync(check_only: bool) -> int:
    n = collected_count()
    stale = []
    for doc in DOCS:
        path = os.path.join(REPO, doc)
        with open(path) as f:
            lines = f.readlines()
        changed = False
        for i, ln in enumerate(lines):
            if MARKER not in ln:
                continue
            new = re.sub(r"\b\d+ pytest", f"{n} pytest", ln)
            if new != ln:
                lines[i] = new
                changed = True
        if changed:
            stale.append(doc)
            if not check_only:
                with open(path, "w") as f:
                    f.writelines(lines)
    if check_only and stale:
        print(f"OUT OF SYNC (collected {n}): {stale}")
        return 1
    print(f"collected {n} tests; {'stale: ' + str(stale) if stale else 'docs in sync'}")
    return 0


if __name__ == "__main__":
    sys.exit(sync("--check" in sys.argv))
