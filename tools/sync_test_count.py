"""One pytest-count source of truth (VERDICT r07 #8: SURVEY said 575
in one place and 574 in another while README said 460+). This tool
collects the suite (no execution), and rewrites every marked count
line in SURVEY.md / README.md to the same number. Run it before the
round-end commit:

    python tools/sync_test_count.py            # update the docs
    python tools/sync_test_count.py --check    # fail if out of sync

Docs opt in with the literal marker ``<!-- test-count -->`` on the
line; the line must contain the canonical phrase ``NNN pytest``
(exactly that word order — a marked line WITHOUT it is a loud error,
never silent drift). Counts come from ``pytest --collect-only -q``
(parametrized cases counted individually — the same number a full run
reports as "N passed"); a collection that errors or is partial fails
the tool instead of syncing a wrong number.
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
    # pytest prints a PARTIAL count plus "N errors" when collection
    # breaks (verified: a broken import yields rc=2 and '1 test
    # collected, 1 error') — never sync that into the docs.
    if out.returncode != 0 or not m or re.search(
        r"\d+ errors?\b", out.stdout
    ):
        raise SystemExit(
            f"collection failed or was partial (rc={out.returncode}):\n"
            f"{out.stdout[-800:]}"
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
            if not re.search(r"\b\d+ pytest", ln):
                raise SystemExit(
                    f"{doc}:{i + 1} carries the {MARKER} marker but no "
                    "'NNN pytest' phrase — the sync would silently "
                    "skip it; use the canonical phrasing"
                )
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
