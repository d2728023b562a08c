"""Print the next round's ``_VERIFIED_R{N}`` set literal from the
driver's CORRECTNESS file — the error-prone first step of every
round's rotation append, automated.

Usage: python tools/rotation_next.py <round>   (e.g. 8 reads
CORRECTNESS_r08.json and prints ``_VERIFIED_R08 = {...}`` ready to
paste into thundercats_spark/queries/__init__.py, plus the slack
arithmetic for the NEXT driver window.)

Rules encoded (see queries/__init__.py's rotation comment):
- only GREEN entries advance: hash_match is True, or a rows-only
  check (err == "no_oracle") that returned rows. Anything else is
  listed loudly and EXCLUDED — a red entry must be fixed and re-led,
  not advanced.
- entries whose plan you rewired AFTER the driver window ran must be
  manually removed from the printed set (tier reset), as
  part_affinity_lift was in r08.
"""

from __future__ import annotations

import json
import os
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    path = os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json")
    with open(path) as f:
        data = json.load(f)

    green, red = [], []
    for name, row in data.items():
        ok_hash = row.get("hash_match") is True
        ok_rows_only = (
            row.get("err") == "no_oracle"
            and (row.get("spark_rows") or 0) > 0
        )
        (green if (ok_hash or ok_rows_only) else red).append(name)

    if red:
        print(f"NOT advancing {len(red)} non-green entries "
              f"(fix these, do not append them):")
        for name in sorted(red):
            print(f"  {name}: {data[name]}")

    names = ", ".join(f'"{n}"' for n in green)
    body = textwrap.fill(
        names, width=72, initial_indent="    ", subsequent_indent="    "
    )
    print(f"# Names whose latest driver row is round {rnd} "
          f"(CORRECTNESS_r{rnd:02d}.json):")
    print(f"_VERIFIED_R{rnd:02d} = {{\n{body},\n}}")

    # slack arithmetic for the NEXT window
    sys.path.insert(0, REPO)
    from thundercats_spark.queries import _RETIRED, _ROUNDS, all_queries

    rounds = list(_ROUNDS) + [set(green)]

    def tier(n: str) -> float:
        if n in _RETIRED:
            return float("inf")  # exempt from the staleness window
        t = 0
        for i, s in enumerate(rounds, start=1):
            if n in s:
                t = i
        return t

    qs = sorted(all_queries(), key=tier)
    window = qs[:50]
    oldest_needed = [
        n for n in qs if 0 < tier(n) <= rnd - 2 and n not in _RETIRED
    ]
    stranded = [n for n in oldest_needed if n not in window]
    in_tier0 = sum(1 for n in window if tier(n) == 0)
    n_live = len(qs) - len(_RETIRED & set(qs))
    print(f"\n# after appending: registry {len(qs)} "
          f"({n_live} live + {len(_RETIRED & set(qs))} retired), "
          f"window 50 = {in_tier0} never-verified + "
          f"{50 - in_tier0} oldest-tier")
    print(f"# slack for NEW registrations before any tier<= "
          f"r{rnd - 2} entry falls out: "
          f"{50 - in_tier0 - len(oldest_needed)}")
    print(f"# live-registry capacity headroom (150 cap): "
          f"{150 - n_live}")
    if stranded:
        print(f"# WARNING: already stranded stale: {stranded}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
