"""Audit driver-gate coverage across rounds (window-rotation blind spots).

The external correctness gate checks only the first 50 entries of
``queries()`` per round (registry._WINDOW), so rotation can leave an
oracled query that has NEVER been driver-verified. This tool unions every
``CORRECTNESS_r*.json`` in the repo root and reports, for each oracled
registry query:

- the rounds in which it held a gate row and whether that row was green
  (rows+schema+hash all true, err null);
- FAILS (exit 1) if any oracled query has never been green in any round,
  unless it appears in the current round-window (``--pending-ok`` treats
  in-window-but-not-yet-run queries as pending rather than missing).

Rows-only queries (no oracle) are listed informationally — their gate
evidence is weaker by design and pytest carries them.

Usage: python tools/gate_history.py [--pending-ok]
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, ".")

from pipeline_kinesis_spark.registry import (
    _PENDING_NEXT_WINDOW,
    _PRIORITY,
    all_queries,
)


def load_history() -> dict[str, dict[int, bool]]:
    """{query: {round: green?}} from every CORRECTNESS_r*.json."""
    hist: dict[str, dict[int, bool]] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path)
        rnd = int(m.group(1)) if m else -1
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                # rows-only rounds recorded hash_match: null — count the
                # row as green only on the full triple so weaker evidence
                # never masks a missing oracle check.
                and row.get("hash_match")
                and row.get("err") is None
            )
            hist.setdefault(name, {})[rnd] = green
    return hist


def main() -> int:
    pending_ok = "--pending-ok" in sys.argv[1:]
    hist = load_history()
    specs = all_queries()
    in_window = set(_PRIORITY)

    never_green: list[str] = []
    print(f"{'query':40s} {'oracle':6s} {'window':6s} green-rounds")
    for name, spec in sorted(specs.items()):
        rounds = hist.get(name, {})
        greens = sorted(r for r, g in rounds.items() if g)
        tag = ",".join(f"r{r:02d}" for r in greens) or "-"
        oracled = spec.oracle is not None
        print(
            f"{name:40s} {'yes' if oracled else 'no':6s} "
            f"{'yes' if name in in_window else 'no':6s} {tag}"
        )
        if oracled and not greens:
            if pending_ok and name in in_window:
                continue  # scheduled for the current round's gate
            if pending_ok and name in _PENDING_NEXT_WINDOW:
                # born after this round's window froze; the registry
                # pledges it a slot in the NEXT rotation. The pledge
                # EXPIRES (ADVICE r13 #3): if correctness history
                # already holds a round newer than pledge_round + 1
                # and the row is still pledged-never-green, the
                # rotation that was supposed to window it has come and
                # gone — fail instead of exempting it forever.
                pledge_round = _PENDING_NEXT_WINDOW[name]
                latest = max(
                    (r for rs in hist.values() for r in rs), default=0
                )
                if latest <= pledge_round + 1:
                    continue
                print(
                    f"STALE PLEDGE: {name} pledged in r{pledge_round} "
                    f"but history reaches r{latest} with no green"
                )
            never_green.append(name)

    if never_green:
        print(
            f"\nFAIL: {len(never_green)} oracled queries never driver-green: "
            f"{never_green}"
        )
        return 1
    print("\nok: every oracled registry query has held a driver-green row"
          + (" (or is pending in the current window)" if pending_ok else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
