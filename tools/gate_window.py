"""Print the driver gate window this round WILL record, and the slot
math the next round inherits — the planning aid behind the
stalest-green-first rotation policy (``__spark_entry__``).

Usage:
    python tools/gate_window.py            # current round's window
    python tools/gate_window.py --next N   # simulate round N's window
                                           # after this round goes green
    python tools/gate_window.py --check    # exit 1 if any green LEFT OUT
                                           # of this round's window is
                                           # already >= 4 rounds stale
                                           # (it will re-gate at age 5+)

The 50-slot budget discipline (round-10 verdict #1): every declared
query must re-prove on the current environment within ~2 rounds, so a
round's NEW registrations + FORCE_REGATE entries must leave enough
slots for the stalest green tier to rotate fully. This tool shows the
exact composition so a session can see the budget BEFORE registering
a query (and decide to DEFER_GATE it instead).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def history(root: pathlib.Path):
    last_green: dict[str, int] = {}
    last_any: dict[str, int] = {}
    rounds: list[int] = []
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f.name).group(1))
        rounds.append(rnd)
        for name, row in json.loads(f.read_text()).items():
            last_any[name] = max(last_any.get(name, 0), rnd)
            green = isinstance(row, dict) and all(
                row.get(k) is True
                for k in ("rows_match", "schema_match", "hash_match")
            )
            if isinstance(row, dict) and row.get("hash_match") is None:
                green = row.get("rows_match") is True
            if green:
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green, last_any, rounds


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--next", type=int, default=None, metavar="N",
                    help="simulate round N's window assuming this "
                    "round's window goes fully green first")
    ap.add_argument("--check", action="store_true",
                    help="exit 1 when a green left out of the window "
                    "is already >= 4 rounds stale (rotation invariant)")
    args = ap.parse_args()

    import __spark_entry__ as m

    root = pathlib.Path(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    last_green, last_any, rounds = history(root)
    cur_round = (max(rounds) if rounds else 0) + 1

    order = m._gate_priority_order()
    window = order[:WINDOW]

    if args.next is not None:
        # pretend the current window went green in cur_round, deferred
        # entries expire, forces for rounds <= cur_round expire
        for n in window:
            last_green[n] = cur_round
        for n in list(m.DEFER_GATE):
            if m.DEFER_GATE[n] <= cur_round:
                pass  # expired: they become never-gated tier-0
        # recompute ordering with the updated greens
        names = list(m.QUERIES)

        def key(n):
            forced = last_green.get(n, -1) < m.FORCE_REGATE.get(n, -1)
            if forced or n not in last_green:
                return (0, names.index(n))
            return (1, last_green[n] * 10_000 + names.index(n))

        order = sorted(names, key=key)
        window = order[:WINDOW]
        cur_round = args.next

    never = [n for n in window if n not in last_green]
    forced = [
        n for n in window
        if n in last_green and last_green[n] < m.FORCE_REGATE.get(n, -1)
    ]
    greens = [n for n in window if n not in never and n not in forced]
    by_round: dict[int, int] = {}
    for n in greens:
        by_round[last_green[n]] = by_round.get(last_green[n], 0) + 1
    total = len(m.QUERIES)
    outside = order[WINDOW:]
    stalest_out = min(
        (last_green.get(n, 10**9) for n in outside), default=None
    )
    print(f"round r{cur_round} window ({WINDOW} of {total} declared):")
    print(f"  tier0 never-gated: {len(never)}  {sorted(never)[:6]}{'...' if len(never) > 6 else ''}")
    print(f"  tier0 force-regate: {len(forced)}  {sorted(forced)[:6]}{'...' if len(forced) > 6 else ''}")
    print(f"  rotating greens: {len(greens)} by last-green round {dict(sorted(by_round.items()))}")
    print(f"  deferred (DEFER_GATE active): {sorted(n for n in m.DEFER_GATE if n in outside)}")
    if stalest_out is not None and stalest_out < 10**9:
        print(f"  stalest green LEFT OUT of the window: r{stalest_out}")
    budget = WINDOW - len(never) - len(forced)
    print(f"  slots left for stale rotation: {budget}")
    overdue = sorted(
        n for n in outside
        if n in last_green and cur_round - last_green[n] >= 4
    )
    if overdue:
        print(
            f"  OVERDUE (left out at age >= 4; re-gates at 5+): "
            f"{[(n, f'r{last_green[n]}') for n in overdue]}"
        )
    if args.check and overdue:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
