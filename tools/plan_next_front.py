"""Print the NEXT round's `__spark_entry__._FRONT` list.

With 100 declared queries and a 50-query driver cap, the two-round
rotation has zero slack: next round's prefix must be EXACTLY the 50
queries past the current cap (the ones whose newest row will be two
rounds old, plus the new-pending queries awaiting a first row). This
tool derives that list from the current registration order so the
round-opening swap is a paste, not a judgment call.

Run at the START of a round, BEFORE touching __spark_entry__:
    python tools/plan_next_front.py
Paste the output list as the new _FRONT (annotate as desired), then
run tools/check_rotation.py to confirm the invariant.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

DRIVER_CAP = 50


def main() -> int:
    import __spark_entry__ as entry

    declared = list(entry.queries())
    nxt = declared[DRIVER_CAP:]
    print(f"# next-round _FRONT — {len(nxt)} names (cap {DRIVER_CAP});")
    print("# current prefix rotates past the cap on their fresh rows")
    if len(nxt) != DRIVER_CAP:
        print(
            f"# WARNING: {len(nxt)} != {DRIVER_CAP} — the rotation has "
            f"{'slack' if len(nxt) < DRIVER_CAP else 'an OVERFLOW'}; "
            "re-derive the budget before pasting"
        )
    print("_FRONT = [")
    for name in nxt:
        print(f'    "{name}",')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
