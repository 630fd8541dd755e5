"""Rotation-staleness gate: no declared query's driver evidence may be
older than two rounds.

The verification driver checks only the first 50 registered queries per
round, so the builder rotates `__spark_entry__._FRONT`. This check
asserts the invariant that rotation is supposed to maintain: every
declared query is either (a) in the current registration's first-50
prefix (it WILL get a row this round) or (b) has a non-error row in the
most recent CORRECTNESS_r*.json (it got one last round). A query
failing both has evidence ≥2 rounds old — exactly the silent staleness
that bit media_* in round 4 (its code changed after its last green row
and nobody noticed until the judge did).

Also fails if any query in the upcoming prefix is missing an oracle
while not being a documented rows-only query, and if the most recent
round's rows contain errors other than the expected `no_oracle`.

Run as part of the end-of-round full sweep:
    python tools/check_rotation.py
Exit code 0 = invariant holds.
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, ".")

DRIVER_CAP = 50

# rows-only by design: engine-specific sketches/assignments with recall
# pytests instead of a DuckDB oracle (SURVEY.md §2; VERDICT r04)
ROWS_ONLY = {
    "dedup_simhash",
    "ann_cosine_lsh",
    "ann_cosine_ivf",
    "ann_cosine_pq",
    "ann_cosine_ivf_pq",
}

# Queries declared THIS round past the 50-slot cap: no driver row can
# exist yet (pytest + tools/driver_sim evidence only). Each one must be
# in the NEXT round's front-load (TODO.md slot budget) and must leave
# this set the moment it has a green row — the gate flags a stale entry.
NEW_PENDING_FIRST_ROW: set[str] = set()  # ceiling reached; r06 landed all first rows


def main() -> int:
    import __spark_entry__ as entry

    declared = list(entry.queries())
    oracles = entry.oracle_sql()
    prefix = set(declared[:DRIVER_CAP])

    rounds = sorted(
        glob.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    if not rounds:
        print("no CORRECTNESS_r*.json found — nothing to check against")
        return 1
    latest = rounds[-1]
    rows = json.load(open(latest))
    green = {
        name
        for name, rec in rows.items()
        if rec.get("hash_match") or (rec.get("err") == "no_oracle" and name in ROWS_ONLY)
    }

    failures: list[str] = []
    for name in NEW_PENDING_FIRST_ROW & green:
        failures.append(
            f"{name}: has a green row in {latest} but is still listed in "
            "NEW_PENDING_FIRST_ROW — remove it from the pending set"
        )
    for name in declared:
        if name in NEW_PENDING_FIRST_ROW and name not in prefix:
            if name not in green:
                print(
                    f"pending: {name} — new this round, past the cap; "
                    "MUST be in next round's front-load"
                )
            continue
        if name not in prefix and name not in green:
            failures.append(
                f"{name}: not in the upcoming first-{DRIVER_CAP} prefix and "
                f"no green row in {latest} — evidence would be ≥2 rounds old"
            )
    for name in declared:
        if name not in oracles and name not in ROWS_ONLY:
            failures.append(
                f"{name}: no oracle_sql entry and not a documented "
                "rows-only query"
            )
    # bench.py silently filters HEADLINE to declared names — a typo or
    # a renamed query would vanish from BENCH_r{N} without any error
    import bench

    for name in bench.HEADLINE:
        if name not in declared:
            failures.append(
                f"bench HEADLINE contains undeclared query {name!r} — "
                "it would silently drop from the bench output"
            )
    for name, rec in rows.items():
        err = rec.get("err")
        if err and not (err == "no_oracle" and name in ROWS_ONLY):
            if name in prefix:  # being refreshed this round — warn only
                print(
                    f"warning: {name} had an error in {latest} and is in "
                    "the upcoming prefix — confirm it goes green"
                )
            else:
                failures.append(
                    f"{name}: {latest} records an error and the query is "
                    f"NOT in the upcoming prefix: {err[:120]}"
                )

    if failures:
        print(f"ROTATION CHECK FAILED ({len(failures)}):")
        for f in failures:
            print(" -", f)
        return 1
    print(
        f"rotation OK: {len(declared)} declared, {len(prefix)} in upcoming "
        f"prefix, {len(green)} green in {latest}; union covers everything"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
