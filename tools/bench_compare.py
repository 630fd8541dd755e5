"""Compare a bench JSON against the recorded bench baseline + history.

The regression GATE compares per-query walls against the median-of-3
floor in BASELINE_BENCH.json (recorded from BENCH_r14.json, the first
round benched with bench.py's median-of-3 methodology). A query over
2x its floor fails the gate (exit 1). r01–r13 recordings are
single-shot walls taken under varying ambient load — methodologically
NOT comparable to medians — so they are shown as context columns
(first/best recorded) but no longer gate.

A query absent from the floor (newly added headline) gates against its
FIRST recorded value instead, and the floor should be extended at the
next re-base.

Usage:
  python tools/bench_compare.py                # newest BENCH_r*.json
  python tools/bench_compare.py BENCH_r15.json # or an explicit file
  python tools/bench_compare.py - < out.json   # or a raw bench line
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOOR_PATH = os.path.join(REPO, "BASELINE_BENCH.json")
GATE = 2.0


def _queries_of(path: str) -> dict[str, float] | None:
    try:
        with open(path) as f:
            d = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    parsed = d.get("parsed", d)
    q = parsed.get("queries")
    return q if isinstance(q, dict) else None


def _round_of(path: str) -> int:
    # Anchored on the basename: an ancestor dir containing 'r<digit>'
    # (e.g. /home/user2/...) must not capture.
    m = re.search(r"^BENCH_r(\d+)\.json$", os.path.basename(path))
    return int(m.group(1)) if m else -1


def _load_floor() -> dict[str, float]:
    try:
        with open(FLOOR_PATH) as f:
            d = json.load(f)
        q = d.get("queries")
        return q if isinstance(q, dict) else {}
    except (OSError, json.JSONDecodeError):
        return {}


def main() -> int:
    hist = [
        p for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if _round_of(p) >= 0
    ]
    hist.sort(key=_round_of)
    arg = sys.argv[1] if len(sys.argv) > 1 else None
    if arg == "-":
        cur = json.load(sys.stdin).get("queries")
        cur_name = "<stdin>"
    elif arg:
        cur = _queries_of(arg)
        cur_name = arg
    else:
        cur = _queries_of(hist[-1]) if hist else None
        cur_name = hist[-1] if hist else "<none>"
    if not cur:
        print("no usable bench data", file=sys.stderr)
        return 2

    floor = _load_floor()
    first: dict[str, tuple[float, str]] = {}
    best: dict[str, tuple[float, str]] = {}
    for p in hist:
        q = _queries_of(p)
        if not q:
            continue
        rnd = f"r{_round_of(p)}"
        for name, sec in q.items():
            first.setdefault(name, (sec, rnd))
            if name not in best or sec < best[name][0]:
                best[name] = (sec, rnd)

    rows = []
    for name, sec in cur.items():
        fl = floor.get(name)
        gate_base = fl if fl is not None else (
            first[name][0] if name in first else None
        )
        f = first.get(name)
        b = best.get(name)
        rows.append((
            name, sec,
            fl, (sec / gate_base) if gate_base else None,
            f[0] if f else None,
            b[0] if b else None,
        ))
    rows.sort(key=lambda r: -(r[3] or 0))
    print(f"# {cur_name} vs median floor (BASELINE_BENCH.json) "
          f"+ {len(hist)} recorded rounds")
    print(f"{'query':32} {'sec':>8} {'floor':>8} {'x_floor':>8} "
          f"{'first':>8} {'best':>7}")
    over = []
    for name, sec, fl, xg, fv, bv in rows:
        print(f"{name:32} {sec:8.2f} "
              f"{fl if fl is not None else float('nan'):8.2f} "
              f"{xg if xg is not None else float('nan'):8.2f} "
              f"{fv if fv is not None else float('nan'):8.2f} "
              f"{bv if bv is not None else float('nan'):7.2f}")
        if xg is not None and xg > GATE:
            over.append((name, round(xg, 2)))
    total = sum(cur.values())
    floor_total = sum(
        fl for _, _, fl, *_ in rows if fl is not None
    )
    if floor_total:
        print(f"\ntotal {total:.2f} s vs median floor {floor_total:.2f} s "
              f"= {total / floor_total:.2f}x")
    if over:
        print(f"OVER {GATE}x GATE (vs median floor): {over}")
        return 1
    print(f"gate: no query over {GATE}x its median-of-3 floor")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
