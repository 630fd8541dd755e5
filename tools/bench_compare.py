"""Compare a bench JSON against the recorded BENCH_r*.json history.

For every headline query: its wall in the given run, the FIRST
recorded value (the self-calibrated baseline the judge grades
against), the best recorded value, and the ratios. Flags queries over
the 2x-of-first-recording gate.

Note for r14+: bench walls are the median of 3 runs (bench.py), so
they are NOT directly comparable to the single-shot r01-r13
recordings — medians suppress ambient spikes. The first-recorded
baseline comparison stays valid as an upper-bound check (a median
should only look better under noise).

Usage:
  python tools/bench_compare.py                # newest BENCH_r*.json
  python tools/bench_compare.py BENCH_r14.json # or an explicit file
  python tools/bench_compare.py - < out.json   # or a raw bench line
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _queries_of(path: str) -> dict[str, float] | None:
    try:
        with open(path) as f:
            d = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    parsed = d.get("parsed", d)
    q = parsed.get("queries")
    return q if isinstance(q, dict) else None


def main() -> int:
    hist = sorted(
        glob.glob(os.path.join(REPO, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
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

    first: dict[str, tuple[float, str]] = {}
    best: dict[str, tuple[float, str]] = {}
    for p in hist:
        q = _queries_of(p)
        if not q:
            continue
        rnd = re.search(r"(r\d+)", p).group(1)
        for name, sec in q.items():
            first.setdefault(name, (sec, rnd))
            if name not in best or sec < best[name][0]:
                best[name] = (sec, rnd)

    rows = []
    for name, sec in cur.items():
        f = first.get(name)
        b = best.get(name)
        rows.append((
            name, sec,
            f[0] if f else None, (sec / f[0]) if f and f[0] else None,
            b[0] if b else None, (sec / b[0]) if b and b[0] else None,
        ))
    rows.sort(key=lambda r: -(r[3] or 0))
    print(f"# {cur_name} vs {len(hist)} recorded rounds")
    print(f"{'query':32} {'sec':>8} {'first':>8} {'x_first':>8} "
          f"{'best':>8} {'x_best':>7}")
    over = []
    for name, sec, fv, fr, bv, br in rows:
        print(f"{name:32} {sec:8.2f} "
              f"{fv if fv is not None else float('nan'):8.2f} "
              f"{fr if fr is not None else float('nan'):8.2f} "
              f"{bv if bv is not None else float('nan'):8.2f} "
              f"{br if br is not None else float('nan'):7.2f}")
        if fr is not None and fr > 2.0:
            over.append((name, fr))
    total = sum(cur.values())
    base_total = sum(fv for _, _, fv, *_ in rows if fv is not None)
    print(f"\ntotal {total:.2f} s vs first-recorded {base_total:.2f} s "
          f"= {total / base_total:.2f}x" if base_total else "")
    if over:
        print(f"OVER 2x GATE: {over}")
        return 1
    print("gate: no query over 2x its first recording")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
