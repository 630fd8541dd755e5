"""Deterministic acceptance-sampling hash, shared by operators.

Same spelling as ``plans/llm_ops.py:_knuth_h`` (kept there verbatim so
the declared split/sample queries' oracle SQL and implementing
functions stay git-stable); new operator-layer users import from here
to avoid an operators -> plans dependency cycle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

KNUTH = 2654435761
_2_32 = 1 << 32


def knuth_hash32(col: Column) -> Column:
    """``(id * 2654435761) mod 2^32`` without int64 overflow at ANY
    id: reduce mod 2^32 first (a no-op for the product mod 2^32),
    then split 16/16 so every intermediate stays <= ~1.7e14. Identical
    to the naive spelling wherever that spelling doesn't overflow;
    ids are assumed non-negative (table keys)."""
    a = F.pmod(col, F.lit(_2_32))
    lo = a.bitwiseAND(F.lit(0xFFFF))
    hi = F.shiftrightunsigned(a, 16)
    return F.pmod(
        lo * F.lit(KNUTH) + F.pmod(hi * F.lit(KNUTH), F.lit(1 << 16)) * F.lit(1 << 16),
        F.lit(_2_32),
    )
