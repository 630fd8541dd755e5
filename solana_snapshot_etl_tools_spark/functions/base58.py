"""Base58 (Bitcoin alphabet) — pure-Python, used at presentation edges.

The reference emits base58 pubkeys in its CSV sink and tar entry names
(reference csv.rs:50-51, programs.rs:56). Spark has no builtin, so this
is a (vectorized pandas) UDF confined to output projections — never in
a join/filter hot path (SURVEY.md §2.3 P2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import StringType

_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_INDEX = {c: i for i, c in enumerate(_ALPHABET)}


def b58encode(raw: bytes) -> str:
    if raw is None:
        return None
    n = int.from_bytes(raw, "big")
    out = []
    while n > 0:
        n, r = divmod(n, 58)
        out.append(_ALPHABET[r])
    pad = 0
    for b in raw:
        if b == 0:
            pad += 1
        else:
            break
    return "1" * pad + "".join(reversed(out))


def b58decode(s: str) -> bytes:
    n = 0
    for c in s:
        n = n * 58 + _INDEX[c]
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big")
    pad = 0
    for c in s:
        if c == "1":
            pad += 1
        else:
            break
    return b"\x00" * pad + raw


@F.pandas_udf(StringType())
def _b58encode_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: b58encode(bytes(v)) if v is not None else None)


def base58_encode_col(col: Column | str) -> Column:
    """Base58-encode a binary column (Arrow-batched)."""
    return _b58encode_udf(F.col(col) if isinstance(col, str) else col)


# ship this module's functions by value inside serialized UDF tasks
# (workers do not share the driver's sys.path — see _pickle.py)
from solana_snapshot_etl_tools_spark._pickle import register_self as _rs  # noqa: E402

_rs(__name__)
