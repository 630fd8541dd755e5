from solana_snapshot_etl_tools_spark.functions.base58 import (  # noqa: F401
    b58decode,
    b58encode,
    base58_encode_col,
)
from solana_snapshot_etl_tools_spark.functions.binary import (  # noqa: F401
    le_u16,
    le_u32,
    le_u64,
    pubkey_at,
    u8_at,
)
