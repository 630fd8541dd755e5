"""Fixed StructType schemas + program-id constants (SURVEY.md §1.3).

The reference compiles all schemas in as Rust structs (no inference);
we mirror that with static StructTypes. Pubkeys/hashes/signatures are
BinaryType canonically; base58 strings only at presentation edges.
u64 fields are LongType with wraparound (see functions/binary.py).
"""

from __future__ import annotations

from pyspark.sql import types as T

from solana_snapshot_etl_tools_spark.functions.base58 import b58decode

# --- well-known program ids (32-byte) -------------------------------------
# reference: sqlite.rs:208,211 (token/metaplex routing), programs.rs:33-50
# (loader dispatch), selectors.rs:48-55 (system program for deletion events)
TOKEN_PROGRAM_ID = b58decode("TokenkegQfeZyiNwAJbNbGKPFXCWuBvf9Ss623VQ5DA")
MPL_METADATA_PROGRAM_ID = b58decode("metaqbxxUerdq28cj1RbAWkYQm3ybzjb6a8bt518x1s")
BPF_LOADER_DEPRECATED_ID = b58decode("BPFLoader1111111111111111111111111111111111")
BPF_LOADER_ID = b58decode("BPFLoader2111111111111111111111111111111111")
BPF_LOADER_UPGRADEABLE_ID = b58decode("BPFLoaderUpgradeab1e11111111111111111111111")
SYSTEM_PROGRAM_ID = b58decode("11111111111111111111111111111111")

# SPL token account layout sizes (reference sqlite.rs:236-259, F11)
SPL_ACCOUNT_LEN = 165
SPL_MINT_LEN = 82
SPL_MULTISIG_LEN = 355
MAX_MULTISIG_SIGNERS = 11

# Metaplex MetadataV1 discriminator (reference mpl_metadata.rs:6-18, F10)
METADATA_V1_KEY = 4

# UpgradeableLoaderState::ProgramData bincode enum tag; ELF starts at
# byte 45 (reference programs.rs:40-47, T5)
PROGRAMDATA_TAG = 3
PROGRAMDATA_ELF_OFFSET = 45


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# --- raw snapshot account record (FIXTURES.md §1; append_vec.rs:54-107) ----
RAW_ACCOUNTS_SCHEMA = T.StructType(
    [
        _f("pubkey", T.BinaryType(), False),
        _f("write_version", T.LongType(), False),
        _f("slot", T.LongType(), False),
        _f("append_vec_id", T.LongType(), False),
        _f("owner", T.BinaryType(), False),
        _f("lamports", T.LongType(), False),
        _f("executable", T.BooleanType(), False),
        _f("rent_epoch", T.LongType(), False),
        _f("hash", T.BinaryType()),
        _f("data", T.BinaryType()),
        _f("data_len", T.LongType(), False),
    ]
)

# --- derived tables (reference sqlite.rs:96-163 DDL) -----------------------
ACCOUNT_SCHEMA = T.StructType(
    [
        _f("pubkey", T.BinaryType(), False),
        _f("data_len", T.LongType()),
        _f("owner", T.BinaryType()),
        _f("lamports", T.LongType()),
        _f("executable", T.BooleanType()),
        _f("rent_epoch", T.LongType()),
    ]
)

TOKEN_ACCOUNT_SCHEMA = T.StructType(
    [
        _f("pubkey", T.BinaryType(), False),
        _f("mint", T.BinaryType()),
        _f("owner", T.BinaryType()),
        _f("amount", T.LongType()),
        _f("delegate", T.BinaryType()),
        _f("state", T.IntegerType()),
        _f("is_native", T.LongType()),
        _f("delegated_amount", T.LongType()),
        _f("close_authority", T.BinaryType()),
    ]
)

TOKEN_MINT_SCHEMA = T.StructType(
    [
        _f("pubkey", T.BinaryType(), False),
        _f("mint_authority", T.BinaryType()),
        _f("supply", T.LongType()),
        _f("decimals", T.IntegerType()),
        _f("is_initialized", T.BooleanType()),
        _f("freeze_authority", T.BinaryType()),
    ]
)

TOKEN_MULTISIG_SCHEMA = T.StructType(
    [
        _f("pubkey", T.BinaryType(), False),
        _f("signer", T.BinaryType(), False),
        _f("m", T.IntegerType()),
        _f("n", T.IntegerType()),
    ]
)

TOKEN_METADATA_SCHEMA = T.StructType(
    [
        _f("pubkey", T.BinaryType(), False),
        _f("mint", T.BinaryType()),
        _f("name", T.StringType()),
        _f("symbol", T.StringType()),
        _f("uri", T.StringType()),
        _f("seller_fee_basis_points", T.IntegerType()),
        _f("primary_sale_happened", T.BooleanType()),
        _f("is_mutable", T.BooleanType()),
        _f("edition_nonce", T.IntegerType()),
        _f("collection_verified", T.BooleanType()),
        _f("collection_key", T.BinaryType()),
    ]
)

# decode-UDF output (token_metadata minus pubkey, which rides along)
METADATA_DECODE_SCHEMA = T.StructType(TOKEN_METADATA_SCHEMA.fields[1:])

# --- streaming fixtures (FIXTURES.md §3-5; serializer/src/geyser.rs) -------
ACCOUNT_UPDATES_SCHEMA = T.StructType(
    [
        _f("key", T.BinaryType(), False),
        _f("lamports", T.LongType(), False),
        _f("owner", T.BinaryType(), False),
        _f("executable", T.BooleanType(), False),
        _f("rent_epoch", T.LongType(), False),
        _f("data", T.BinaryType()),
        _f("write_version", T.LongType(), False),
        _f("slot", T.LongType(), False),
        _f("is_startup", T.BooleanType(), False),
    ]
)

SLOT_STATUS_SCHEMA = T.StructType(
    [
        _f("slot", T.LongType(), False),
        _f("parent", T.LongType()),
        _f("status", T.StringType(), False),
    ]
)

BLOCK_METADATA_SCHEMA = T.StructType(
    [
        _f("slot", T.LongType(), False),
        _f("blockhash", T.StringType()),
        _f("rewards", T.StringType()),
        _f("block_time", T.LongType()),
        _f("block_height", T.LongType()),
    ]
)

# --- transactions (FIXTURES.md §4; serializer fbs transaction_info.fbs) ----
TRANSACTIONS_SCHEMA = T.StructType(
    [
        _f("signature", T.BinaryType(), False),
        _f("is_vote", T.BooleanType(), False),
        _f("slot", T.LongType(), False),
        _f("status_ok", T.BooleanType(), False),
        _f("message_version", T.StringType()),
        _f(
            "header",
            T.StructType(
                [
                    _f("num_required_signatures", T.IntegerType()),
                    _f("num_readonly_signed_accounts", T.IntegerType()),
                    _f("num_readonly_unsigned_accounts", T.IntegerType()),
                ]
            ),
        ),
        _f("account_keys", T.ArrayType(T.BinaryType())),
        _f("recent_blockhash", T.BinaryType()),
        _f(
            "instructions",
            T.ArrayType(
                T.StructType(
                    [
                        _f("program_id_index", T.IntegerType()),
                        _f("accounts", T.ArrayType(T.IntegerType())),
                        _f("data", T.BinaryType()),
                    ]
                )
            ),
        ),
        _f(
            "address_table_lookups",
            T.ArrayType(
                T.StructType(
                    [
                        _f("account_key", T.BinaryType()),
                        _f("writable_indexes", T.ArrayType(T.IntegerType())),
                        _f("readonly_indexes", T.ArrayType(T.IntegerType())),
                    ]
                )
            ),
        ),
        _f("loaded_writable", T.ArrayType(T.BinaryType())),
        _f("loaded_readonly", T.ArrayType(T.BinaryType())),
        _f("message_hash", T.BinaryType()),
        _f("signatures", T.ArrayType(T.BinaryType())),
        _f("fee", T.LongType()),
        _f("pre_balances", T.ArrayType(T.LongType())),
        _f("post_balances", T.ArrayType(T.LongType())),
        _f(
            "inner_instructions",
            T.ArrayType(
                T.StructType(
                    [
                        _f("index", T.IntegerType()),
                        _f(
                            "instructions",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        _f("program_id_index", T.IntegerType()),
                                        _f("accounts", T.ArrayType(T.IntegerType())),
                                        _f("data", T.BinaryType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
        _f("log_messages", T.ArrayType(T.StringType())),
        _f(
            "pre_token_balances",
            T.ArrayType(
                T.StructType(
                    [
                        _f("account_index", T.IntegerType()),
                        _f("mint", T.StringType()),
                        _f(
                            "ui_token_amount",
                            T.StructType(
                                [
                                    _f("ui_amount", T.DoubleType()),
                                    _f("decimals", T.IntegerType()),
                                    _f("amount", T.StringType()),
                                    _f("ui_amount_string", T.StringType()),
                                ]
                            ),
                        ),
                        _f("owner", T.StringType()),
                        _f("program_id", T.StringType()),
                    ]
                )
            ),
        ),
        _f(
            "post_token_balances",
            T.ArrayType(
                T.StructType(
                    [
                        _f("account_index", T.IntegerType()),
                        _f("mint", T.StringType()),
                        _f(
                            "ui_token_amount",
                            T.StructType(
                                [
                                    _f("ui_amount", T.DoubleType()),
                                    _f("decimals", T.IntegerType()),
                                    _f("amount", T.StringType()),
                                    _f("ui_amount_string", T.StringType()),
                                ]
                            ),
                        ),
                        _f("owner", T.StringType()),
                        _f("program_id", T.StringType()),
                    ]
                )
            ),
        ),
        _f(
            "rewards",
            T.ArrayType(
                T.StructType(
                    [
                        _f("pubkey", T.StringType()),
                        _f("lamports", T.LongType()),
                        _f("post_balance", T.LongType()),
                        _f("reward_type", T.StringType()),
                        _f("commission", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)

# --- opcode stats (reference bin/solana-opcode-stats/main.rs) --------------
PROGRAM_ELFS_SCHEMA = T.StructType(
    [
        _f("program_id", T.BinaryType(), False),
        _f("elf", T.BinaryType()),
    ]
)

OPCODE_STATS_SCHEMA = T.StructType(
    [
        _f("opcode", T.StringType(), False),
        _f("mnemonic", T.StringType()),
        _f("num_programs", T.LongType()),
        _f("num_insns", T.LongType()),
    ]
)


# ship this module's functions by value inside serialized UDF tasks
# (workers do not share the driver's sys.path — see _pickle.py)
from solana_snapshot_etl_tools_spark._pickle import register_self as _rs  # noqa: E402

_rs(__name__)
