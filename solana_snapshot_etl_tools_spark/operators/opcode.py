"""eBPF opcode statistics (reference solana-opcode-stats binary,
bin/solana-opcode-stats/main.rs:24-128).

Pipeline: (program_id, elf) → lenient ELF .text extraction + 8/16-byte
instruction walk (pandas UDF — real byte parsing, T7) → explode to
(program_id, opcode) rows → two aggregates (Σ instructions A1,
distinct programs A2; partial aggregation A3 is Spark-native) →
mnemonic lookup → ordered, zero-rows-omitted output (O1).

The disassembly itself is the only Python stage; it is Arrow-batched
and emits a compact int array per program, so the shuffle carries
(program_id, opcode) pairs — never ELF bytes.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, IntegerType

from solana_snapshot_etl_tools_spark.fixtures import EBPF_MNEMONICS

LDDW = 0x18  # 16-byte instruction (reference main.rs:97-101)


def extract_opcodes(elf: bytes) -> list[int] | None:
    """Lenient ELF64 parse → opcode list of the .text section.
    Returns None for anything malformed (reject_broken_elfs:false
    semantics, reference main.rs:86-89)."""
    try:
        if len(elf) < 64 or elf[:4] != b"\x7fELF" or elf[4] != 2 or elf[5] != 1:
            return None
        shoff, = struct.unpack_from("<Q", elf, 0x28)
        shentsize, shnum, shstrndx = struct.unpack_from("<HHH", elf, 0x3A)
        if shoff == 0 or shnum == 0 or shstrndx >= shnum:
            return None

        def sh(i):
            base = shoff + i * shentsize
            name_off, typ = struct.unpack_from("<II", elf, base)
            off, size = struct.unpack_from("<QQ", elf, base + 0x18)
            return name_off, typ, off, size

        _, _, str_off, str_size = sh(shstrndx)
        strtab = elf[str_off : str_off + str_size]

        def name(off):
            end = strtab.find(b"\x00", off)
            return strtab[off:end] if end != -1 else b""

        text = None
        for i in range(shnum):
            name_off, _typ, off, size = sh(i)
            if name(name_off) == b".text":
                text = elf[off : off + size]
                break
        if text is None:
            return None
        ops, i = [], 0
        while i + 8 <= len(text):
            op = text[i]
            ops.append(op)
            i += 16 if op == LDDW else 8
        return ops
    except (struct.error, IndexError, ValueError):
        return None


@F.pandas_udf(ArrayType(IntegerType()))
def _opcodes_udf(elf: pd.Series) -> pd.Series:
    return elf.map(lambda b: extract_opcodes(bytes(b)) if b is not None else None)


def opcode_stats(program_elfs: DataFrame) -> DataFrame:
    """The full histogram query: opcode hex, mnemonic, #programs
    containing it, #instructions; ascending opcode order, zero-count
    rows omitted (reference main.rs:109-128)."""
    ops = (
        program_elfs.select(
            "program_id", _opcodes_udf("elf").alias("ops")
        )
        .filter(F.col("ops").isNotNull())
        .select("program_id", F.explode("ops").alias("op"))
    )
    mnemonic_map = F.create_map(
        *[F.lit(x) for kv in EBPF_MNEMONICS.items() for x in kv]
    )
    return (
        ops.groupBy("op")
        .agg(
            F.countDistinct("program_id").alias("num_programs"),
            F.count(F.lit(1)).alias("num_insns"),
        )
        .filter(F.col("num_insns") > 0)
        .select(
            F.format_string("0x%02x", F.col("op")).alias("opcode"),
            F.coalesce(mnemonic_map[F.col("op")], F.lit("unknown")).alias("mnemonic"),
            "num_programs",
            "num_insns",
        )
        .orderBy("opcode")
    )


# ship this module's functions by value inside serialized UDF tasks
# (workers do not share the driver's sys.path — see _pickle.py)
from solana_snapshot_etl_tools_spark._pickle import register_self as _rs  # noqa: E402

_rs(__name__)
