"""S4: DeserializableVersionedBank skip-walk (bincode fixint).

Production Solana snapshot manifests serialize a full bank state
BEFORE the AccountsDbFields map; the reference decodes it into
``DeserializableVersionedBank`` and drops it (reference
solana.rs:63-97, deserialize options solana.rs:42-52). We only need
the BYTE WIDTH, so this module walks the layout and returns the
offset where AccountsDbFields begins. Layouts follow solana-runtime
1.11.3 (the version the reference pins, Cargo.toml:15):

  BlockhashQueue      { last_hash_index: u64, last_hash: Option<Hash>,
                        ages: Map<Hash, {fee: u64, hash_index: u64,
                        timestamp: u64}>, max_age: u64 }
  Ancestors           Map<u64, u64>
  HardForks           Vec<(u64, u64)>
  FeeRateGovernor     4×u64 + u8 burn_percent (lamports_per_signature
                      is #[serde(skip)] in solana-sdk 1.11.3, so it is
                      absent from the bincode stream)
  EpochSchedule       u64×2 + bool + u64×2  (33 bytes)
  Rent                u64 + f64 + u8        (17 bytes)
  RentCollector       u64 + EpochSchedule + f64 + Rent
  Inflation           6×f64
  Account             u64 + Vec<u8> + Pubkey + bool + u64
  VoteAccounts        Map<Pubkey, (u64, Account)>
  Delegation          Pubkey + 3×u64 + f64  (64 bytes)
  StakeHistory        Vec<(u64, 3×u64)>
  Stakes<Delegation>  VoteAccounts + Map<Pubkey, Delegation> + u64 +
                      u64 + StakeHistory
  UnusedAccounts      Set<Pubkey> ×2 + Map<Pubkey, u64>
  NodeVoteAccounts    Vec<Pubkey> + u64 (vote_accounts first, then
                      total_stake — solana-runtime 1.11.3 field order)
  EpochStakes         Stakes + u64 + Map<Pubkey, NodeVoteAccounts> +
                      Map<Pubkey, Pubkey>

All lengths are u64 little-endian (bincode fixint); Option is a one-
byte tag. The writer emits the same layout with small populated
collections for fixture archives.
"""

from __future__ import annotations

import struct


class BincodeReader:
    """Sequential fixint-bincode cursor. All skips are bounds-checked:
    running off the buffer raises ``ValueError`` (malformed manifest),
    never returns garbage offsets."""

    # collection-length sanity bound: a billion entries in any single
    # bank collection means we are misparsing, not reading a real bank
    MAX_LEN = 1 << 30

    def __init__(self, buf: bytes, off: int = 0):
        self.buf = buf
        self.off = off

    def take(self, n: int) -> bytes:
        if self.off + n > len(self.buf):
            raise ValueError(
                f"manifest truncated: need {n} bytes at {self.off}, "
                f"have {len(self.buf)}"
            )
        out = self.buf[self.off : self.off + n]
        self.off += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def length(self) -> int:
        n = self.u64()
        if n > self.MAX_LEN:
            raise ValueError(f"implausible collection length {n} at {self.off - 8}")
        return n

    def skip(self, n: int) -> None:
        self.take(n)

    def opt(self, width: int) -> None:
        tag = self.u8()
        if tag == 1:
            self.skip(width)
        elif tag != 0:
            raise ValueError(f"bad Option tag {tag} at {self.off - 1}")

    def repeated(self, entry_width: int) -> None:
        """Vec/Set/Map of fixed-width entries."""
        self.skip(self.length() * entry_width)


def _skip_account(r: BincodeReader) -> None:
    r.skip(8)  # lamports
    r.skip(r.length())  # data: Vec<u8>
    r.skip(32 + 1 + 8)  # owner, executable, rent_epoch


def _skip_vote_accounts(r: BincodeReader) -> None:
    for _ in range(r.length()):  # Map<Pubkey, (stake, Account)>
        r.skip(32 + 8)
        _skip_account(r)


def _skip_stakes(r: BincodeReader) -> None:
    _skip_vote_accounts(r)
    r.repeated(32 + 64)  # stake_delegations: Map<Pubkey, Delegation>
    r.skip(8 + 8)  # unused, epoch
    r.repeated(8 + 24)  # stake_history: Vec<(Epoch, 3×u64)>


def _skip_epoch_stakes(r: BincodeReader) -> None:
    _skip_stakes(r)
    r.skip(8)  # total_stake
    for _ in range(r.length()):  # node_id_to_vote_accounts
        r.skip(32)  # node Pubkey key
        r.repeated(32)  # vote_accounts: Vec<Pubkey> (serialized first)
        r.skip(8)  # total_stake (trails the vec)
    r.repeated(32 + 32)  # epoch_authorized_voters


_EPOCH_SCHEDULE = 8 + 8 + 1 + 8 + 8
_RENT = 8 + 8 + 1
# lamports_per_signature is #[serde(skip)]: only the four target/min/max
# u64s plus burn_percent cross the wire
_FEE_RATE_GOVERNOR = 4 * 8 + 1


def skip_versioned_bank(buf: bytes, off: int = 0) -> int:
    """Advance past DeserializableVersionedBank; returns the offset of
    AccountsDbFields (reference solana.rs:63-97 field order)."""
    r = BincodeReader(buf, off)
    # blockhash_queue
    r.skip(8)  # last_hash_index
    r.opt(32)  # last_hash
    r.repeated(32 + 24)  # ages: Map<Hash, HashAge>
    r.skip(8)  # max_age
    r.repeated(8 + 8)  # ancestors
    r.skip(32 + 32 + 8)  # hash, parent_hash, parent_slot
    r.repeated(8 + 8)  # hard_forks
    r.skip(5 * 8)  # transaction_count .. max_tick_height
    r.opt(8)  # hashes_per_tick
    r.skip(8)  # ticks_per_slot
    r.skip(16)  # ns_per_slot: u128
    r.skip(8 + 8)  # genesis_creation_time, slots_per_year
    r.skip(8)  # accounts_data_len
    r.skip(8 + 8 + 8)  # slot, epoch, block_height
    r.skip(32 + 8)  # collector_id, collector_fees
    r.skip(8)  # fee_calculator
    r.skip(_FEE_RATE_GOVERNOR)
    r.skip(8)  # collected_rent
    r.skip(8 + _EPOCH_SCHEDULE + 8 + _RENT)  # rent_collector
    r.skip(_EPOCH_SCHEDULE)
    r.skip(6 * 8)  # inflation
    _skip_stakes(r)
    # unused_accounts
    r.repeated(32)
    r.repeated(32)
    r.repeated(32 + 8)
    for _ in range(r.length()):  # epoch_stakes: Map<Epoch, EpochStakes>
        r.skip(8)
        _skip_epoch_stakes(r)
    r.skip(1)  # is_delta
    return r.off


# --- fixture writer -----------------------------------------------------------


def write_versioned_bank(
    slot: int = 1234,
    n_vote_accounts: int = 2,
    n_delegations: int = 3,
    n_epoch_stakes: int = 1,
) -> bytes:
    """A realistic (populated-collection) bank blob with the exact
    production layout, for bank-prefixed manifest fixtures."""
    u64 = lambda v: struct.pack("<Q", v)  # noqa: E731
    f64 = lambda v: struct.pack("<d", v)  # noqa: E731
    pk = lambda i: bytes([i % 251]) * 32  # noqa: E731

    def account(i: int) -> bytes:
        data = bytes([i % 7]) * (10 + i)
        return u64(100 + i) + u64(len(data)) + data + pk(i) + b"\x00" + u64(3)

    def stakes() -> bytes:
        out = u64(n_vote_accounts)
        for i in range(n_vote_accounts):
            out += pk(i) + u64(1000 + i) + account(i)
        out += u64(n_delegations)
        for i in range(n_delegations):
            # key + Delegation{voter, stake, activation, deactivation, rate}
            out += pk(40 + i) + pk(41 + i) + u64(7) + u64(8) + u64(9) + f64(0.25)
        out += u64(0) + u64(5)  # unused, epoch
        out += u64(2) + (u64(1) + u64(10) + u64(11) + u64(12)) * 2  # history
        return out

    out = b""
    # blockhash_queue: index, Some(hash), 2 ages, max_age
    out += u64(300) + b"\x01" + pk(9)
    out += u64(2) + (pk(1) + u64(5000) + u64(299) + u64(1)) + (
        pk(2) + u64(5000) + u64(300) + u64(2)
    )
    out += u64(150)
    out += u64(2) + (u64(slot - 1) + u64(1)) + (u64(slot - 2) + u64(2))  # ancestors
    out += pk(3) + pk(4) + u64(slot - 1)  # hash, parent_hash, parent_slot
    out += u64(1) + u64(100) + u64(3)  # hard_forks: one entry
    out += u64(10) + u64(20) + u64(30) + u64(10**15) + u64(40)
    out += b"\x01" + u64(12500)  # hashes_per_tick: Some
    out += u64(64)  # ticks_per_slot
    out += struct.pack("<QQ", 400_000_000, 0)  # ns_per_slot u128
    out += u64(1_600_000_000) + f64(78892314.984)
    out += u64(10**9)  # accounts_data_len
    out += u64(slot) + u64(slot // 432000) + u64(slot - 5)
    out += pk(5) + u64(42)  # collector
    out += u64(5000)  # fee_calculator
    out += u64(5000) * 4 + b"\x32"  # fee_rate_governor (4 u64 + burn_percent)
    out += u64(77)  # collected_rent
    out += (  # rent_collector
        u64(2)
        + (u64(432000) + u64(432000) + b"\x00" + u64(0) + u64(0))
        + f64(78892314.984)
        + (u64(3480) + f64(2.0) + b"\x32")
    )
    out += u64(432000) + u64(432000) + b"\x00" + u64(0) + u64(0)  # epoch_schedule
    out += f64(0.08) + f64(0.015) + f64(0.15) + f64(0.05) + f64(7.0) + f64(0.0)
    out += stakes()
    out += u64(1) + pk(6) + u64(1) + pk(7) + u64(1) + pk(8) + u64(99)  # unused
    out += u64(n_epoch_stakes)
    for e in range(n_epoch_stakes):
        out += u64(5 + e)
        out += stakes() + u64(10**12)
        # node map: key, then Vec<Pubkey> vote_accounts, then total_stake
        out += u64(1) + pk(20) + u64(2) + pk(21) + pk(22) + u64(500)
        out += u64(1) + pk(23) + pk(24)  # authorized voters
    out += b"\x01"  # is_delta
    return out
