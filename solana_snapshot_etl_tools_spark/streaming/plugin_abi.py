"""Native (dlopen) Geyser plugin loading — the C-ABI analog of the
reference's plugin loader.

The reference (geyser_plugin.rs:25-60) dlopens a Rust cdylib, resolves
``_create_plugin`` and receives ``*mut dyn GeyserPlugin`` — a Rust
trait object. That fat pointer's vtable layout is a private rustc
implementation detail; the reference itself documents the call as UB
"on mismatching rustc or Solana versions". There is therefore no
stable way to invoke a stock Rust Geyser plugin from a non-Rust host,
and this engine does NOT attempt it (the boundary is recorded in
COVERAGE.md). What IS implementable — and implemented here — is the
same loader contract over a *stable C ABI*: a shared object exporting
the same ``_create_plugin`` symbol that returns a vtable struct of
plain C function pointers mirroring the GeyserPlugin hooks the
snapshot replay actually drives (on_load → update_account* →
notify_end_of_startup → on_unload; geyser.rs usage). A plugin author
compiles against the header below (any language with a C FFI: C, C++,
Rust ``extern "C"``, Zig) and the .so runs inside Spark executors
with no Python shim.

Lifecycle mapping for a distributed replay: the reference is a
single-process loop, so "one plugin instance, one end-of-startup"
is well-defined there. Executor-side, each PARTITION is treated as a
replay shard: the full lifecycle (create → on_load → updates →
notify_end_of_startup → on_unload) runs once per partition, so a
buffering plugin gets a flush point per shard regardless of which
worker process the shard landed on.
"""

from __future__ import annotations

import ctypes

# The C header a plugin author compiles against. Kept as a string so
# tests (and `python -m ... --emit-plugin-header`) can materialize it;
# field order below MUST match _PluginVTable.
PLUGIN_HEADER = """\
/* spark_geyser_plugin.h — stable C ABI for snapshot-replay plugins.
 * Export: SparkGeyserPluginV1 *_create_plugin(void);
 * All hooks return 0 on success, nonzero to abort the replay shard.
 */
#include <stdint.h>

typedef struct SparkGeyserPluginV1 {
    uint32_t abi_version; /* must be 1 */
    const char *(*name)(void);
    int32_t (*on_load)(const char *config_file);
    void (*on_unload)(void);
    int32_t (*update_account)(
        const uint8_t *pubkey,      /* 32 bytes */
        const uint8_t *owner,       /* 32 bytes */
        uint64_t lamports,
        uint8_t executable,         /* 0/1 */
        uint64_t rent_epoch,
        const uint8_t *data,
        uint64_t data_len,
        uint64_t write_version,
        uint64_t slot);
    int32_t (*notify_end_of_startup)(void);
} SparkGeyserPluginV1;

SparkGeyserPluginV1 *_create_plugin(void);
"""

_U64_MASK = (1 << 64) - 1


class _PluginVTable(ctypes.Structure):
    _fields_ = [
        ("abi_version", ctypes.c_uint32),
        ("name", ctypes.CFUNCTYPE(ctypes.c_char_p)),
        ("on_load", ctypes.CFUNCTYPE(ctypes.c_int32, ctypes.c_char_p)),
        ("on_unload", ctypes.CFUNCTYPE(None)),
        (
            "update_account",
            ctypes.CFUNCTYPE(
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),  # pubkey
                ctypes.POINTER(ctypes.c_uint8),  # owner
                ctypes.c_uint64,  # lamports
                ctypes.c_uint8,  # executable
                ctypes.c_uint64,  # rent_epoch
                ctypes.POINTER(ctypes.c_uint8),  # data
                ctypes.c_uint64,  # data_len
                ctypes.c_uint64,  # write_version
                ctypes.c_uint64,  # slot
            ),
        ),
        ("notify_end_of_startup", ctypes.CFUNCTYPE(ctypes.c_int32)),
    ]


def _buf(b: bytes | None):
    if not b:
        b = b""
    return (ctypes.c_uint8 * len(b)).from_buffer_copy(b) if b else None


def _key_buf(b: bytes, what: str):
    """pubkey/owner cross the FFI as fixed 32-byte buffers
    (PLUGIN_HEADER). A malformed row must fail as a catchable Python
    error HERE — passing NULL (or a short buffer) to a conforming
    plugin that reads 32 bytes segfaults the whole executor process.
    Only the data pointer may be NULL, and only when data_len == 0."""
    if len(b) != 32:
        raise ValueError(
            f"plugin update_account: {what} must be exactly 32 bytes, "
            f"got {len(b)}"
        )
    return (ctypes.c_uint8 * 32).from_buffer_copy(b)


class NativeGeyserPlugin:
    """One loaded plugin instance: dlopen + ``_create_plugin`` +
    ``on_load``. ``close()`` (or context-manager exit) runs
    ``notify_end_of_startup`` + ``on_unload``."""

    def __init__(self, libpath: str, config_file: str | None = None):
        try:
            # dlopen resolves both filesystem paths and sonames on the
            # loader search path; let it do the lookup
            self._lib = ctypes.CDLL(libpath)  # process-wide; refcounted
        except OSError as e:
            raise FileNotFoundError(
                f"plugin library not loadable: {libpath} ({e})"
            ) from e
        try:
            ctor = self._lib._create_plugin
        except AttributeError as e:
            raise RuntimeError(
                f"{libpath} does not export _create_plugin "
                "(see PLUGIN_HEADER for the required ABI)"
            ) from e
        ctor.restype = ctypes.POINTER(_PluginVTable)
        self._vt = ctor().contents
        if self._vt.abi_version != 1:
            raise RuntimeError(
                f"plugin ABI version {self._vt.abi_version} != 1 ({libpath})"
            )
        rc = self._vt.on_load((config_file or "").encode())
        if rc != 0:
            raise RuntimeError(f"plugin on_load failed with rc={rc} ({libpath})")
        self._open = True

    def name(self) -> str:
        return (self._vt.name() or b"").decode()

    def update_account(self, row) -> None:
        """Push one raw snapshot account record (RAW_ACCOUNTS_SCHEMA
        row or anything with the same attributes)."""
        data = bytes(row.data) if row.data is not None else b""
        rc = self._vt.update_account(
            _key_buf(bytes(row.pubkey) if row.pubkey is not None else b"", "pubkey"),
            _key_buf(bytes(row.owner) if row.owner is not None else b"", "owner"),
            ctypes.c_uint64(row.lamports & _U64_MASK),
            1 if row.executable else 0,
            ctypes.c_uint64(row.rent_epoch & _U64_MASK),  # i64 → u64 two's-compl
            _buf(data),
            len(data),
            ctypes.c_uint64(row.write_version & _U64_MASK),
            ctypes.c_uint64(row.slot & _U64_MASK),
        )
        if rc != 0:
            raise RuntimeError(f"plugin update_account failed with rc={rc}")

    def close(self) -> None:
        if self._open:
            self._open = False
            rc = self._vt.notify_end_of_startup()
            self._vt.on_unload()
            if rc != 0:
                raise RuntimeError(
                    f"plugin notify_end_of_startup failed with rc={rc}"
                )

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class native_plugin_consumer:
    """A picklable ``consumer(rows, epoch_id)`` for the existing push
    paths (``foreach_batch_push`` / CLI ``--geyser-so``): runs the full
    plugin lifecycle over each partition's rows, executor-side. A
    class (not a closure) so stdlib pickle works too; only the two
    path strings ship to workers."""

    def __init__(self, libpath: str, config_file: str | None = None):
        self.libpath = libpath
        self.config_file = config_file

    def __call__(self, rows, epoch_id: int) -> None:
        from solana_snapshot_etl_tools_spark.streaming.plugin_abi import (
            NativeGeyserPlugin,
        )

        with NativeGeyserPlugin(self.libpath, self.config_file) as plugin:
            for r in rows:
                plugin.update_account(r)


# ship by value inside serialized tasks (workers don't share the
# driver's sys.path — see _pickle.py)
from solana_snapshot_etl_tools_spark._pickle import register_self as _rs  # noqa: E402

_rs(__name__)
