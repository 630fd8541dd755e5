"""Native (C ABI) Geyser plugin loader — dlopen analog of the
reference loader (geyser_plugin.rs:25-60), driven end-to-end with a
real shared object compiled at test time."""

import json
import os
import subprocess
import tarfile

import pytest

from solana_snapshot_etl_tools_spark.streaming.plugin_abi import (
    PLUGIN_HEADER,
    NativeGeyserPlugin,
    native_plugin_consumer,
)

# A minimal real plugin: records its lifecycle and every account push
# as JSON lines into a fresh file (named by pid + instance counter)
# under the directory given as its config string.
STUB_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>
#include "spark_geyser_plugin.h"

static FILE *out;
static int n_instances;

static const char *nm(void) { return "stub-recorder"; }

static int32_t on_load(const char *config_file) {
    char path[4096];
    if (!config_file || !config_file[0]) return 1;
    snprintf(path, sizeof path, "%s/out-%d-%d.jsonl",
             config_file, (int)getpid(), n_instances++);
    out = fopen(path, "w");
    if (!out) return 2;
    fprintf(out, "{\"ev\":\"on_load\"}\n");
    return 0;
}

static void on_unload(void) {
    if (out) { fprintf(out, "{\"ev\":\"on_unload\"}\n"); fclose(out); out = NULL; }
}

static int32_t update(const uint8_t *pubkey, const uint8_t *owner,
                      uint64_t lamports, uint8_t executable,
                      uint64_t rent_epoch, const uint8_t *data,
                      uint64_t data_len, uint64_t write_version,
                      uint64_t slot) {
    int i;
    fprintf(out, "{\"ev\":\"update\",\"pubkey\":\"");
    for (i = 0; i < 32; i++) fprintf(out, "%02x", pubkey[i]);
    fprintf(out, "\",\"owner\":\"");
    for (i = 0; i < 32; i++) fprintf(out, "%02x", owner[i]);
    fprintf(out,
            "\",\"lamports\":%llu,\"executable\":%d,\"rent_epoch\":%llu,"
            "\"data_len\":%llu,\"write_version\":%llu,\"slot\":%llu}\n",
            (unsigned long long)lamports, (int)executable,
            (unsigned long long)rent_epoch, (unsigned long long)data_len,
            (unsigned long long)write_version, (unsigned long long)slot);
    (void)data;
    return 0;
}

static int32_t eos(void) {
    if (out) fprintf(out, "{\"ev\":\"end_of_startup\"}\n");
    return 0;
}

static SparkGeyserPluginV1 P = {1, nm, on_load, on_unload, update, eos};

SparkGeyserPluginV1 *_create_plugin(void) { return &P; }
"""


@pytest.fixture(scope="module")
def stub_so(tmp_path_factory):
    d = tmp_path_factory.mktemp("plugin_build")
    (d / "spark_geyser_plugin.h").write_text(PLUGIN_HEADER)
    (d / "stub.c").write_text(STUB_C)
    so = d / "stub_plugin.so"
    subprocess.run(
        ["cc", "-shared", "-fPIC", "-O2", "-o", str(so), str(d / "stub.c"),
         "-I", str(d)],
        check=True,
        capture_output=True,
    )
    return str(so)


def _read_events(out_dir):
    events = []
    for fn in sorted(os.listdir(out_dir)):
        with open(os.path.join(out_dir, fn)) as f:
            events.append([json.loads(line) for line in f])
    return events


def test_loader_lifecycle_and_rows(stub_so, tmp_path):
    """Unit: dlopen, name(), per-row push, i64→u64 rent_epoch, close."""
    from pyspark.sql import Row

    from solana_snapshot_etl_tools_spark.fixtures import build_fixture
    from solana_snapshot_etl_tools_spark.schemas import RAW_ACCOUNTS_SCHEMA

    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    mk = Row(*[f.name for f in RAW_ACCOUNTS_SCHEMA.fields])
    rows = [mk(*t) for t in build_fixture()["raw_rows"]]
    with NativeGeyserPlugin(stub_so, out_dir) as plugin:
        assert plugin.name() == "stub-recorder"
        for r in rows:
            plugin.update_account(r)
    (file_events,) = _read_events(out_dir)
    assert file_events[0] == {"ev": "on_load"}
    assert file_events[-2] == {"ev": "end_of_startup"}
    assert file_events[-1] == {"ev": "on_unload"}
    updates = [e for e in file_events if e["ev"] == "update"]
    assert len(updates) == len(rows)
    # the fixture plants duplicate pubkeys (last-write-wins rows), so
    # compare the full record sets, not a per-pubkey dict
    got = {
        (u["pubkey"], u["owner"], u["lamports"], u["write_version"],
         u["slot"], u["rent_epoch"], u["data_len"])
        for u in updates
    }
    exp = {
        (bytes(r.pubkey).hex(), bytes(r.owner).hex(), r.lamports,
         r.write_version, r.slot,
         # u64::MAX rent-epoch sentinel rows are stored as -1 in the
         # LongType column and must cross the FFI as 2^64-1
         r.rent_epoch % (1 << 64),
         len(bytes(r.data)) if r.data is not None else 0)
        for r in rows
    }
    assert got == exp


def test_malformed_key_raises_instead_of_segfault(stub_so, tmp_path):
    """pubkey/owner cross the FFI as 32-byte buffers; a malformed row
    (empty or short key) must raise a catchable ValueError BEFORE the
    call — a NULL or short buffer would segfault a conforming plugin
    that reads 32 bytes."""
    from pyspark.sql import Row

    from solana_snapshot_etl_tools_spark.fixtures import build_fixture
    from solana_snapshot_etl_tools_spark.schemas import RAW_ACCOUNTS_SCHEMA

    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    mk = Row(*[f.name for f in RAW_ACCOUNTS_SCHEMA.fields])
    good = mk(*build_fixture()["raw_rows"][0])
    with NativeGeyserPlugin(stub_so, out_dir) as plugin:
        for field, bad in (
            ("pubkey", b""),
            ("pubkey", None),
            ("owner", b"\x01" * 31),
            ("owner", b"\x01" * 33),
        ):
            row = mk(*[bad if f.name == field else good[f.name]
                       for f in RAW_ACCOUNTS_SCHEMA.fields])
            with pytest.raises(ValueError, match="32 bytes"):
                plugin.update_account(row)
        # empty data with data_len 0 is legal (NULL data pointer)
        row = mk(*[b"" if f.name == "data" else good[f.name]
                   for f in RAW_ACCOUNTS_SCHEMA.fields])
        plugin.update_account(row)


def test_missing_symbol_and_bad_path(stub_so, tmp_path):
    with pytest.raises(FileNotFoundError):
        NativeGeyserPlugin(str(tmp_path / "nope.so"))
    # libm.so.6 is a real library without our symbol
    import ctypes.util

    libm = ctypes.util.find_library("m")
    if libm:
        with pytest.raises(RuntimeError, match="_create_plugin"):
            NativeGeyserPlugin(libm)


def test_cli_geyser_so_end_to_end(spark, stub_so, tmp_path):
    """CLI e2e: archive in, native plugin .so out — every raw record
    reaches the plugin, executor-side, with a full lifecycle per
    partition."""
    from solana_snapshot_etl_tools_spark.__main__ import main
    from solana_snapshot_etl_tools_spark.fixtures import build_fixture as BF
    from tests.test_snapshot_source import _write_snapshot_dir
    import solana_snapshot_etl_tools_spark.sources.snapshot as SNAP

    accounts_dir, manifest = _write_snapshot_dir(str(tmp_path))
    slot = max(s for s, _ in manifest)
    tar_path = str(tmp_path / "snap_native.tar")
    with tarfile.open(tar_path, "w") as tf:
        mpath = str(tmp_path / "manifest_native.bin")
        with open(mpath, "wb") as f:
            f.write(SNAP.write_accounts_db_fields(manifest))
        tf.add(mpath, arcname=f"snapshots/{slot}/{slot}")
        for name in sorted(os.listdir(accounts_dir)):
            tf.add(os.path.join(accounts_dir, name), arcname=f"accounts/{name}")

    out_dir = str(tmp_path / "plugin_out")
    os.makedirs(out_dir)
    rc = main(
        [tar_path, "--geyser-so", f"{stub_so}:{out_dir}",
         "--work-dir", str(tmp_path / "wk")]
    )
    assert rc == 0
    pushed = set()
    for file_events in _read_events(out_dir):
        # each partition file is a complete lifecycle
        assert file_events[0] == {"ev": "on_load"}
        assert file_events[-2] == {"ev": "end_of_startup"}
        assert file_events[-1] == {"ev": "on_unload"}
        pushed.update(
            e["pubkey"] for e in file_events if e["ev"] == "update"
        )
    assert pushed == {bytes(r[0]).hex() for r in BF()["raw_rows"]}


def test_consumer_is_picklable(stub_so, tmp_path):
    import pickle

    c = native_plugin_consumer(stub_so, str(tmp_path))
    assert pickle.loads(pickle.dumps(c)) is not None


def test_cli_emits_plugin_header(capsys):
    from solana_snapshot_etl_tools_spark.__main__ import main

    assert main(["--emit-plugin-header"]) == 0
    assert capsys.readouterr().out == PLUGIN_HEADER
