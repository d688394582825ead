"""SOZip writer/reader oracles (io/sozip.py; gdal vsi sozip parity).

The interop bar: python's stdlib zipfile must read every archive we
write (the hidden .sozip.idx entry is excluded from the central
directory, exactly like the reference), and every chunk must inflate
independently from its recorded offset.
"""

import json
import os
import subprocess
import sys
import zipfile
import zlib

import numpy as np
import pytest

from gdal_ray.io.sozip import (
    sozip_create,
    sozip_list,
    sozip_read_chunk,
    sozip_validate,
)


@pytest.fixture()
def payloads():
    rng = np.random.default_rng(6)
    big = rng.integers(0, 64, size=300_000, dtype=np.uint8).tobytes()
    small = b"hello " * 100
    return {"big.bin": big, "small.txt": small}


def make_zip(tmp_path, payloads, **kw):
    zp = str(tmp_path / "t.zip")
    sozip_create(
        zp, [(n, b) for n, b in payloads.items()],
        min_file_size=100_000, **kw
    )
    return zp


class TestSOZip:
    def test_zipfile_interop(self, tmp_path, payloads):
        zp = make_zip(tmp_path, payloads)
        with zipfile.ZipFile(zp) as z:
            assert sorted(z.namelist()) == ["big.bin", "small.txt"]
            for n, want in payloads.items():
                assert z.read(n) == want  # zipfile verifies CRC itself
            assert z.testzip() is None

    def test_hidden_index_and_list(self, tmp_path, payloads):
        zp = make_zip(tmp_path, payloads)
        entries = {e["name"]: e for e in sozip_list(zp)}
        assert entries["big.bin"]["sozip"] is True
        assert entries["big.bin"]["chunks"] == -(-300_000 // 32768)
        assert entries["small.txt"]["sozip"] is False

    def test_chunks_inflate_independently(self, tmp_path, payloads):
        zp = make_zip(tmp_path, payloads)
        want = payloads["big.bin"]
        n_chunks = -(-len(want) // 32768)
        for i in range(n_chunks):
            got = sozip_read_chunk(zp, "big.bin", i)
            assert got == want[i * 32768 : (i + 1) * 32768]

    def test_validate(self, tmp_path, payloads):
        zp = make_zip(tmp_path, payloads)
        res = sozip_validate(zp, "big.bin")
        assert res["valid"] and res["chunks"] == -(-300_000 // 32768)
        with pytest.raises(ValueError, match="no sozip index"):
            sozip_validate(zp, "small.txt")

    def test_validate_catches_corruption(self, tmp_path, payloads):
        zp = make_zip(tmp_path, payloads)
        raw = bytearray(open(zp, "rb").read())
        # flip a byte in the middle of the big member's compressed data
        raw[2000] ^= 0xFF
        open(zp, "wb").write(bytes(raw))
        with pytest.raises(ValueError):
            sozip_validate(zp, "big.bin")

    def test_custom_chunk_and_force(self, tmp_path):
        rng = np.random.default_rng(8)
        data = rng.integers(0, 32, size=50_000, dtype=np.uint8).tobytes()
        zp = str(tmp_path / "c.zip")
        sozip_create(zp, [("d.bin", data)], chunk_size=8192,
                     force_sozip=True)
        e = sozip_list(zp)[0]
        assert e["sozip"] and e["chunk_size"] == 8192
        assert sozip_validate(zp, "d.bin")["chunks"] == -(-50_000 // 8192)
        with zipfile.ZipFile(zp) as z:
            assert z.read("d.bin") == data

    def test_incompressible_data(self, tmp_path):
        data = os.urandom(200_000)
        zp = str(tmp_path / "r.zip")
        sozip_create(zp, [("r.bin", data)], min_file_size=100_000)
        assert sozip_validate(zp, "r.bin")["valid"]
        with zipfile.ZipFile(zp) as z:
            assert z.read("r.bin") == data


class TestVsiCLI:
    def run_cli(self, *args):
        out = subprocess.run(
            [sys.executable, "-m", "gdal_ray", "vsi", *args],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr
        return json.loads(out.stdout.strip().splitlines()[-1])

    def test_copy_list_sync_delete(self, tmp_path):
        src = tmp_path / "a"
        src.mkdir()
        (src / "f1.txt").write_text("one")
        (src / "f2.txt").write_text("two")
        dst = tmp_path / "b"
        r = self.run_cli("sync", str(src), str(dst))
        assert r["copied"] == 2
        r = self.run_cli("sync", str(src), str(dst))
        assert r["copied"] == 0  # idempotent
        ls = self.run_cli("list", str(dst))
        assert [e["name"] for e in ls] == ["f1.txt", "f2.txt"]
        self.run_cli("copy", str(src / "f1.txt"), str(tmp_path / "f1c.txt"))
        assert (tmp_path / "f1c.txt").read_text() == "one"
        self.run_cli("delete", str(tmp_path / "f1c.txt"))
        assert not (tmp_path / "f1c.txt").exists()

    def test_sozip_cli(self, tmp_path):
        big = tmp_path / "data.bin"
        big.write_bytes(bytes(np.arange(200_000, dtype=np.uint8)))
        zp = tmp_path / "out.zip"
        r = self.run_cli("sozip", "create", "--chunk", "16384",
                         "--enable", "yes", str(zp), str(big))
        assert r[0]["sozip"] is True
        r = self.run_cli("sozip", "validate", str(zp))
        assert r[0]["valid"] is True
