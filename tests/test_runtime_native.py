"""Native runtime parity vs the Python crypto/IO implementations."""

import os

import pytest

from porla_tpu.crypto import aes
from porla_tpu.runtime import lib as rt


native = pytest.mark.skipif(rt.get_lib() is None,
                            reason="native runtime unavailable")


@native
def test_aes_matches_cryptography():
    key = bytes(range(16))
    pt = os.urandom(16 * 33)
    assert rt.aes128_ecb(key, pt) == aes._ecb_encrypt(key, pt)


@native
def test_prg_expand_matches_python():
    seed = bytes(range(16))
    n = 100
    py = aes.Prg(seed, 0).random_block(n)
    assert rt.prg_expand(seed, 0, n) == py
    # mid-stream counter
    prg = aes.Prg(seed, 0)
    prg.random_block(7)
    assert rt.prg_expand(seed, 7, 5) == prg.random_block(5)


@native
def test_batched_file_io_roundtrip(tmp_path):
    paths = [str(tmp_path / f"f{i}") for i in range(20)]
    rec = 4096
    data = os.urandom(rec * len(paths))
    assert rt.write_files(paths, rec, data, threads=4)
    back = rt.read_files(paths, rec, threads=4)
    assert back == data
    # and the files themselves match slices
    with open(paths[3], "rb") as f:
        assert f.read() == data[3 * rec:4 * rec]


@native
def test_read_missing_file_raises(tmp_path):
    with pytest.raises(IOError):
        rt.read_files([str(tmp_path / "nope")], 16)
