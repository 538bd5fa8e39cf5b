"""AES-128 primitives: the MAC-complement PRF and the emp-style AES-CTR PRG.

PRF (reference: porla/Client/Client.hpp:423-455): one AES-128-ECB
encryption of the 16-byte record [level:i32 LE | index:i32 LE |
write_step:i64 LE] under SECRET_KEY. The IPA scheme reads the ciphertext as
two little-endian u64 limbs (a 128-bit scalar); the KZG scheme feeds the 16
bytes big-endian into BN254's Fr.

PRG (reference: porla/Utils/prg.h, block.h): AES-128-ECB over counter
blocks makeBlock(0, counter) — i.e. plaintext bytes [counter:u64 LE | 0u64].
Key = seed XOR makeBlock(0, id). Used by BOTH parties to expand the 16-byte
audit seed into challenge integers, so it must be byte-compatible.

Backed by the `cryptography` package (AES-NI); the native C++ runtime can
override these for bulk paths.
"""

from __future__ import annotations

import struct

import numpy as np
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes


def _ecb_encrypt(key: bytes, plaintext: bytes) -> bytes:
    enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
    return enc.update(plaintext) + enc.finalize()


class MacPrf:
    """AES-128 PRF over (level, index, write_step) records."""

    def __init__(self, key: bytes):
        assert len(key) == 16
        self.key = key

    def prf_block(self, level: int, index: int, write_step: int) -> bytes:
        pt = struct.pack("<iiq", level, index, write_step)
        return _ecb_encrypt(self.key, pt)

    def prf_scalar_ipa(self, level: int, index: int, write_step: int) -> int:
        """128-bit scalar r (secp256k1_scalar with d[0],d[1] from the
        ciphertext little-endian; d[2]=d[3]=0)."""
        return int.from_bytes(self.prf_block(level, index, write_step), "little")

    def prf_scalars_ipa(self, records) -> list[int]:
        """Batch PRF: records = iterable of (level, index, write_step)."""
        pt = b"".join(struct.pack("<iiq", l, i, w) for (l, i, w) in records)
        if not pt:
            return []
        ct = _ecb_encrypt(self.key, pt)
        return [int.from_bytes(ct[k:k + 16], "little") for k in range(0, len(ct), 16)]

    def prf_scalars_kzg(self, records, r_modulus: int) -> list[int]:
        """KZG variant: ciphertext bytes big-endian into Fr (gnark SetBytes)."""
        pt = b"".join(struct.pack("<iiq", l, i, w) for (l, i, w) in records)
        if not pt:
            return []
        ct = _ecb_encrypt(self.key, pt)
        return [int.from_bytes(ct[k:k + 16], "big") % r_modulus
                for k in range(0, len(ct), 16)]


class Prg:
    """emp-toolkit-compatible AES-CTR PRG (reference Utils/prg.h)."""

    def __init__(self, seed: bytes | None = None, stream_id: int = 0):
        if seed is None:
            import os
            seed = os.urandom(16)
        self.reseed(seed, stream_id)

    def reseed(self, seed: bytes, stream_id: int = 0) -> None:
        assert len(seed) == 16
        key = bytearray(seed)
        idb = struct.pack("<Q", stream_id)
        for i in range(8):  # v ^= makeBlock(0, id): id XORs the low 8 bytes
            key[i] ^= idb[i]
        self.key = bytes(key)
        self.counter = 0

    def random_block(self, nblocks: int) -> bytes:
        pts = b"".join(struct.pack("<QQ", self.counter + j, 0)
                       for j in range(nblocks))
        self.counter += nblocks
        return _ecb_encrypt(self.key, pts)

    def random_data(self, nbytes: int) -> bytes:
        full = nbytes // 16
        out = self.random_block(full) if full else b""
        if nbytes % 16:
            out += self.random_block(1)[: nbytes % 16]
        return out

    def random_ints(self, count: int) -> np.ndarray:
        """`count` signed int32 values, matching random_data into an int[]."""
        raw = self.random_data(count * 4)
        return np.frombuffer(raw, dtype="<i4").copy()
