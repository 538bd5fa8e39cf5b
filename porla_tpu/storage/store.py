"""Server-side block storage: U/, H_X/, H_Y/ with the reference's layouts.

File formats (reference porla/Utils/utils.h):
- U/<i>: the raw 4096-byte data block (write_data_block_to_file, :585-590);
  chunks are 32-byte little-endian values.
- H_X/<level>_<i>, H_Y/<level>_<i>: codeword blocks; 256-bit form is 128 x
  32-byte LE values (serialize_error_code_256b, :496-507), 512-bit form is
  128 x 64-byte LE values mod LCM (serialize_error_code_512b, :473-484).

The Python layer here is the portable backend; porla_tpu/runtime provides
a native C++ engine with batched IO behind the same interface.
"""

from __future__ import annotations

import os

import numpy as np

from porla_tpu.config import BLOCK_SIZE, NUM_CHUNKS
from porla_tpu.fields import limbs
from porla_tpu.ntt.engine import CrtArray, crt_from_ints


class BlockStore:
    """Directory-backed store mirroring the reference's U/H_X/H_Y trees."""

    def __init__(self, root: str):
        self.root = root
        for sub in ("U", "H_X", "H_Y"):
            os.makedirs(os.path.join(root, sub), exist_ok=True)

    # --- raw data blocks (U/) ---------------------------------------------

    def write_block(self, index: int, data: bytes) -> None:
        assert len(data) == BLOCK_SIZE
        with open(os.path.join(self.root, "U", str(index)), "wb") as f:
            f.write(data)

    def read_block(self, index: int) -> bytes:
        with open(os.path.join(self.root, "U", str(index)), "rb") as f:
            return f.read(BLOCK_SIZE)

    def read_block_chunks(self, index: int) -> list[int]:
        """Block -> 128 chunk integers (read_data_block_from_file
        semantics: 8 LE u32 words per chunk)."""
        raw = self.read_block(index)
        return [int.from_bytes(raw[i * 32:(i + 1) * 32], "little")
                for i in range(NUM_CHUNKS)]

    def read_blocks_crt(self, indices, mod_q, xp=np) -> CrtArray:
        """Batch-load raw blocks into a (N, NUM_CHUNKS, 16) CRT array."""
        vals = []
        for i in indices:
            vals.extend(self.read_block_chunks(i))
        arr = crt_from_ints(vals, mod_q)
        n = len(list(indices))
        return CrtArray(arr.p.reshape(n, NUM_CHUNKS, limbs.NLIMBS),
                        arr.q.reshape(n, NUM_CHUNKS, limbs.NLIMBS))

    # --- codeword files (H_X/, H_Y/) --------------------------------------

    def _code_path(self, is_x: bool, level: int, index: int) -> str:
        sub = "H_X" if is_x else "H_Y"
        return os.path.join(self.root, sub, f"{level}_{index}")

    def write_code_256(self, is_x: bool, level: int, index: int,
                       chunks: list[int]) -> None:
        assert len(chunks) == NUM_CHUNKS
        buf = b"".join(c.to_bytes(32, "little") for c in chunks)
        with open(self._code_path(is_x, level, index), "wb") as f:
            f.write(buf)

    def read_code_256(self, is_x: bool, level: int, index: int) -> list[int]:
        with open(self._code_path(is_x, level, index), "rb") as f:
            raw = f.read(NUM_CHUNKS * 32)
        return [int.from_bytes(raw[i * 32:(i + 1) * 32], "little")
                for i in range(NUM_CHUNKS)]

    def write_code_512(self, is_x: bool, level: int, index: int,
                       chunks: list[int]) -> None:
        assert len(chunks) == NUM_CHUNKS
        buf = b"".join(c.to_bytes(64, "little") for c in chunks)
        with open(self._code_path(is_x, level, index), "wb") as f:
            f.write(buf)

    def read_code_512(self, is_x: bool, level: int, index: int) -> list[int]:
        with open(self._code_path(is_x, level, index), "rb") as f:
            raw = f.read(NUM_CHUNKS * 64)
        return [int.from_bytes(raw[i * 64:(i + 1) * 64], "little")
                for i in range(NUM_CHUNKS)]
