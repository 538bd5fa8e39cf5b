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
from porla_tpu.fields import limbs, mont
from porla_tpu.fields import constants as C
from porla_tpu.ntt.engine import CrtArray
from porla_tpu.runtime import lib as rt

_MOD_P = mont.Modulus(C.FFT_PRIME, "fft_p")


class BlockStore:
    """Directory-backed store mirroring the reference's U/H_X/H_Y trees.

    All multi-file paths go through batched readers/writers: the native
    porla_rt thread pool when available (the reference's 8-thread audit
    reads, Server.hpp:742-776), a serial Python loop otherwise."""

    def __init__(self, root: str):
        self.root = root
        for sub in ("U", "H_X", "H_Y", "STG"):
            os.makedirs(os.path.join(root, sub), exist_ok=True)

    # --- batched file IO core ----------------------------------------------

    @staticmethod
    def _read_many(paths: list[str], record_size: int) -> bytes:
        data = rt.read_files(paths, record_size)
        if data is not None:
            return data
        bufs = []
        for p in paths:
            with open(p, "rb") as f:
                bufs.append(f.read(record_size))
        return b"".join(bufs)

    @staticmethod
    def _write_many(paths: list[str], record_size: int, data: bytes) -> None:
        if rt.write_files(paths, record_size, data):
            return
        for i, p in enumerate(paths):
            with open(p, "wb") as f:
                f.write(data[i * record_size:(i + 1) * record_size])

    # --- raw data blocks (U/) ---------------------------------------------

    def _u_path(self, index: int) -> str:
        return os.path.join(self.root, "U", str(index))

    def write_block(self, index: int, data: bytes) -> None:
        assert len(data) == BLOCK_SIZE
        with open(self._u_path(index), "wb") as f:
            f.write(data)

    def write_blocks(self, indices, datas: bytes) -> None:
        """Batch-write raw 4096-byte blocks from one contiguous buffer."""
        self._write_many([self._u_path(i) for i in indices], BLOCK_SIZE,
                         datas)

    def read_block(self, index: int) -> bytes:
        with open(self._u_path(index), "rb") as f:
            return f.read(BLOCK_SIZE)

    def read_block_chunks(self, index: int) -> list[int]:
        """Block -> 128 chunk integers (read_data_block_from_file
        semantics: 8 LE u32 words per chunk)."""
        raw = self.read_block(index)
        return [int.from_bytes(raw[i * 32:(i + 1) * 32], "little")
                for i in range(NUM_CHUNKS)]

    def read_blocks_crt(self, indices, mod_q, xp=np) -> CrtArray:
        """Batch-load raw blocks into a (N, NUM_CHUNKS, 16) CRT array.

        Threaded batched reads + vectorized limb decode + vectorized
        modular reduction (raw chunks are arbitrary 256-bit values;
        each lane is reduced canonically)."""
        indices = list(indices)
        raw = self._read_many([self._u_path(i) for i in indices],
                              BLOCK_SIZE)
        arr = limbs.bytes_to_limbs(raw).reshape(
            len(indices), NUM_CHUNKS, limbs.NLIMBS)
        return CrtArray(mont.mod_reduce(np, arr, _MOD_P),
                        mont.mod_reduce(np, arr, mod_q))

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

    def write_codes_256(self, is_x: bool, level: int, indices,
                        arr: np.ndarray) -> None:
        """Batch-write (N, NUM_CHUNKS, 16) canonical limb values as 256-bit
        codeword files (serialize_error_code_256b layout, utils.h:496-507)."""
        indices = list(indices)
        buf = np.ascontiguousarray(
            np.asarray(arr, np.uint32).astype("<u2")).tobytes()
        self._write_many(
            [self._code_path(is_x, level, i) for i in indices],
            NUM_CHUNKS * 32, buf)

    def read_codes_256(self, is_x: bool, level: int,
                       indices) -> np.ndarray:
        """Batch-read 256-bit codeword files -> (N, NUM_CHUNKS, 16) limbs."""
        indices = list(indices)
        raw = self._read_many(
            [self._code_path(is_x, level, i) for i in indices],
            NUM_CHUNKS * 32)
        return limbs.bytes_to_limbs(raw).reshape(
            len(indices), NUM_CHUNKS, limbs.NLIMBS)

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

    def write_codes_512(self, is_x: bool, level: int, indices,
                        lo: np.ndarray, hi: np.ndarray) -> None:
        """Batch-write 512-bit staging files (serialize_error_code_512b,
        utils.h:473-484): values mod LCM as (low 256b limbs, high 256b
        limbs) pairs, little-endian."""
        indices = list(indices)
        lo16 = np.asarray(lo, np.uint32).astype("<u2").reshape(
            len(indices), NUM_CHUNKS, limbs.NLIMBS)
        hi16 = np.asarray(hi, np.uint32).astype("<u2").reshape(
            len(indices), NUM_CHUNKS, limbs.NLIMBS)
        packed = np.concatenate([lo16, hi16], axis=-1)  # (N, C, 32) u16 LE
        self._write_many(
            [self._code_path(is_x, level, i) for i in indices],
            NUM_CHUNKS * 64, np.ascontiguousarray(packed).tobytes())

    def read_codes_512(self, is_x: bool, level: int,
                       indices) -> tuple[np.ndarray, np.ndarray]:
        """Batch-read 512-bit staging files -> (lo, hi) (N, C, 16) limbs."""
        indices = list(indices)
        raw = self._read_many(
            [self._code_path(is_x, level, i) for i in indices],
            NUM_CHUNKS * 64)
        arr = np.frombuffer(raw, "<u2").astype(np.uint32).reshape(
            len(indices), NUM_CHUNKS, 2 * limbs.NLIMBS)
        return (np.ascontiguousarray(arr[..., :limbs.NLIMBS]),
                np.ascontiguousarray(arr[..., limbs.NLIMBS:]))

    # --- out-of-core staging files (STG/) -----------------------------------
    # 64-byte-per-chunk staging records for not-yet-reduced mod-LCM values
    # during streamed CRebuild/mix (the role of the reference's 512b files,
    # serialize_error_code_512b utils.h:473-484). A mod-LCM value here is
    # its CRT residue pair: record = [p-lane 32B LE | q-lane 32B LE].

    def _stg_path(self, tag: str, index: int) -> str:
        return os.path.join(self.root, "STG", f"{tag}_{index}")

    def write_staged(self, tag: str, indices, arr_p: np.ndarray,
                     arr_q: np.ndarray) -> None:
        """Batch-write (N, NUM_CHUNKS, 16)-limb CRT lane pairs."""
        indices = list(indices)
        p16 = np.asarray(arr_p, np.uint32).astype("<u2").reshape(
            len(indices), NUM_CHUNKS, limbs.NLIMBS)
        q16 = np.asarray(arr_q, np.uint32).astype("<u2").reshape(
            len(indices), NUM_CHUNKS, limbs.NLIMBS)
        packed = np.concatenate([p16, q16], axis=-1)
        self._write_many([self._stg_path(tag, i) for i in indices],
                         NUM_CHUNKS * 64,
                         np.ascontiguousarray(packed).tobytes())

    def read_staged(self, tag: str, indices) -> CrtArray:
        indices = list(indices)
        raw = self._read_many([self._stg_path(tag, i) for i in indices],
                              NUM_CHUNKS * 64)
        arr = np.frombuffer(raw, "<u2").astype(np.uint32).reshape(
            len(indices), NUM_CHUNKS, 2 * limbs.NLIMBS)
        return CrtArray(np.ascontiguousarray(arr[..., :limbs.NLIMBS]),
                        np.ascontiguousarray(arr[..., limbs.NLIMBS:]))

    def delete_staged(self, tag: str, n: int) -> None:
        for i in range(n):
            try:
                os.remove(self._stg_path(tag, i))
            except FileNotFoundError:
                pass
