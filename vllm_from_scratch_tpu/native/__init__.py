"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; the host-side runtime around it gets
native implementations where it's hot.  First component: the block pool
(native/block_pool.cc) — the per-step allocate/free/touch/prefix-lookup
engine the scheduler drives (Python twin: core/block_pool.py).

The shared library is built lazily with g++ on first use and cached next to
the source; if no toolchain is available everything falls back to the
Python implementation (``NativeBlockPool`` import returns None from
``load_native_pool_lib``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "block_pool.cc")
_LIB = os.path.join(_HERE, "_block_pool.so")
_lock = threading.Lock()
_lib = None
_lib_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_native_pool_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native pool library; None on failure."""
    global _lib, _lib_tried
    with _lock:
        if _lib is not None or _lib_tried:
            return _lib
        _lib_tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.bp_create.restype = ctypes.c_void_p
        lib.bp_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.bp_destroy.argtypes = [ctypes.c_void_p]
        lib.bp_num_free.argtypes = [ctypes.c_void_p]
        lib.bp_get_new_blocks.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.bp_touch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.bp_free_blocks.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.bp_get_cached_block.restype = ctypes.c_long
        lib.bp_get_cached_block.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.bp_cache_full_blocks.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int]
        lib.bp_reset_prefix_cache.argtypes = [ctypes.c_void_p]
        lib.bp_ref_cnt.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.bp_order.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
        lib.bp_lookup_prefix.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def _ids_arr(ids: Sequence[int]):
    return (ctypes.c_int * len(ids))(*ids)


class NativeBlockPool:
    """Drop-in replacement for core.block_pool.BlockPool backed by C++.

    Same method surface and behavioral contract (the reference tests are the
    spec); hashes are the 32-byte digests from core.hashing.
    """

    def __init__(self, num_blocks: int, enable_caching: bool = True):
        assert num_blocks > 1
        lib = load_native_pool_lib()
        if lib is None:
            raise RuntimeError("native block pool unavailable (no g++?)")
        self._lib = lib
        self.num_blocks = num_blocks
        self.enable_caching = enable_caching
        self._p = lib.bp_create(num_blocks, int(enable_caching))
        self.null_block = 0

    def __del__(self):
        p = getattr(self, "_p", None)
        if p:
            self._lib.bp_destroy(p)
            self._p = None

    # ---- queries ----------------------------------------------------------

    def get_num_free_blocks(self) -> int:
        return self._lib.bp_num_free(self._p)

    def get_usage(self) -> float:
        total = self.num_blocks - 1
        return 1.0 - self.get_num_free_blocks() / total if total > 0 else 0.0

    def get_cached_block(self, block_hash: bytes) -> Optional[int]:
        r = self._lib.bp_get_cached_block(self._p, bytes(block_hash[:32]))
        return None if r < 0 else int(r)

    def ref_count(self, block_id: int) -> int:
        return self._lib.bp_ref_cnt(self._p, block_id)

    def lookup_prefix(self, block_hashes: Sequence[bytes]) -> List[int]:
        """Ids of the longest cached prefix (chain stops at first miss) —
        one native call for the scheduler's hottest query."""
        n = len(block_hashes)
        if n == 0:
            return []
        blob = b"".join(bytes(h[:32]) for h in block_hashes)
        out = (ctypes.c_int * n)()
        k = self._lib.bp_lookup_prefix(self._p, blob, n, out)
        return list(out)[:k]

    # ---- allocation -------------------------------------------------------

    def get_new_blocks(self, num_blocks: int) -> List[int]:
        out = (ctypes.c_int * num_blocks)()
        if self._lib.bp_get_new_blocks(self._p, num_blocks, out) != 0:
            raise RuntimeError(
                f"OOM: need {num_blocks} blocks, only "
                f"{self.get_num_free_blocks()} free"
            )
        return list(out)

    def touch(self, block_ids: Sequence[int]) -> None:
        self._lib.bp_touch(self._p, _ids_arr(block_ids), len(block_ids))

    def free_blocks(self, block_ids: Sequence[int]) -> None:
        if self._lib.bp_free_blocks(self._p, _ids_arr(block_ids), len(block_ids)) != 0:
            raise AssertionError(f"double free among {list(block_ids)}")

    # ---- prefix cache -----------------------------------------------------

    def cache_full_blocks(
        self,
        block_ids: Sequence[int],
        block_hashes: Sequence[bytes],
        num_cached_blocks: int,
        num_full_blocks: int,
    ) -> None:
        if not self.enable_caching or num_cached_blocks >= num_full_blocks:
            return
        n = num_full_blocks
        blob = b"".join(bytes(h[:32]) for h in block_hashes[:n])
        self._lib.bp_cache_full_blocks(
            self._p, _ids_arr(list(block_ids[:n])), blob,
            num_cached_blocks, num_full_blocks,
        )

    def reset_prefix_cache(self) -> bool:
        return bool(self._lib.bp_reset_prefix_cache(self._p))

    # ---- debug ------------------------------------------------------------

    def lru_order(self) -> List[int]:
        out = (ctypes.c_int * self.num_blocks)()
        n = self._lib.bp_order(self._p, out)
        return list(out)[:n]
