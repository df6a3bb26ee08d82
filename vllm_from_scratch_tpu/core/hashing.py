"""Chained block hashing for prefix caching and the global KV pool.

The reference chains Python ``hash((parent, tokens, extra))`` over full blocks
(ref: 06_global_prefix_cache/global_kv_pool.py:471-500) and warns that
PYTHONHASHSEED must match cluster-wide (BLOG_PART2B_V2.md:197-199).  We use
content-addressed SHA-256 from day one — the production-vLLM scheme the blog
documents (BLOG_PART2B_V2.md:813-826) — so hashes are stable across hosts,
processes and restarts with no seed coordination.

Properties (same contract as the reference, enforced by tests):
- Only *full* blocks are hashed; a trailing partial block gets no hash.
- The hash chains through the parent, so identical tokens after different
  prefixes hash differently (test_global_kv_pool.py:32-41 analogue).
- ``extra_key`` salts the chain (LoRA id, multimodal hash, cache epoch...).
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Optional, Sequence

# Domain-separation tag so a KV block hash can never collide with other
# sha256 uses; bump the version to invalidate every cache cluster-wide.
_TAG = b"vfs-tpu-kv-block-v1"

# Root of every chain (no parent).
NO_PARENT: bytes = hashlib.sha256(_TAG + b":root").digest()

BlockHash = bytes  # 32-byte sha256 digest


def compute_block_hash(
    parent_hash: Optional[BlockHash],
    token_ids: Sequence[int],
    extra_key: Optional[object] = None,
) -> BlockHash:
    """Hash of one full block, chained through its parent.

    Equivalent role to ``compute_block_hash`` at global_kv_pool.py:471-483,
    but content-addressed (SHA-256 over parent digest || token bytes || extra).
    """
    h = hashlib.sha256()
    h.update(_TAG)
    h.update(parent_hash if parent_hash is not None else NO_PARENT)
    h.update(struct.pack(f"<{len(token_ids)}q", *token_ids))
    if extra_key is not None:
        h.update(b"|" + repr(extra_key).encode())
    return h.digest()


def compute_block_hashes(
    token_ids: Sequence[int],
    block_size: int,
    extra_key: Optional[object] = None,
) -> List[BlockHash]:
    """Chained hashes for every *full* block of ``token_ids``.

    Mirrors global_kv_pool.py:485-500: partial trailing blocks are skipped.
    """
    hashes: List[BlockHash] = []
    parent: Optional[BlockHash] = None
    num_full = len(token_ids) // block_size
    for i in range(num_full):
        block = token_ids[i * block_size : (i + 1) * block_size]
        parent = compute_block_hash(parent, block, extra_key)
        hashes.append(parent)
    return hashes


def hash_hex(h: BlockHash) -> str:
    return h.hex()[:16]
