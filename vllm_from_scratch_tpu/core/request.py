"""Request state for the continuous-batching engine.

Equivalent of the reference's ``Request`` (ref: 05_mini_vllm/mini_vllm.py:115-152)
plus the richer status machine of the blog scheduler, including preemption
(ref: BLOG_PART2.md:712-858, RequestStatus incl. PREEMPTED).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import List

from .config import SamplingParams
from .hashing import BlockHash


class RequestStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    PREEMPTED = enum.auto()            # blog scheduler BLOG_PART2.md:992-1015
    WAITING_FOR_REMOTE_KVS = enum.auto()  # PD disaggregation (global_kv_pool.py:421-440)
    FINISHED_STOPPED = enum.auto()     # hit EOS
    FINISHED_LENGTH = enum.auto()      # hit max_new_tokens
    FINISHED_ABORTED = enum.auto()

    @property
    def is_finished(self) -> bool:
        return self in (
            RequestStatus.FINISHED_STOPPED,
            RequestStatus.FINISHED_LENGTH,
            RequestStatus.FINISHED_ABORTED,
        )


@dataclass
class Request:
    req_id: int
    prompt_token_ids: List[int]
    sampling: SamplingParams = field(default_factory=SamplingParams)
    priority: int = 0
    arrival_time: float = 0.0

    status: RequestStatus = RequestStatus.WAITING
    output_token_ids: List[int] = field(default_factory=list)
    # How many tokens of (prompt + output) have been computed into the KV
    # cache.  Drives chunked prefill: < len(prompt) => still prefilling.
    num_computed_tokens: int = 0
    block_ids: List[int] = field(default_factory=list)
    # Chained hashes of full prompt/output blocks (lazily extended).
    block_hashes: List[BlockHash] = field(default_factory=list)
    num_cached_blocks: int = 0  # how many of block_ids are already in the prefix cache
    # PD disaggregation: tokens satisfied from the global pool (module 06).
    num_remote_tokens: int = 0
    # SWAP-mode preemption (vLLM V1's RECOMPUTE vs SWAP choice,
    # BLOG_PART3_V2.md:1589-1625): host-resident KV pages of the first
    # ``num_swapped_tokens`` positions, captured at swap-out and injected
    # back into freshly allocated device blocks at re-admission.
    swapped_pages: object = None
    num_swapped_tokens: int = 0

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_tokens(self) -> int:
        return len(self.prompt_token_ids) + len(self.output_token_ids)

    @property
    def is_prefill(self) -> bool:
        """Still computing prompt KV (ref: mini_vllm.py:141-143)."""
        return self.num_computed_tokens < self.num_prompt_tokens

    @property
    def needs_catchup(self) -> bool:
        """More than one token of KV is owed before the next NEW token can
        be sampled — fresh prefill, or a preemption-resumed request whose
        already-generated outputs must be recomputed (they are KNOWN tokens:
        they schedule as multi-token chunks and sample nothing until the
        last one, exactly like prompt prefill).  Steady decode keeps the
        invariant num_computed == num_tokens - 1."""
        return self.num_computed_tokens < self.num_tokens - 1

    @property
    def is_finished(self) -> bool:
        return self.status.is_finished

    def all_token_ids(self) -> List[int]:
        return self.prompt_token_ids + self.output_token_ids

    def token_at(self, idx: int) -> int:
        np_ = self.num_prompt_tokens
        return self.prompt_token_ids[idx] if idx < np_ else self.output_token_ids[idx - np_]

    def preempt(self) -> None:
        """Preemption-by-recompute: drop all progress, keep outputs so far
        (blog scheduler BLOG_PART2.md:992-1015).  Resume recomputes prompt
        AND kept outputs as catch-up chunks (``needs_catchup``)."""
        self.status = RequestStatus.PREEMPTED
        self.num_computed_tokens = 0
        self.block_ids = []
        self.num_cached_blocks = 0
        self.swapped_pages = None
        self.num_swapped_tokens = 0

    def preempt_swapped(self, pages, num_tokens: int) -> None:
        """SWAP-mode preemption: computed KV (full blocks only) survives on
        the host; progress truncates to the swapped boundary instead of zero
        (BLOG_PART3_V2.md:1589-1625)."""
        self.status = RequestStatus.PREEMPTED
        self.num_computed_tokens = num_tokens
        self.block_ids = []
        self.num_cached_blocks = 0
        self.swapped_pages = pages
        self.num_swapped_tokens = num_tokens
