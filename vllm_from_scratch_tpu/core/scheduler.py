"""Continuous-batching scheduler: chunked prefill, prefix cache, preemption.

Equivalent of the reference Scheduler (ref: 05_mini_vllm/mini_vllm.py:164-337)
merged with the blog's richer preempting scheduler (BLOG_PART2.md:712-1030):

- Per-step caps: ``max_num_batched_tokens`` token budget and ``max_num_seqs``
  (mini_vllm.py:226-309), FCFS or priority policy (BLOG_PART2.md:853-858).
- Phase order each step: running decodes (1 token) -> running prefill chunks
  -> waiting admissions, exactly the reference's order so TTFT/fairness
  behavior matches.
- Chunked prefill: chunk = min(remaining_prompt, budget) (mini_vllm.py:254-274).
- Admission runs the prefix-cache lookup once per (re)start; on a failed
  admission the touched hit blocks are released again (see
  KVCacheManager.get_computed_blocks contract).
- Preemption-by-recompute when the pool runs dry: victimize the
  latest-arrival / lowest-priority *running* request, free its blocks, reset
  progress, push back to the head of waiting (BLOG_PART2.md:992-1015;
  vLLM V1's default RECOMPUTE mode, BLOG_PART3_V2.md:1589-1625).

The scheduler is host-side Python (the thin imperative shell); its output is
plain ints that the engine turns into dense device arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from .config import SchedulerConfig
from .kv_cache_manager import KVCacheManager
from .request import Request, RequestStatus

#: Sentinel token value for a sampled-but-unsynced output position (async
#: scheduling).  Never a valid token id.
PLACEHOLDER = -1


@dataclass
class ScheduledRequest:
    request: Request
    num_new_tokens: int          # tokens computed this step (1 for decode)
    start_pos: int               # num_computed_tokens at schedule time
    slots: List[int] = field(default_factory=list)  # flat physical slots
    # Sampling threshold: positions below it carry KNOWN tokens (prompt, or
    # outputs kept across a preemption being recomputed); only the step that
    # computes THROUGH it samples a new token.  Pinned at schedule time
    # (num_tokens grows as outputs append).  0 => legacy prompt threshold.
    target: int = 0

    @property
    def _threshold(self) -> int:
        return self.target or self.request.num_prompt_tokens

    @property
    def is_decode(self) -> bool:
        return self.num_new_tokens == 1 and not (
            self.start_pos + 1 < self._threshold
        )

    @property
    def produces_token(self) -> bool:
        """True when this step computes through the last KNOWN token (or is
        a decode) so the step's logits yield a real sampled token."""
        return self.start_pos + self.num_new_tokens >= self._threshold


@dataclass
class SchedulerStats:
    num_preempted: int = 0
    num_scheduled_steps: int = 0
    num_scheduled_tokens: int = 0
    num_swapped_out: int = 0     # SWAP-mode preemptions (KV kept on host)
    num_swapped_in: int = 0      # swap restores at re-admission


class Scheduler:
    def __init__(self, config: SchedulerConfig, kv_mgr: KVCacheManager,
                 connector=None):
        self.config = config
        self.kv = kv_mgr
        self.waiting: List[Request] = []
        self.running: List[Request] = []
        self.requests: Dict[int, Request] = {}
        self.stats = SchedulerStats()
        # Optional KV-pool connector (the vLLM KVConnector integration the
        # reference documents at global_kv_pool.py:375-440): admission asks
        # it for a remote prefix; while the pull is in flight the request
        # sits in WAITING_FOR_REMOTE_KVS and other traffic keeps flowing.
        # Interface: ``start_pull(request) -> bool`` (True = async pull
        # started), ``poll(request) -> Optional[int]`` (None = still in
        # flight; else the pull landed — tokens now in the local cache).
        self.connector = connector
        self._pull_started: set = set()
        # Async scheduling (vLLM V1 async_scheduling): requests whose latest
        # output token is an unsynced PLACEHOLDER.  They must not be
        # preempted (their in-flight step writes their blocks) and their
        # block hashes must not extend over the placeholder.
        self._inflight: set = set()
        # SWAP-mode preemption backend (the engine): swap_out(req) -> bool
        # copies the victim's full blocks to host memory before the free;
        # swap_in(req) -> bool restores them into fresh device blocks.
        # None (or preemption_mode="recompute") => recompute-only.
        self.swapper = None

    # ---- queue ops ---------------------------------------------------------

    def add_request(self, request: Request) -> None:
        self.requests[request.req_id] = request
        request.status = RequestStatus.WAITING
        self.waiting.append(request)
        if self.config.policy == "priority":
            self.waiting.sort(key=lambda r: (r.priority, r.arrival_time))

    def abort_request(self, req_id: int) -> bool:
        req = self.requests.get(req_id)
        if req is None or req.is_finished:
            return False
        req.status = RequestStatus.FINISHED_ABORTED
        self.kv.free(req)
        self._pull_started.discard(req_id)
        self._inflight.discard(req_id)
        self.requests.pop(req_id, None)
        if req in self.waiting:
            self.waiting.remove(req)
        if req in self.running:
            self.running.remove(req)
        return True

    @property
    def has_unfinished(self) -> bool:
        return bool(self.waiting or self.running)

    @property
    def kv_cache_usage(self) -> float:
        return self.kv.usage

    # ---- preemption ---------------------------------------------------------

    def _do_preempt(self, victim: Request) -> None:
        """Evict one running request's KV.  preemption_mode="swap" copies
        the victim's computed full blocks to host memory first (vLLM V1's
        SWAP mode, BLOG_PART3_V2.md:1589-1625) so resumption re-injects
        instead of re-prefilling; "recompute" (default) drops progress.
        Either way the device blocks free and the victim rejoins waiting."""
        if (self.config.preemption_mode == "swap" and self.swapper is not None
                and self.swapper.swap_out(victim)):
            self.stats.num_swapped_out += 1
        else:
            self.kv.free(victim)
            victim.preempt()
        self.stats.num_preempted += 1

    def _preempt_one(self, exclude: Request, protected: set) -> bool:
        """Free the lowest-priority / latest-arrival running request.

        Requests already scheduled this step are protected: preempting one
        would invalidate its staged slots/start_pos mid-step."""
        candidates = [
            r for r in self.running
            if r is not exclude and r.req_id not in protected
            and r.req_id not in self._inflight  # device still writing its blocks
        ]
        if not candidates:
            return False
        victim = max(candidates, key=lambda r: (r.priority, r.arrival_time, r.req_id))
        self.running.remove(victim)
        self._do_preempt(victim)
        self.waiting.insert(0, victim)
        return True

    def _allocate_with_preemption(
        self, req: Request, n: int, protected: set
    ) -> Optional[List[int]]:
        while True:
            got = self.kv.allocate_slots(req, n)
            if got is not None:
                return got
            if not self.config.enable_preemption or not self._preempt_one(req, protected):
                return None

    # ---- the step ------------------------------------------------------------

    def schedule(self) -> List[ScheduledRequest]:
        budget = self.config.max_num_batched_tokens
        scheduled: List[ScheduledRequest] = []
        preempted_now: List[Request] = []
        protected: set = set()  # req_ids staged this step — not preemptable

        # Concurrent-partial-prefill limits (vLLM SchedulerConfig semantics,
        # BLOG_PART2_V2.md:1147-1198): a prefill that will NOT complete this
        # step is "partial"; max_num_partial_prefills caps how many run
        # concurrently, and at most one of them may be "long" (remaining >
        # long_prefill_token_threshold) so a huge prompt can't monopolize the
        # chunked-prefill budget ahead of short ones.  A long prompt's chunk
        # is additionally capped at the threshold, reserving budget for the
        # short requests admitted after it (TTFT fairness).
        partials = 0
        long_partials = 0

        def partial_prefill_ok(remaining: int, chunk: int) -> bool:
            if chunk >= remaining:
                return True  # completes this step — not a partial prefill
            cap = self.config.max_num_partial_prefills
            if cap and partials >= cap:
                return False
            thr = self.config.long_prefill_token_threshold
            if thr and remaining > thr and long_partials >= 1:
                return False
            return True

        def cap_chunk(remaining: int, chunk: int) -> int:
            thr = self.config.long_prefill_token_threshold
            if thr and remaining > thr:
                chunk = min(chunk, thr)
            # Quantize split chunks (final chunks pass through whole): on
            # TPU every chunk size is a distinct compiled program, and
            # budget fragmentation otherwise mints near-arbitrary sizes
            # (see SchedulerConfig.chunk_quantum).  A zero result skips
            # this request until a full quantum of budget frees up.
            q = self.config.chunk_quantum
            if q and 2 * q <= self.config.max_num_batched_tokens \
                    and chunk < remaining:
                chunk = (chunk // q) * q
            return chunk

        def note_partial(remaining: int, chunk: int) -> None:
            nonlocal partials, long_partials
            if chunk < remaining:
                partials += 1
                thr = self.config.long_prefill_token_threshold
                if thr and remaining > thr:
                    long_partials += 1

        # Phase 0: requests whose remote-KV pull landed rejoin admission.
        if self.connector is not None:
            for req in self.waiting:
                if req.status is RequestStatus.WAITING_FOR_REMOTE_KVS:
                    if self.connector.poll(req) is not None:
                        req.status = RequestStatus.WAITING

        # Cold-burst prefill priority: when the prefill backlog exceeds what
        # one step's chunk budget can retire AND every running decode row is
        # itself a just-finished member of the same burst (<= 1 output
        # token), skip decode scheduling for this step.  Interleaving decode
        # rows through a long admission ramp desynchronizes row depths —
        # early finishers then ride the post-ramp pinned decode macros as
        # masked pad rows (a full weight stream for zero live tokens at the
        # window tail) — and every fused decode iteration inside a mixed
        # step streams the full weights to advance only the decode rows
        # (measured ~4.4 ms at the midsize shape vs ~22 ms for a whole
        # 2048-token chunk).  Holding the burst's decode rows until the ramp
        # drains keeps all depths aligned (the decode window then runs with
        # every macro row live) and leaves ramp steps streaming weights for
        # prefill FLOPs only.  TTFT is unaffected (first tokens sample at
        # each row's final prefill chunk).  Steady serving never holds: any
        # decode row with > 1 output token disables it, so ITL cannot stall
        # behind an arrival queue.  Forward progress is guaranteed: the hold
        # requires schedulable prefill work — running prefills (Phase 2
        # chunks them) or admissible waiting requests (Phase 3 admits them,
        # preempting unprotected — i.e. held — decode rows if the pool is
        # tight).
        hold_decodes = False
        if self.config.enable_chunked_prefill:
            pending_tokens = sum(
                r.num_tokens - r.num_computed_tokens
                for r in self.running
                if r.status is RequestStatus.RUNNING
                and (r.is_prefill or r.needs_catchup))
            # The backlog of a cold burst mostly sits in `waiting` (Phase 3
            # admits only as many chunks as the budget covers per step) —
            # count it only while admission is possible, so the hold can
            # never outlive schedulable prefill work.
            if len(self.running) < self.config.max_num_seqs:
                pending_tokens += sum(
                    r.num_tokens - r.num_computed_tokens
                    for r in self.waiting
                    if r.status is not RequestStatus.WAITING_FOR_REMOTE_KVS)
            if pending_tokens > self.config.max_num_batched_tokens:
                hold_decodes = all(
                    len(r.output_token_ids) <= 1 for r in self.running
                    if r.status is RequestStatus.RUNNING
                    and not (r.is_prefill or r.needs_catchup))

        # Phase 1: running decodes — one token each.  needs_catchup filters
        # preemption-resumed requests still recomputing their kept outputs
        # (they chunk in Phase 2; sampling from an un-caught-up position
        # would restart the sequence mid-stream).
        for req in list(self.running) if not hold_decodes else ():
            if (req.is_prefill or req.needs_catchup or budget <= 0
                    or req.status is not RequestStatus.RUNNING):
                continue
            # Async scheduling: a request whose max_new_tokens-th token is a
            # still-unsynced placeholder will finish at commit — don't grant
            # it another decode step.
            if len(req.output_token_ids) >= req.sampling.max_new_tokens:
                continue
            if self._allocate_with_preemption(req, 1, protected) is None:
                # Could not make room even with preemption: preempt req itself
                # — unless it still carries an unsynced async placeholder.
                # Preempting an inflight request would let it re-admit with a
                # PLACEHOLDER inside a catch-up chunk (packed as a real token
                # id) and would break swap_out's blocks-are-final invariant;
                # skip its step instead — the commit lands within async_depth
                # steps and clears the inflight mark (ADVICE r4 medium).
                if req.req_id in self._inflight:
                    continue
                self.running.remove(req)
                self._do_preempt(req)
                preempted_now.append(req)
                continue
            item = ScheduledRequest(req, 1, req.num_computed_tokens,
                                    target=req.num_tokens)
            item.slots = self.kv.slot_mapping(req, item.start_pos, 1)
            scheduled.append(item)
            protected.add(req.req_id)
            budget -= 1

        # Phase 2: running prefills — next chunk.  Catch-up of a resumed
        # request's kept outputs chunks here too (remaining spans prompt AND
        # outputs; the chunk reaching num_tokens samples the next NEW token,
        # exactly like prefill's last chunk samples the first).
        for req in list(self.running):
            if ((not req.is_prefill and not req.needs_catchup) or budget <= 0
                    or req.status is not RequestStatus.RUNNING
                    or req.req_id in protected):
                continue
            remaining = req.num_tokens - req.num_computed_tokens
            chunk = min(remaining, budget) if self.config.enable_chunked_prefill else remaining
            chunk = cap_chunk(remaining, chunk)
            if chunk <= 0 or chunk > budget or not partial_prefill_ok(remaining, chunk):
                continue
            if self._allocate_with_preemption(req, chunk, protected) is None:
                continue
            item = ScheduledRequest(req, chunk, req.num_computed_tokens,
                                    target=req.num_tokens)
            item.slots = self.kv.slot_mapping(req, item.start_pos, chunk)
            scheduled.append(item)
            protected.add(req.req_id)
            budget -= chunk
            note_partial(remaining, chunk)

        # Phase 3: admit waiting (FCFS / priority order).  A request blocked
        # only by the partial-prefill caps is SKIPPED (shorter prompts behind
        # it may still admit); capacity failures still stop admission (FCFS).
        idx = 0
        while (idx < len(self.waiting) and budget > 0
               and len(self.running) < self.config.max_num_seqs):
            req = self.waiting[idx]
            if req.status is RequestStatus.WAITING_FOR_REMOTE_KVS:
                idx += 1  # pull in flight; shorter requests may pass it
                continue
            # First sight of a fresh request: ask the global pool (async).
            if (self.connector is not None
                    and req.num_computed_tokens == 0 and not req.block_ids
                    and req.req_id not in self._pull_started):
                self._pull_started.add(req.req_id)
                if self.connector.start_pull(req):
                    req.status = RequestStatus.WAITING_FOR_REMOTE_KVS
                    idx += 1
                    continue
            # SWAP-mode resume: re-inject the victim's host-resident pages
            # into fresh device blocks before anything else schedules for it.
            # The host pages are stashed so a same-step admission failure can
            # roll the injection back — otherwise a WAITING request (never a
            # preemption victim) would pin unreclaimable device blocks
            # (ADVICE r4 low).
            undo_swap = None
            if req.swapped_pages is not None:
                stash = (req.swapped_pages, req.num_swapped_tokens)
                if self.swapper is not None and self.swapper.swap_in(req):
                    self.stats.num_swapped_in += 1
                    undo_swap = stash
                elif self.running:
                    break  # pool still tight: wait for frees (FCFS)
                else:
                    # Nothing left to free — the swap can never fit (e.g.
                    # the pool shrank): fall back to recompute-from-zero.
                    req.preempt()
            # Prefix-cache lookup on first computation only.
            hits: List[int] = []
            if req.num_computed_tokens == 0 and not req.block_ids:
                hits, n_cached = self.kv.get_computed_blocks(req)
                if hits:
                    req.block_ids = list(hits)
                    req.num_computed_tokens = n_cached
                    req.num_cached_blocks = len(hits)
            # remaining spans prompt AND any outputs kept across preemption
            # (catch-up); for fresh requests num_tokens == num_prompt_tokens.
            remaining = req.num_tokens - req.num_computed_tokens
            chunk = min(remaining, budget) if self.config.enable_chunked_prefill else remaining
            chunk = cap_chunk(remaining, chunk)
            if chunk <= 0:
                # Budget fragment below the chunk quantum: stop admission
                # (FCFS) until a full quantum frees up next step.
                self._rollback_admission(req, hits, undo_swap)
                break
            if not partial_prefill_ok(remaining, chunk):
                self._rollback_admission(req, hits, undo_swap)
                idx += 1
                continue
            if chunk > budget:
                # whole-prompt admission doesn't fit this step
                self._rollback_admission(req, hits, undo_swap)
                break
            if self._allocate_with_preemption(req, chunk, protected) is None:
                self._rollback_admission(req, hits, undo_swap)
                break
            self.waiting.pop(idx)
            req.status = RequestStatus.RUNNING
            self.running.append(req)
            item = ScheduledRequest(req, chunk, req.num_computed_tokens,
                                    target=req.num_tokens)
            item.slots = self.kv.slot_mapping(req, item.start_pos, chunk)
            scheduled.append(item)
            protected.add(req.req_id)
            budget -= chunk
            note_partial(remaining, chunk)

        # Preempted-in-phase-1 requests rejoin the waiting queue head.
        for req in preempted_now:
            self.waiting.insert(0, req)

        self.stats.num_scheduled_steps += 1
        self.stats.num_scheduled_tokens += sum(s.num_new_tokens for s in scheduled)
        return scheduled

    def _rollback_admission(self, req: Request, hits: List[int],
                            undo_swap=None) -> None:
        """Undo a prefix-cache touch when admission fails (blocks stay cached),
        and roll back a same-step swap_in: the request stays WAITING and
        waiting requests are never preemption victims, so leaving the injected
        blocks attached would shrink the reclaimable pool (ADVICE r4 low).
        The stashed host pages are restored; the injection retries next step."""
        if hits:
            self.kv.pool.free_blocks(list(reversed(hits)))
            req.block_ids = []
            req.num_computed_tokens = 0
            req.num_cached_blocks = 0
        if undo_swap is not None:
            pages, ntok = undo_swap
            self.kv.free(req)
            req.preempt_swapped(pages, ntok)
            self.stats.num_swapped_in -= 1

    # ---- async scheduling (dispatch-before-sync) --------------------------------

    def update_async_dispatch(self, scheduled: List[ScheduledRequest]):
        """Advance request state for a step that was DISPATCHED but not yet
        synced (vLLM V1 async scheduling; the decode-macro analogue is
        engine._pump_async).  Produced tokens are appended as PLACEHOLDER and
        patched by ``update_async_commit`` one step later; the next schedule()
        therefore sees correct lengths without waiting for the device.

        Returns commit records: one ``(request, output_index)`` per produced
        token, ``None`` for mid-prefill chunks.  ``cache_blocks`` is skipped
        for placeholder-carrying requests — the chained block hashes must
        never be computed over a placeholder."""
        records = []
        for item in scheduled:
            req = item.request
            if req.is_finished:  # aborted between schedule and dispatch
                records.append(None)
                continue
            req.num_computed_tokens += item.num_new_tokens
            if item.produces_token:
                req.output_token_ids.append(PLACEHOLDER)
                records.append((req, len(req.output_token_ids) - 1))
                self._inflight.add(req.req_id)
            else:
                self.kv.cache_blocks(req)  # prompt tokens only — hash-safe
                records.append(None)
        return records

    def update_async_dispatch_macro(self, scheduled: List[ScheduledRequest],
                                    decode_items: List[ScheduledRequest],
                                    K: int):
        """Macro dispatch bookkeeping: the base step (``scheduled`` =
        prefill chunks + decode iteration 0), then K-1 further decode
        iterations per decode row — matching the engine's fused
        prefill + K-step decode program.  Record order mirrors the
        program's flat token layout: base step first, then iterations
        1..K-1 row-major."""
        records = self.update_async_dispatch(scheduled)
        for _k in range(1, K):
            for item in decode_items:
                req = item.request
                if req.is_finished:
                    records.append(None)
                    continue
                req.num_computed_tokens += 1
                req.output_token_ids.append(PLACEHOLDER)
                records.append((req, len(req.output_token_ids) - 1))
        return records

    def update_async_commit(self, records, sampled_tokens) -> List[tuple]:
        """Patch a synced step's real tokens into the placeholders and run
        the finish logic ``update`` would have run.  Mirrors update():
        EOS / max_new_tokens finishing, block freeing, prefix-cache publish —
        publish is skipped while a LATER placeholder exists (the successor's
        commit publishes once every token in the hash range is real)."""
        emitted = []
        for rec, tok in zip(records, sampled_tokens):
            if rec is None:
                continue
            req, idx = rec
            if req.is_finished or idx >= len(req.output_token_ids):
                continue  # aborted, or truncated by an earlier EOS commit
            tok = int(tok)
            req.output_token_ids[idx] = tok
            emitted.append((req.req_id, tok))
            sp = req.sampling
            if not sp.ignore_eos and tok == sp.eos_token_id:
                # Drop the wasted successor tokens dispatched past the EOS
                # (same shape as the decode macro's EOS-mid-macro handling).
                del req.output_token_ids[idx + 1:]
                req.status = RequestStatus.FINISHED_STOPPED
            elif idx + 1 >= sp.max_new_tokens:
                req.status = RequestStatus.FINISHED_LENGTH
            trailing_ph = any(
                t == PLACEHOLDER for t in req.output_token_ids[idx + 1:]
            )
            if not trailing_ph:
                self._inflight.discard(req.req_id)
            if req.is_finished:
                if not trailing_ph:
                    self.kv.cache_blocks(req)
                self.kv.free(req)  # deferred while a successor is in flight
                if req in self.running:
                    self.running.remove(req)
                self._pull_started.discard(req.req_id)
                self.requests.pop(req.req_id, None)
            elif not trailing_ph:
                self.kv.cache_blocks(req)
        return emitted

    # ---- post-forward update ---------------------------------------------------

    def update(
        self, scheduled: List[ScheduledRequest], sampled_tokens: List[int]
    ) -> List[tuple]:
        """Advance request state with this step's sampled tokens.

        Returns [(req_id, token)] for requests that emitted a token.
        Mirrors mini_vllm.py:312-337: a token counts only when the step
        computed through the end of the prompt (or was a decode); finish on
        EOS or max_new_tokens; blocks freed on finish.
        """
        emitted = []
        for item, tok in zip(scheduled, sampled_tokens):
            req = item.request
            if req.is_finished:  # aborted mid-step
                continue
            req.num_computed_tokens += item.num_new_tokens
            if not item.produces_token:
                self.kv.cache_blocks(req)
                continue
            req.output_token_ids.append(int(tok))
            emitted.append((req.req_id, int(tok)))
            sp = req.sampling
            if not sp.ignore_eos and int(tok) == sp.eos_token_id:
                req.status = RequestStatus.FINISHED_STOPPED
            elif len(req.output_token_ids) >= sp.max_new_tokens:
                req.status = RequestStatus.FINISHED_LENGTH
            if req.is_finished:
                self.kv.cache_blocks(req)
                self.kv.free(req)
                self.running.remove(req)
                self._pull_started.discard(req.req_id)
                # Drop the id->request entry too: a long-running server
                # otherwise accumulates every request ever served (same
                # leak class as _pull_started, ADVICE r2).
                self.requests.pop(req.req_id, None)
            else:
                self.kv.cache_blocks(req)
        return emitted
