"""Continuous-batching decode engine.

New TPU-native capability (BASELINE.json north star: "continuous batching
across hosts"); the reference has no serving path. Design:

* fixed ``num_slots`` decode batch — the jitted decode step has one static
  shape, compiled once;
* prompts prefill one-at-a-time at bucketed (power-of-two padded) lengths —
  a handful of prefill compilations — and their per-layer KV is inserted
  into the slot's cache rows;
* a Python scheduler admits requests into free slots between decode steps,
  samples (greedy or temperature), retires sequences on EOS/max_tokens.

Everything device-side is static-shape; the scheduler only moves O(batch)
scalars per step.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .decode import make_cache, model_step
from .. import models
from ..utils.logging import get_logger

logger = get_logger("serving")


@dataclasses.dataclass
class Request:
    prompt_ids: list[int]
    max_new_tokens: int = 32
    temperature: float = 0.0  # 0 -> greedy
    eos_token_id: int | None = None
    # filled by the engine:
    output_ids: list[int] = dataclasses.field(default_factory=list)
    done: bool = False


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _shard_cache(cache: dict, mesh, num_slots: int) -> dict:
    """Annotate the KV cache for dp×tp serving: arrays are
    ``(L, slots, kv_heads, max_len, ...)`` — slots shard over dp, kv heads
    over tp (matching the col-parallel k/v projections in
    `parallel/sharding.py`). Indivisible axes stay replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)

    def put(arr):
        spec = [None] * arr.ndim
        if arr.ndim >= 3:
            if num_slots % dp == 0:
                spec[1] = "dp"
            if arr.shape[2] % tp == 0:
                spec[2] = "tp"
        return jax.device_put(arr, NamedSharding(mesh, P(*spec)))

    return {k: put(v) for k, v in cache.items()}


class DecodeEngine:
    """Single-host continuous batching over one jitted decode step."""

    def __init__(
        self,
        params: dict,
        cfg,
        layer_qcfgs=None,
        num_slots: int = 4,
        max_len: int = 512,
        cache_dtype=jnp.bfloat16,
        rng_seed: int = 0,
        pallas_backend: dict | None = None,
        scan_layers: bool = False,
        mesh=None,
        consume_backend: bool = False,
        lm_head_width: int | None = None,
    ):
        """``pallas_backend``: packed kernel operands from
        `serving.pallas_backend.prepare_serving_params` — routes every linear
        through the fused W4A8 kernel instead of the software emulation.

        ``lm_head_width``: opt-in packed lm_head (8 → MXINT8 weight grid via
        the dequant-GEMM kernel; ~2.1× less head weight stream than the
        dense bf16 matmul — quality study in ROADMAP). Requires a
        ``pallas_backend``; the activation stays unquantized.

        ``scan_layers``: lax.scan layer loop (Llama/Mistral with a uniform
        per-layer config) — decoder compile time becomes depth-independent,
        which matters at 32-80 layers through a slow compiler path.

        ``mesh``: optional `jax.sharding.Mesh` with dp/tp axes — shards the
        KV cache's slot axis over dp and kv-head axis over tp (params should
        already be sharded with `parallel.shard_params`); GSPMD then runs
        the decode step fully distributed (dp × tp serving)."""
        self.params = params
        self.cfg = cfg
        self.qcfgs = layer_qcfgs
        self.num_slots = num_slots
        self.max_len = max_len
        self.cache = make_cache(cfg, num_slots, max_len, cache_dtype)
        if mesh is not None:
            self.cache = _shard_cache(self.cache, mesh, num_slots)
        self.lengths = np.zeros(num_slots, dtype=np.int32)  # tokens in cache
        self.slot_req: list[Request | None] = [None] * num_slots
        self.key = jax.random.PRNGKey(rng_seed)
        backend = pallas_backend
        if lm_head_width is not None and backend is not None:
            from .pallas_backend import pack_lm_head

            backend = pack_lm_head(backend, params, width=lm_head_width)
        self._scan = scan_layers
        if scan_layers:
            from ..models.config_expand import layer_qcfgs_uniform
            from .decode import stack_backend

            arch_mod = models.get_arch_module(cfg)
            self._stacked, self._rest = arch_mod.stack_layer_params(params, cfg)
            # consume_backend: the scan engine only uses the STACKED copy;
            # dropping the per-prefix arrays halves resident packed-weight
            # memory (~2.2 GB at 7B) for callers that opt in
            bs = stack_backend(backend, cfg, consume=consume_backend)
            self._bs_meta = None if bs is None else bs["meta"]
            self._bs_arrays = None if bs is None else bs["arrays"]
            if layer_qcfgs is None:
                layer_qcfg0 = None
            elif layer_qcfgs_uniform(layer_qcfgs):
                layer_qcfg0 = layer_qcfgs[0]
            else:
                # heterogeneous model_layer_{i} overrides: the step scans
                # per config segment (decode._scan_segments)
                layer_qcfg0 = list(layer_qcfgs)
        # only the packed arrays are traced jit arguments; tile sizes/formats
        # stay static via this closure
        b_arrays = None if backend is None else backend["arrays"]
        b_meta = None if backend is None else backend["meta"]

        def _mk_backend(arrs):
            return None if arrs is None else {"arrays": arrs, "meta": b_meta}

        def _mk_bs(arrs):
            return (None if arrs is None
                    else {"arrays": arrs, "meta": self._bs_meta})

        def _step_math(params_or_stack, backend_arrays, cache, ids, positions,
                       valid_lengths=None, fresh_prefill=False,
                       logits_last_only=False):
            if scan_layers:
                stacked, rest = params_or_stack
                from .decode import llama_step_scan, opt_step_scan

                step_scan = opt_step_scan if cfg.arch == "opt" \
                    else llama_step_scan
                return step_scan(
                    {}, ids, cache, positions, cfg, layer_qcfg0,
                    stacked=stacked, rest=rest,
                    backend_stacked=_mk_bs(backend_arrays),
                    valid_lengths=valid_lengths,
                    fresh_prefill=fresh_prefill,
                    logits_last_only=logits_last_only,
                )
            return model_step(
                params_or_stack, ids, cache, positions, cfg, layer_qcfgs,
                backend=_mk_backend(backend_arrays),
                valid_lengths=valid_lengths,
                fresh_prefill=fresh_prefill,
                logits_last_only=logits_last_only,
            )

        # cache donation: without it XLA materializes a full copy of the
        # multi-GB KV cache every step (read + write of the whole cache);
        # donated, the update happens in place. The engine immediately
        # rebinds self.cache to the returned buffer, so the consumed input
        # is never touched again.
        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_step(params, backend_arrays, cache, tokens, positions,
                        key, temps):
            logits, cache = _step_math(
                params, backend_arrays, cache, tokens[:, None], positions
            )
            logits = logits[:, 0, :]
            # sample on device for every slot in one pass (greedy + per-slot
            # temperature), so the host does ONE transfer per step instead of
            # a sync per slot
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            keys = jax.random.split(key, logits.shape[0])
            sampled = jax.vmap(
                lambda k, lg, t: jax.random.categorical(
                    k, lg / jnp.maximum(t, 1e-6))
            )(keys, logits, temps).astype(jnp.int32)
            tokens_out = jnp.where(temps > 0.0, sampled, greedy)
            return tokens_out, cache

        if scan_layers:
            feed = (self._stacked, self._rest)
            feed_b = self._bs_arrays
        else:
            feed = params
            feed_b = b_arrays
        self._decode_step = lambda p, c, t, pos, key, temps: decode_step(
            feed, feed_b, c, t, pos, key, temps)

        @functools.partial(jax.jit, static_argnames=("pad_len", "nb", "full"),
                           donate_argnums=(2,))
        def _prefill_impl(params, backend_arrays, cache, ids, slots, lengths,
                          pad_len, nb, full):
            # ids: (nb, pad_len) right-padded prompts; slots/lengths: (nb,).
            # Admission is BATCHED: all waiting prompts of one length bucket
            # prefill in a single forward (one compile per (nb, pad_len)
            # bucket), and the cache write is a per-slot scatter on the
            # donated buffer rather than a whole-cache copy.
            # ``full`` (static): the batch covers EVERY slot in order — skip
            # the per-slot gather/scatter entirely and return the fresh
            # cache (the scatter materialized a second full-size cache and
            # pushed the 7B × 8-slot × 2048 bf16 config over HBM; measured
            # RESOURCE_EXHAUSTED, round 4).
            del pad_len, nb
            positions = jnp.zeros((ids.shape[0],), jnp.int32)
            # fresh zeroed nb-slot cache: stale K/V from previous occupants
            # must not leak into shared-exponent groups (see model_step's
            # valid_lengths note). Key-generic so both the fp and the
            # MXINT8-quantized cache layouts work.
            def slot_axis(v):
                # per-slot scalars ("flushed") have the slot axis leading;
                # cache tensors carry it at axis 1 (after the layer axis)
                return 0 if v.ndim == 1 else 1

            if full:
                batch_cache = {k: jnp.zeros_like(v) for k, v in cache.items()}
            else:
                batch_cache = {
                    k: jnp.zeros_like(jnp.take(v, slots, axis=slot_axis(v)))
                    for k, v in cache.items()
                }
            logits, batch_cache = _step_math(
                params, backend_arrays, batch_cache, ids, positions,
                valid_lengths=lengths.astype(jnp.int32),
                # admission invariant: every admitted slot starts at
                # position 0 on a fresh-zeroed cache -> the prompt chunk
                # can attend through the fused prefill kernel
                fresh_prefill=True,
                # only the LAST valid position's distribution is consumed —
                # full-sequence f32 logits cost 2.1 GB at 7B x 8 x 2048
                # (the round-5 admission HBM OOM)
                logits_last_only=True,
            )
            if full:
                cache = batch_cache
            else:
                cache = {
                    k: (cache[k].at[slots].set(batch_cache[k])
                        if cache[k].ndim == 1
                        else cache[k].at[:, slots].set(batch_cache[k]))
                    for k in cache
                }
            last = logits[:, 0, :]  # (nb, vocab): last-valid-position only
            return last, cache

        def _prefill(p, c, ids, slots, lns, pad_len):
            full = bool(ids.shape[0] == num_slots
                        and np.array_equal(np.asarray(slots),
                                           np.arange(num_slots)))
            return _prefill_impl(feed, feed_b, c, ids, slots, lns, pad_len,
                                 ids.shape[0], full)

        self._prefill = _prefill

    # ------------------------------------------------------------------
    def _sample(self, logits: jnp.ndarray, temperature: float) -> int:
        if temperature <= 0.0:
            return int(jnp.argmax(logits))
        self.key, sub = jax.random.split(self.key)
        return int(jax.random.categorical(sub, logits / temperature))

    def _admit_batch(self, pairs: list[tuple[Request, int]]) -> list[int]:
        """Prefill every (request, slot) pair in ONE padded batch (one
        compile per (batch, pad_len) bucket; bounded by num_slots × length
        buckets) and return the first sampled token per request."""
        prepped = []
        for req, slot in pairs:
            ids = req.prompt_ids
            if len(ids) >= self.max_len:
                ids = ids[-(self.max_len - req.max_new_tokens - 1):]
            prepped.append((req, slot, ids))
        pad_len = min(_bucket(max(len(ids) for _, _, ids in prepped)),
                      self.max_len)
        nb = len(prepped)
        padded = np.zeros((nb, pad_len), dtype=np.int32)
        slots = np.zeros(nb, dtype=np.int32)
        lengths = np.zeros(nb, dtype=np.int32)
        for r, (req, slot, ids) in enumerate(prepped):
            padded[r, : len(ids)] = ids
            slots[r] = slot
            lengths[r] = len(ids)
        last_logits, self.cache = self._prefill(
            self.params, self.cache, jnp.asarray(padded), jnp.asarray(slots),
            jnp.asarray(lengths), pad_len,
        )
        toks = []
        for r, (req, slot, ids) in enumerate(prepped):
            self.lengths[slot] = len(ids)
            self.slot_req[slot] = req
            toks.append(self._sample(last_logits[r], req.temperature))
        return toks

    def run(self, requests: list[Request]) -> list[Request]:
        """Process all requests to completion; returns them with
        ``output_ids`` filled."""
        queue = list(requests)
        pending_token = np.zeros(self.num_slots, dtype=np.int32)
        active = np.zeros(self.num_slots, dtype=bool)

        def try_admit():
            pairs = []
            for s in range(self.num_slots):
                if not active[s] and queue:
                    pairs.append((queue.pop(0), s))
            if not pairs:
                return
            toks = self._admit_batch(pairs)
            for (req, s), tok in zip(pairs, toks):
                req.output_ids.append(tok)
                if req.eos_token_id is not None and tok == req.eos_token_id:
                    req.done = True
                    self.slot_req[s] = None
                    continue
                pending_token[s] = tok
                active[s] = True

        try_admit()
        while active.any() or queue:
            if not active.any():
                try_admit()
                continue
            tokens = jnp.asarray(pending_token)
            positions = jnp.asarray(self.lengths)
            temps = jnp.asarray(
                [self.slot_req[s].temperature if self.slot_req[s] else 0.0
                 for s in range(self.num_slots)], jnp.float32)
            self.key, sub = jax.random.split(self.key)
            tokens_out, self.cache = self._decode_step(
                self.params, self.cache, tokens, positions, sub, temps
            )
            toks = np.asarray(tokens_out)  # single host transfer per step
            self.lengths += active.astype(np.int32)
            for s in range(self.num_slots):
                if not active[s]:
                    continue
                req = self.slot_req[s]
                tok = int(toks[s])
                req.output_ids.append(tok)
                hit_eos = req.eos_token_id is not None and tok == req.eos_token_id
                if hit_eos or len(req.output_ids) >= req.max_new_tokens \
                        or self.lengths[s] + 1 >= self.max_len:
                    req.done = True
                    self.slot_req[s] = None
                    active[s] = False
                else:
                    pending_token[s] = tok
            try_admit()
        return requests


def generate(
    params: dict,
    cfg,
    prompt_ids: list[int],
    max_new_tokens: int = 32,
    layer_qcfgs=None,
    max_len: int = 256,
    temperature: float = 0.0,
    cache_dtype=jnp.bfloat16,
) -> list[int]:
    """One-shot convenience wrapper."""
    engine = DecodeEngine(params, cfg, layer_qcfgs, num_slots=1, max_len=max_len,
                          cache_dtype=cache_dtype)
    req = Request(prompt_ids=prompt_ids, max_new_tokens=max_new_tokens,
                  temperature=temperature)
    engine.run([req])
    return req.output_ids
