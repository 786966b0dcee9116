"""Ring-staged KV cache (round 5, VERDICT r4 #2b): staged attention kernel
vs the unstaged kernel on the equivalent materialized cache, staging-write
byte parity, and the flush kernel's window RMW."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lqer_tpu.ops.pallas.cache_write import flush_stage_to_main
from lqer_tpu.ops.pallas.decode_attention import (
    decode_attention_quantized,
    decode_attention_quantized_staged,
)
from lqer_tpu.parallel.collectives import mx8_encode

NL, B, KVH, D, L, SW, G = 2, 2, 2, 32, 256, 64, 16
NREP = 2
H = KVH * NREP


def _rand_cache(key):
    """Random MXINT8 main cache (codes transposed, token axis last)."""
    vals = jax.random.normal(key, (NL, B, KVH, L, D))
    c, e = mx8_encode(vals, G, zero_fill=1.0)
    return jnp.swapaxes(c, -1, -2), jnp.swapaxes(e, -1, -2)


def _setup(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    kc, ke = _rand_cache(ks[0])
    vc, ve = _rand_cache(ks[1])
    positions = jnp.array([70, 37], jnp.int32)
    flushed = (positions // 32) * 32  # [64, 32]
    # staged tokens [flushed, pos) carry DIFFERENT values than the (stale)
    # main cache at those columns
    staged_vals_k = jax.random.normal(ks[2], (NL, B, KVH, SW, D))
    staged_vals_v = jax.random.normal(ks[3], (NL, B, KVH, SW, D))
    ksc_, kse_ = mx8_encode(staged_vals_k, G, zero_fill=1.0)
    vsc_, vse_ = mx8_encode(staged_vals_v, G, zero_fill=1.0)
    ksc = jnp.swapaxes(ksc_, -1, -2)
    kse = jnp.swapaxes(kse_, -1, -2)
    vsc = jnp.swapaxes(vsc_, -1, -2)
    vse = jnp.swapaxes(vse_, -1, -2)
    q = jax.random.normal(ks[4], (B, H, 1, D))
    kh = jax.random.normal(ks[5], (B, KVH, 1, D))
    vh = jax.random.normal(ks[6], (B, KVH, 1, D))
    return (kc, ke, vc, ve), (ksc, kse, vsc, vse), q, kh, vh, positions, \
        flushed


def _materialize(main, stage, kh, vh, positions, flushed):
    """Equivalent UNSTAGED cache: main with columns [flushed, pos] taken
    from the staging ring (token t at lane t % SW) and the fresh token's
    encoded rows at pos."""
    kc, ke, vc, ve = (np.array(a) for a in main)
    ksc, kse, vsc, vse = (np.array(a) for a in stage)
    khc_, khe_ = mx8_encode(kh, G, zero_fill=1.0)
    vhc_, vhe_ = mx8_encode(vh, G, zero_fill=1.0)
    khc, khe = np.array(khc_), np.array(khe_)
    vhc, vhe = np.array(vhc_), np.array(vhe_)
    for b in range(B):
        p, f = int(positions[b]), int(flushed[b])
        for t in range(f, p + 1):
            j = t % SW
            if t == p:
                kc[:, b, :, :, t] = khc[b, :, 0, :]
                ke[:, b, :, :, t] = khe[b, :, 0, :]
                vc[:, b, :, :, t] = vhc[b, :, 0, :]
                ve[:, b, :, :, t] = vhe[b, :, 0, :]
            else:
                kc[:, b, :, :, t] = ksc[:, b, :, :, j]
                ke[:, b, :, :, t] = kse[:, b, :, :, j]
                vc[:, b, :, :, t] = vsc[:, b, :, :, j]
                ve[:, b, :, :, t] = vse[:, b, :, :, j]
    return (jnp.asarray(kc), jnp.asarray(ke), jnp.asarray(vc),
            jnp.asarray(ve))


@pytest.mark.parametrize("li", [0, 1])
def test_staged_kernel_matches_unstaged_on_materialized_cache(li):
    main, stage, q, kh, vh, positions, flushed = _setup(li)
    attn, ksc2, kse2, vsc2, vse2 = decode_attention_quantized_staged(
        q, *main, *stage, kh, vh, positions, flushed,
        jnp.asarray([li], jnp.int32), scaling=0.25, interpret=True)
    full = _materialize(main, stage, kh, vh, positions, flushed)
    ref = decode_attention_quantized(
        q, *full, positions, scaling=0.25,
        layer_index=jnp.asarray([li], jnp.int32), interpret=True)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_staged_kernel_writes_fresh_token_bytes():
    main, stage, q, kh, vh, positions, flushed = _setup(3)
    _, ksc2, kse2, vsc2, vse2 = decode_attention_quantized_staged(
        q, *main, *stage, kh, vh, positions, flushed,
        jnp.asarray([0], jnp.int32), scaling=0.25, interpret=True)
    khc, khe = mx8_encode(kh, G, zero_fill=1.0)
    vhc, vhe = mx8_encode(vh, G, zero_fill=1.0)
    for b in range(B):
        r = int(positions[b]) % SW
        # every layer's staging gets the write (the kernel is layer-indexed
        # for the MAIN cache only; staging blocks are written per layer by
        # the scan) — here the single call updates the indexed layer AND
        # copies other layers' blocks through unchanged
        np.testing.assert_array_equal(
            np.asarray(ksc2)[0, b, :, :, r], np.asarray(khc)[b, :, 0, :])
        np.testing.assert_array_equal(
            np.asarray(kse2)[0, b, :, :, r], np.asarray(khe)[b, :, 0, :])
        np.testing.assert_array_equal(
            np.asarray(vsc2)[0, b, :, :, r], np.asarray(vhc)[b, :, 0, :])
        # lanes != r unchanged
        m = np.ones(SW, bool)
        m[r] = False
        np.testing.assert_array_equal(
            np.asarray(ksc2)[0, b, :, :, m],
            np.asarray(stage[0])[0, b, :, :, m])


def test_flush_moves_staged_blocks():
    main, stage, q, kh, vh, positions, flushed = _setup(5)
    # pretend the ring now holds tokens [flushed, new_flushed) to migrate
    old_flushed = flushed - 32          # [32, 0]
    new_flushed = flushed               # [64, 32]
    out = flush_stage_to_main(main, stage, old_flushed, new_flushed,
                              interpret=True)
    for i, (m, s) in enumerate(zip(main, stage)):
        m_np, s_np, o_np = np.asarray(m), np.asarray(s), np.asarray(out[i])
        for b in range(B):
            f, nf = int(old_flushed[b]), int(new_flushed[b])
            for t in range(L):
                src = s_np[:, b, :, :, t % SW] if f <= t < nf \
                    else m_np[:, b, :, :, t]
                np.testing.assert_array_equal(
                    o_np[:, b, :, :, t], src,
                    err_msg=f"array {i} slot {b} tok {t}")


def test_flush_straddling_window_boundary():
    main, stage, *_ = _setup(7)
    # span [96, 160) straddles the 128-lane boundary -> exercises pass w=1
    old_flushed = jnp.array([96, 96], jnp.int32)
    new_flushed = jnp.array([160, 128], jnp.int32)
    out = flush_stage_to_main(main, stage, old_flushed, new_flushed,
                              interpret=True)
    for i, (m, s) in enumerate(zip(main, stage)):
        m_np, s_np, o_np = np.asarray(m), np.asarray(s), np.asarray(out[i])
        for b in range(B):
            f, nf = int(old_flushed[b]), int(new_flushed[b])
            for t in range(L):
                src = s_np[:, b, :, :, t % SW] if f <= t < nf \
                    else m_np[:, b, :, :, t]
                np.testing.assert_array_equal(
                    o_np[:, b, :, :, t], src,
                    err_msg=f"array {i} slot {b} tok {t}")


def test_staged_streaming_matches_one_pass():
    """The streaming staged kernel (chunked L) must agree with the one-pass
    staged kernel on the same inputs (same staged write bytes, allclose
    attention up to the online-softmax accumulation order)."""
    from lqer_tpu.ops.pallas.decode_attention import (
        decode_attention_quantized_streaming_staged,
    )

    main, stage, q, kh, vh, positions, flushed = _setup(11)
    li = jnp.asarray([1], jnp.int32)
    ref_attn, *ref_stage = decode_attention_quantized_staged(
        q, *main, *stage, kh, vh, positions, flushed, li,
        scaling=0.25, interpret=True)
    got_attn, *got_stage = decode_attention_quantized_streaming_staged(
        q, *main, *stage, kh, vh, positions, flushed, li,
        scaling=0.25, l_chunk=64, interpret=True)
    for r, g in zip(ref_stage, got_stage):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
    np.testing.assert_allclose(np.asarray(got_attn), np.asarray(ref_attn),
                               rtol=2e-5, atol=2e-5)
