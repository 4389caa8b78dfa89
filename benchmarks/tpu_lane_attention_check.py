"""Real-TPU validation + microbench for the cross-env lane attention kernel.

1. Mosaic compile + equality vs the XLA masked-SDPA reference at the
   transformer-bench training shapes (minibatch and full-rollout widths).
2. Grad equality through the custom VJP.
3. fwd+bwd timing vs the XLA reference chain (the round-3 micro-T kernel
   measured NEUTRAL — 5.49 vs 5.20 ms — because both were latency-bound on
   per-(env, head) micro-matmuls; the lane kernel's cross-env vectorization is
   the round-4 fix, ATTENTION_TPU.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def make_raw(n, h, t, w, d, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 5)
    s = w + t
    q = jax.random.normal(keys[0], (n, h, t, d), jnp.float32)
    k = jax.random.normal(keys[1], (n, h, s, d), jnp.float32)
    v = jax.random.normal(keys[2], (n, h, s, d), jnp.float32)
    done = jax.random.bernoulli(keys[3], 0.05, (n, t))
    q_seg = jnp.cumsum(jnp.pad(done.astype(jnp.int32), ((0, 0), (1, 0)))[:, :-1], axis=1)
    k_seg = jnp.concatenate([jnp.zeros((n, w), jnp.int32), q_seg], axis=1)
    k_valid = jnp.concatenate(
        [jax.random.bernoulli(keys[4], 0.7, (n, w)).astype(jnp.int32), jnp.ones((n, t), jnp.int32)], axis=1
    )
    return q, k, v, q_seg, k_seg, k_valid


def main():
    from cusrl_tpu.nn.kernels.lane_attention import _lane_reference, lane_window_attention

    emit(devices=[str(d) for d in jax.devices()])
    N, H, T, W, D = int(os.environ.get("LANE_N", 1024)), 4, 24, 16, 32
    q, k, v, q_seg, k_seg, k_valid = make_raw(N, H, T, W, D)

    ref = jax.jit(lambda *a: _lane_reference(*a, W, None))(q, k, v, q_seg, k_seg, k_valid)
    got = jax.jit(lambda *a: lane_window_attention(*a, window=W, use_pallas=True))(
        q, k, v, q_seg, k_seg, k_valid
    )
    err = float(jnp.max(jnp.abs(got - ref)))
    emit(probe="lane_fwd_max_abs_err", value=err, shapes=f"N{N} H{H} T{T} W{W} D{D}")
    assert err < 2e-2, err

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(jnp.sin(fn(q_, k_, v_)))

    g_ref = jax.jit(jax.grad(loss(lambda *a: _lane_reference(*a, q_seg, k_seg, k_valid, W, None)),
                             argnums=(0, 1, 2)))(q, k, v)
    g_got = jax.jit(jax.grad(loss(lambda *a: lane_window_attention(*a, q_seg, k_seg, k_valid, window=W,
                                                                   use_pallas=True)), argnums=(0, 1, 2)))(q, k, v)
    gerr = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(g_ref, g_got))
    emit(probe="lane_grad_max_abs_err", value=gerr)
    assert gerr < 5e-2, gerr

    # -- timing: fwd+bwd step (sum-loss) kernel vs XLA reference --------------
    def bench(fn, iters=50):
        f = jax.jit(jax.grad(loss(fn), argnums=(0, 1, 2)))
        out = f(q, k, v)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(q, k, v)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    ms_ref = bench(lambda *a: _lane_reference(*a, q_seg, k_seg, k_valid, W, None))
    ms_lane = bench(lambda *a: lane_window_attention(*a, q_seg, k_seg, k_valid, window=W, use_pallas=True))
    emit(probe="fwd_bwd_ms", xla_reference=round(ms_ref, 3), lane_kernel=round(ms_lane, 3), n=N)

    # primal-only timing (value-eval/KL pass shape: full rollout width)
    def bench_primal(fn, n_envs, iters=50):
        qq, kk, vv, qs, ks, kv = make_raw(n_envs, H, T, W, D, seed=1)
        f = jax.jit(lambda: fn(qq, kk, vv, qs, ks, kv))
        jax.block_until_ready(f())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    ms_ref_p = bench_primal(lambda *a: _lane_reference(*a, W, None), 4096)
    ms_lane_p = bench_primal(lambda *a: lane_window_attention(*a, window=W, use_pallas=True), 4096)
    emit(probe="primal_4096_ms", xla_reference=round(ms_ref_p, 3), lane_kernel=round(ms_lane_p, 3))

    # -- counterfactual-append ("next token") variant: Mosaic compile +
    # equality + primal timing at the bootstrap-pass shape (full rollout width)
    from cusrl_tpu.nn.kernels.lane_attention import (
        _next_token_reference,
        lane_next_token_attention,
    )

    n_envs = 4096
    qq, kk, vv, qs, ks, kv = make_raw(n_envs, H, T, W, D, seed=2)
    keys = jax.random.split(jax.random.PRNGKey(11), 2)
    k_self = jax.random.normal(keys[0], qq.shape, jnp.float32)
    v_self = jax.random.normal(keys[1], qq.shape, jnp.float32)
    # Arrays go in as ARGUMENTS (closures bake them into the HLO as constants
    # — at 4096-env shapes that overflows the remote-compile request body).
    ref_n = jax.jit(lambda *a: _next_token_reference(*a, W, None))(
        qq, k_self, v_self, kk, vv, qs, ks, kv
    )
    got_n = jax.jit(lambda *a: lane_next_token_attention(*a, window=W, use_pallas=True))(
        qq, k_self, v_self, kk, vv, qs, ks, kv
    )
    nerr = float(jnp.max(jnp.abs(got_n - ref_n)))
    emit(probe="next_token_fwd_max_abs_err", value=nerr, n=n_envs)
    assert nerr < 2e-2, nerr

    def bench_next(fn, iters=50):
        f = jax.jit(fn)
        args = (qq, k_self, v_self, kk, vv, qs, ks, kv)
        jax.block_until_ready(f(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    ms_ref_n = bench_next(lambda *a: _next_token_reference(*a, W, None))
    ms_lane_n = bench_next(lambda *a: lane_next_token_attention(*a, window=W, use_pallas=True))
    emit(probe="next_token_primal_4096_ms", xla_reference=round(ms_ref_n, 3),
         lane_kernel=round(ms_lane_n, 3))


if __name__ == "__main__":
    main()
