"""Real-TPU validation + timing of the fused PPO step mega-kernel at bench
shapes (Mosaic accepts things interpret mode can't check, and vice versa —
CLAUDE.md perf rules require on-hardware validation).

1. Correctness: fused_ppo_step Pallas vs XLA reference on the bench config
   ([24576, 48] -> (512, 256, 128) elu pair + 12-dim Gaussian head + value
   head): loss, metrics, and every parameter gradient.
2. Speed: scan-20 SGD steps over the full objective, mega-kernel vs the
   round-2 champion (fused_mlp_pair + XLA heads/loss tail), at several block
   sizes (swept IN-program; standalone sweeps lie about VMEM headroom).

Usage: python benchmarks/tpu_fused_ppo_check.py
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


def timeit(fn, *args, warmup=2, iters=20):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) * 1e3 / iters, compile_s


def make_problem(key, n, obs_dim, a_dim, hidden):
    dims = (obs_dim,) + hidden
    keys = jax.random.split(key, 16)
    ki = iter(keys)

    def params(k):
        ws, bs = [], []
        for i in range(len(dims) - 1):
            k, k1, k2 = jax.random.split(k, 3)
            ws.append(jax.random.normal(k1, (dims[i], dims[i + 1]), jnp.float32) / np.sqrt(dims[i]))
            bs.append(jax.random.normal(k2, (1, dims[i + 1]), jnp.float32) * 0.1)
        return tuple(ws), tuple(bs)

    wsa, bsa = params(next(ki))
    wsc, bsc = params(next(ki))
    latent = hidden[-1]
    wm = jax.random.normal(next(ki), (latent, a_dim), jnp.float32) * 0.2
    bm = jax.random.normal(next(ki), (1, a_dim), jnp.float32) * 0.1
    wv = jax.random.normal(next(ki), (latent, 1), jnp.float32) * 0.2
    bv = jax.random.normal(next(ki), (1, 1), jnp.float32) * 0.1
    std = jnp.exp(jax.random.normal(next(ki), (a_dim,), jnp.float32) * 0.2)
    xa = jax.random.normal(next(ki), (n, obs_dim), jnp.float32)
    xc = jax.random.normal(next(ki), (n, obs_dim), jnp.float32)
    action = jax.random.normal(next(ki), (n, a_dim), jnp.float32)
    advantage = jax.random.normal(next(ki), (n, 1), jnp.float32)
    returns = jax.random.normal(next(ki), (n, 1), jnp.float32)
    mean0 = jax.random.normal(next(ki), (n, a_dim), jnp.float32) * 0.1
    z = (action - mean0) / std
    old_logp = jnp.sum(
        -0.5 * jnp.square(z) - jnp.log(std) - 0.5 * np.log(2 * np.pi), axis=-1, keepdims=True
    )
    return dict(
        xa=xa, xc=xc, wsa=wsa, bsa=bsa, wsc=wsc, bsc=bsc, wm=wm, bm=bm, wv=wv, bv=bv,
        std=std, action=action, old_logp=old_logp, advantage=advantage, returns=returns,
    )


def main():
    from cusrl_tpu.nn.kernels.fused_mlp import fused_mlp_pair
    from cusrl_tpu.nn.kernels.fused_ppo_step import fused_ppo_step

    emit(devices=[str(d) for d in jax.devices()])
    N, OBS, A, HID = 24576, 48, 12, (512, 256, 128)
    p = make_problem(jax.random.key(0), N, OBS, A, HID)
    data = (p["xa"], p["xc"], p["action"], p["old_logp"], p["advantage"], p["returns"])
    params0 = (
        (p["wsa"], p["bsa"]), (p["wsc"], p["bsc"]),
        (p["wm"], p["bm"], p["wv"], p["bv"], p["std"]),
    )

    def objective(params, data, *, use_pallas, block_rows=512):
        (wsa, bsa), (wsc, bsc), (wm, bm, wv, bv, std) = params
        xa, xc, action, old_logp, advantage, returns = data
        loss, metrics = fused_ppo_step(
            xa, xc, wsa, bsa, wsc, bsc, wm, bm, wv, bv, std,
            action, old_logp, advantage, None, returns,
            0.2, 1.0, 0.5, "elu", True,
            loss_clip=None, use_pallas=use_pallas, block_rows=block_rows,
        )
        ent = jnp.sum(jnp.log(std) + 0.5 + 0.9189385332046727)
        return loss - 0.01 * ent, metrics

    # ---- 1. correctness on real TPU ---------------------------------------
    f_k = jax.jit(jax.value_and_grad(lambda prm: objective(prm, data, use_pallas=True), has_aux=True))
    f_r = jax.jit(jax.value_and_grad(lambda prm: objective(prm, data, use_pallas=False), has_aux=True))
    (loss_k, metrics_k), g_k = jax.block_until_ready(f_k(params0))
    (loss_r, metrics_r), g_r = jax.block_until_ready(f_r(params0))
    # Per-leaf error relative to the leaf's own gradient scale (a tiny
    # element's absolute wiggle is not a real error).
    worst = 0.0
    leaves_k = jax.tree_util.tree_flatten_with_path(g_k)[0]
    leaves_r = jax.tree_util.tree_flatten_with_path(g_r)[0]
    per_leaf = []
    for (path, a), (_, b) in zip(leaves_k, leaves_r):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = float(np.max(np.abs(b))) + 1e-12
        err = float(np.max(np.abs(a - b))) / scale
        per_leaf.append({"leaf": jax.tree_util.keystr(path), "rel_to_leaf_max": round(err, 5)})
        worst = max(worst, err)
    emit(
        check="correctness",
        loss_kernel=float(loss_k), loss_ref=float(loss_r),
        metrics_kernel=[float(m) for m in metrics_k], metrics_ref=[float(m) for m in metrics_r],
        worst_leaf_rel_err=worst,
        ok=bool(abs(float(loss_k) - float(loss_r)) < 2e-3 and worst < 0.05),
    )
    for row in per_leaf:
        emit(**row)

    # ---- 2. timing: scan-20 SGD steps -------------------------------------
    def step_factory(block_rows):
        def one(params, _):
            (loss, _m), grads = jax.value_and_grad(
                lambda prm: objective(prm, data, use_pallas=True, block_rows=block_rows), has_aux=True
            )(params)
            new = jax.tree.map(lambda w, g: w - 1e-6 * g, params, grads)
            return new, loss

        return jax.jit(lambda prm: jax.lax.scan(one, prm, None, length=20))

    # Round-2 champion: pair kernel + XLA heads/loss (what joint_eval does).
    def champ_objective(params, data):
        (wsa, bsa), (wsc, bsc), (wm, bm, wv, bv, std) = params
        xa, xc, action, old_logp, advantage, returns = data
        la, lc = fused_mlp_pair(xa, xc, wsa, bsa, wsc, bsc, "elu", True, skip_input_grad=True)
        mean = la.astype(jnp.float32) @ wm + bm
        vhat = lc.astype(jnp.float32) @ wv + bv
        z = (action - mean) / std
        logp = jnp.sum(-0.5 * jnp.square(z) - jnp.log(std) - 0.9189385332046727, axis=-1, keepdims=True)
        ratio = jnp.exp(logp - old_logp)
        clipped = jnp.clip(ratio, 0.8, 1.2)
        surr = -jnp.minimum(advantage * ratio, advantage * clipped).mean()
        vloss = jnp.square(vhat - returns).mean()
        ent = jnp.sum(jnp.log(std) + 0.5 + 0.9189385332046727)
        return surr + 0.5 * vloss - 0.01 * ent

    def champ_step(params, _):
        loss, grads = jax.value_and_grad(lambda prm: champ_objective(prm, data))(params)
        new = jax.tree.map(lambda w, g: w - 1e-6 * g, params, grads)
        return new, loss

    champ = jax.jit(lambda prm: jax.lax.scan(champ_step, prm, None, length=20))
    ms, compile_s = timeit(champ, params0)
    emit(variant="champion_pair_kernel_xla_tail", ms_per_step=ms / 20, compile_s=round(compile_s, 1))

    import cusrl_tpu.nn.kernels.fused_ppo_step as fps

    for mode, blocks in (("split", (512, 1024, 2048)), ("mono", (512, 1024))):
        fps._PPO_MODE = mode
        for block_rows in blocks:
            try:
                fn = step_factory(block_rows)
                ms, compile_s = timeit(fn, params0)
                emit(variant=f"{mode}_b{block_rows}", ms_per_step=ms / 20, compile_s=round(compile_s, 1))
            except Exception as e:  # noqa: BLE001
                emit(variant=f"{mode}_b{block_rows}", error=str(e)[:200])
    fps._PPO_MODE = "split"


if __name__ == "__main__":
    main()
