"""Probe: how much of the per-step tail is per-leaf optimizer/clip launch
overhead?  Compares the current per-leaf optax Adam + global-norm clip against
a PACKED single-vector implementation at bench shapes (two (48,512,256,128)
nets + heads ~ 375k params, 20 minibatch steps per iteration).
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
import optax


def emit(**kw):
    print(json.dumps(kw), flush=True)


def timeit(fn, *args, warmup=2, iters=30):
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


def main():
    emit(devices=[str(d) for d in jax.devices()])
    dims = (48, 512, 256, 128)
    shapes = []
    for net in range(2):
        for i in range(len(dims) - 1):
            shapes.append((dims[i], dims[i + 1]))
            shapes.append((1, dims[i + 1]))
    shapes += [(128, 12), (1, 12), (128, 1), (1, 1), (1, 12)]  # heads + std
    key = jax.random.key(0)
    params = []
    for i, shp in enumerate(shapes):
        key, k = jax.random.split(key)
        params.append(jax.random.normal(k, shp, jnp.float32) * 0.1)
    params = tuple(params)
    grads_like = jax.tree.map(lambda p: p * 0.01, params)

    # ---- (a) current path: per-leaf optax adam + per-leaf global-norm clip --
    tx = optax.scale_by_adam()
    opt_state0 = tx.init(params)

    def step_per_leaf(carry, _):
        prm, opt_state = carry
        g = jax.tree.map(lambda p: p * 0.01, prm)  # stand-in gradient
        gn = jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(g)))
        scale = jnp.minimum(1.0, 1.0 / (gn + 1e-6))
        g = jax.tree.map(lambda x: x * scale, g)
        updates, opt_state = tx.update(g, opt_state, prm)
        prm = jax.tree.map(lambda p, u: p - 2e-4 * u, prm, updates)
        return (prm, opt_state), gn

    f_a = jax.jit(lambda prm, st: jax.lax.scan(step_per_leaf, (prm, st), None, length=20))
    ms, cs = timeit(f_a, params, opt_state0)
    emit(variant="per_leaf_adam_clip", ms_per_iter=round(ms, 4), compile_s=round(cs, 1))

    # ---- (b) packed single-vector adam + clip -------------------------------
    sizes = [int(np.prod(s)) for s in shapes]
    offsets = np.cumsum([0] + sizes)
    total = int(offsets[-1])

    def pack(tree):
        return jnp.concatenate([x.reshape(-1) for x in tree])

    def unpack(vec):
        return tuple(
            jax.lax.dynamic_slice_in_dim(vec, int(offsets[i]), sizes[i], 0).reshape(shapes[i])
            for i in range(len(shapes))
        )

    def step_packed(carry, _):
        vec, m, v, count = carry
        prm = unpack(vec)
        g_tree = jax.tree.map(lambda p: p * 0.01, prm)  # same stand-in gradient
        g = pack(g_tree)
        gn = jnp.sqrt(jnp.sum(jnp.square(g)))
        g = g * jnp.minimum(1.0, 1.0 / (gn + 1e-6))
        count = count + 1
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * jnp.square(g)
        mh = m / (1 - 0.9**count)
        vh = v / (1 - 0.999**count)
        vec = vec - 2e-4 * (mh / (jnp.sqrt(vh) + 1e-8))
        return (vec, m, v, count), gn

    vec0 = pack(params)
    f_b = jax.jit(
        lambda vec: jax.lax.scan(
            step_packed, (vec, jnp.zeros_like(vec), jnp.zeros_like(vec), jnp.zeros((), jnp.float32)),
            None, length=20,
        )
    )
    ms, cs = timeit(f_b, vec0)
    emit(variant="packed_adam_clip", ms_per_iter=round(ms, 4), compile_s=round(cs, 1))

    # ---- (c) packed adam, grads arrive as a per-leaf TREE (realistic:
    # value_and_grad emits leaves) — measures pack() overhead in the loop.
    def step_packed_tree(carry, _):
        vec, m, v, count = carry
        prm = unpack(vec)
        g_tree = jax.tree.map(lambda p: p * 0.01, prm)
        g = pack(g_tree)
        gn = jnp.sqrt(jnp.sum(jnp.square(g)))
        g = g * jnp.minimum(1.0, 1.0 / (gn + 1e-6))
        count = count + 1
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * jnp.square(g)
        mh = m / (1 - 0.9**count)
        vh = v / (1 - 0.999**count)
        vec = vec - 2e-4 * (mh / (jnp.sqrt(vh) + 1e-8))
        return (vec, m, v, count), gn

    f_c = jax.jit(
        lambda vec: jax.lax.scan(
            step_packed_tree, (vec, jnp.zeros_like(vec), jnp.zeros_like(vec), jnp.zeros((), jnp.float32)),
            None, length=20,
        )
    )
    ms, cs = timeit(f_c, vec0)
    emit(variant="packed_adam_tree_grads", ms_per_iter=round(ms, 4), compile_s=round(cs, 1))


if __name__ == "__main__":
    main()
