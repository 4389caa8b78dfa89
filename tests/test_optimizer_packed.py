"""Packed-Adam path (CUSRL_TPU_PACKED_ADAM=1, default off — see
template/optimizer.py): bit-identical to the per-leaf optax chain (the math is
elementwise; packing only changes kernel granularity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusrl_tpu.template.optimizer import AdamFactory, SgdFactory, build_optimizer


def make_params(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "actor": {
            "w": jax.random.normal(k1, (48, 64), jnp.float32),
            "b": jax.random.normal(k2, (1, 64), jnp.float32),
        },
        "critic": {"w": jax.random.normal(k3, (48, 1), jnp.float32)},
    }


@pytest.mark.parametrize("grouped", [False, True])
def test_packed_matches_optax_chain(grouped, monkeypatch):
    monkeypatch.setenv("CUSRL_TPU_PACKED_ADAM", "1")
    params = make_params(jax.random.key(0))
    factory = AdamFactory(lr=1e-3)
    if grouped:
        factory = AdamFactory(lr=1e-3, param_groups={"critic": {"lr": 5e-4}})

    packed = build_optimizer(factory, params)
    assert packed.packed_adam is not None
    plain = build_optimizer(factory, params)
    plain.packed_adam = None  # force the general optax chain

    lrs_p = packed.init_learning_rates()
    lrs_g = plain.init_learning_rates()
    st_p = packed.init(params)
    st_g = plain.init(params)

    prm_p = prm_g = params
    for step in range(5):
        grads = jax.tree.map(
            lambda p: p * 0.01 + jax.random.normal(jax.random.fold_in(jax.random.key(9), step), p.shape) * 0.1,
            prm_p,
        )
        prm_p, st_p = packed.apply(grads, st_p, prm_p, lrs_p)
        prm_g, st_g = plain.apply(grads, st_g, prm_g, lrs_g)
        for a, b in zip(jax.tree.leaves(prm_p), jax.tree.leaves(prm_g)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_disabled_for_non_adam_and_mixed_moments(monkeypatch):
    monkeypatch.setenv("CUSRL_TPU_PACKED_ADAM", "1")
    params = make_params(jax.random.key(1))
    assert build_optimizer(SgdFactory(), params).packed_adam is None
    monkeypatch.setenv("CUSRL_TPU_PACKED_ADAM", "0")
    assert build_optimizer(AdamFactory(), params).packed_adam is None  # default off
    monkeypatch.setenv("CUSRL_TPU_PACKED_ADAM", "1")
    assert build_optimizer(AdamFactory(kwargs={"b1": 0.8}), params).packed_adam is not None
    mixed = {"actor": AdamFactory(), "critic": AdamFactory(kwargs={"b1": 0.8})}
    assert build_optimizer(mixed, params).packed_adam is None
    nonlr = AdamFactory(param_groups={"critic": {"lr": 1e-4, "b1": 0.5}})
    assert build_optimizer(nonlr, params).packed_adam is None


def test_packed_jit_and_rollback_compatible(monkeypatch):
    """opt_state stays an ordinary pytree: snapshot/restore (KL update
    rejection) and jit carry both work."""
    monkeypatch.setenv("CUSRL_TPU_PACKED_ADAM", "1")
    params = make_params(jax.random.key(2))
    opt = build_optimizer(AdamFactory(lr=1e-3), params)
    lrs = opt.init_learning_rates()
    st = opt.init(params)

    @jax.jit
    def step(prm, st):
        grads = jax.tree.map(lambda p: p * 0.05, prm)
        return opt.apply(grads, st, prm, lrs)

    snapshot = st
    prm, st = step(params, st)
    assert int(st["count"]) == 1
    prm, st = step(prm, snapshot)  # rollback then re-step
    assert int(st["count"]) == 1
