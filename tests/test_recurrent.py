"""Recurrent backbone tests: rollout-vs-batch consistency (the key invariant),
memory reset semantics, sequence/step equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cusrl_tpu.nn.module.mlp import MlpFactory
from cusrl_tpu.nn.module.rnn import RnnFactory
from cusrl_tpu.nn.module.sequential import SequentialFactory
from tests.helpers import assert_module_consistency


@pytest.mark.parametrize("cell", ["gru", "lstm", "rnn"])
def test_sequence_mode_matches_stepwise(cell):
    factory = RnnFactory(cell=cell, hidden_size=16, num_layers=2)
    rnn = factory(8, None, jax.random.key(0))
    t, n = 12, 3
    x = jax.random.normal(jax.random.key(1), (t, n, 8))
    done = jax.random.uniform(jax.random.key(2), (t, n, 1)) < 0.2

    seq_out, seq_final, _ = rnn(x, rnn.init_memory(n), sequential=True, done=done)

    memory = rnn.init_memory(n)
    outs = []
    from cusrl_tpu.nn.base import reset_memory
    for step in range(t):
        out, memory, _ = rnn(x[step], memory)
        memory = reset_memory(memory, done[step])
        outs.append(out)
    step_out = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(seq_out), np.asarray(step_out), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(jax.tree.leaves(seq_final))),
        np.asarray(jnp.stack(jax.tree.leaves(memory))),
        atol=1e-5,
    )


def test_memory_reset_zeroes_done_rows():
    rnn = RnnFactory(cell="gru", hidden_size=8)(4, None, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (3, 4))
    _, memory, _ = rnn(x, rnn.init_memory(3))
    from cusrl_tpu.nn.base import reset_memory
    done = jnp.asarray([[True], [False], [True]])
    reset = reset_memory(memory, done)
    assert float(jnp.abs(reset[0]).sum()) == 0.0
    assert float(jnp.abs(reset[2]).sum()) == 0.0
    np.testing.assert_array_equal(np.asarray(reset[1]), np.asarray(memory[1]))


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_recurrent_ppo_module_consistency(cell):
    assert_module_consistency(RnnFactory(cell=cell, hidden_size=16), atol=1e-4)


def test_sequential_rnn_mlp_consistency():
    backbone = SequentialFactory(
        factories=(RnnFactory(cell="gru", hidden_size=16), MlpFactory(hidden_dims=(16,), ends_with_activation=True))
    )
    assert_module_consistency(backbone, atol=1e-4)
