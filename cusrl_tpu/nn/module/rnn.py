"""Recurrent backbones (counterpart of cusrl/nn/module/rnn.py:22-449).

TPU-native design: where the reference wraps cuDNN kernels and needs elaborate
split-and-pad/pack machinery to handle episode boundaries (cusrl/nn/utils/
recurrent.py:25-272), here the cell is a ``lax.scan`` body and done-driven memory
resets are a ``where`` on the carry — sequence-mode training is the SAME scan as
single-step rollout, so rollout/batch consistency holds by construction.

Memory layout: ``[N, num_layers, hidden]`` per tensor; LSTM memory is
``{"hidden": ..., "cell": ...}``.  Cell matmuls run on the MXU with fused gate
projections; state is kept float32 (recurrences are precision-sensitive) while
gate projections may run in bfloat16 via ``compute_dtype``.

Reset semantics match the rollout contract: the memory entering step ``t`` of a
sequence equals the post-step-``t-1`` memory with done-rows zeroed — exactly what
``Agent.step`` produces during collection.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Memory, Module, ModuleFactory, static_field

__all__ = ["Gru", "Lstm", "Rnn", "RnnFactory", "VanillaRnn"]


def _matmul(x, w, compute_dtype):
    if compute_dtype is not None:
        dtype = jnp.dtype(compute_dtype)
        return jnp.dot(x.astype(dtype), w.T.astype(dtype), preferred_element_type=jnp.float32)
    return jnp.dot(x.astype(jnp.float32), w.T, preferred_element_type=jnp.float32)


class _RnnBase(Module):
    """Shared machinery: layer stack, scan driver, done resets."""

    weights_ih: tuple[jax.Array, ...]  # per layer [G*H, C_in]
    weights_hh: tuple[jax.Array, ...]  # per layer [G*H, H]
    biases_ih: tuple[jax.Array, ...]
    biases_hh: tuple[jax.Array, ...]
    input_dim: int = static_field(default=0)
    hidden_size: int = static_field(default=0)
    num_layers: int = static_field(default=1)
    compute_dtype: str | None = static_field(default=None)

    is_recurrent = True

    @property
    def output_dim(self) -> int:
        return self.hidden_size

    # -- memory ---------------------------------------------------------------

    def init_memory(self, batch_size, dtype=jnp.float32) -> Memory:
        if isinstance(batch_size, int):
            batch_size = (batch_size,)
        return jnp.zeros((*batch_size, self.num_layers, self.hidden_size), dtype)

    # -- cell interface (single layer, single step) ----------------------------

    def _cell(self, layer: int, x, h):
        """Returns (output, new_h). ``h`` is this layer's state slice."""
        raise NotImplementedError

    def _split_memory(self, memory, layer):
        return memory[..., layer, :]

    def _merge_memory(self, slices):
        return jnp.stack(slices, axis=-2)

    def _step(self, x, memory):
        """One time step through all layers; returns (top_output, new_memory)."""
        new_slices = []
        out = x
        for layer in range(self.num_layers):
            h = self._split_memory(memory, layer)
            out, h_new = self._cell(layer, out, h)
            new_slices.append(h_new)
        return out, self._merge_memory(new_slices)

    def __call__(self, x, memory: Memory = None, *, sequential: bool = False, done=None, **kwargs):
        if memory is None:
            batch = x.shape[1] if sequential else x.shape[0]
            memory = self.init_memory(batch)
        if not sequential:
            out, new_memory = self._step(x, memory)
            return out, new_memory, {}

        # Sequence mode: scan over T with done-driven resets on the carry,
        # mirroring the rollout-time reset-after-step semantics.
        if done is None:
            done = jnp.zeros((*x.shape[:2], 1), bool)

        def body(carry, xs):
            x_t, done_t = xs
            out_t, carry = self._step(x_t, carry)
            carry = _reset_carry(carry, done_t)
            return carry, out_t

        final_memory, outputs = jax.lax.scan(body, memory, (x, done))
        return outputs, final_memory, {}


def _reset_carry(carry, done_t):
    def _reset(leaf):
        mask = done_t.reshape(done_t.shape[0], *(1,) * (leaf.ndim - 1))
        return jnp.where(mask, jnp.zeros_like(leaf), leaf)

    return jax.tree.map(_reset, carry)


class Gru(_RnnBase):
    def _cell(self, layer, x, h):
        h = h.astype(jnp.float32)
        gi = _matmul(x, self.weights_ih[layer], self.compute_dtype) + self.biases_ih[layer]
        gh = _matmul(h, self.weights_hh[layer], self.compute_dtype) + self.biases_hh[layer]
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new


class VanillaRnn(_RnnBase):
    def _cell(self, layer, x, h):
        h = h.astype(jnp.float32)
        pre = (
            _matmul(x, self.weights_ih[layer], self.compute_dtype)
            + self.biases_ih[layer]
            + _matmul(h, self.weights_hh[layer], self.compute_dtype)
            + self.biases_hh[layer]
        )
        h_new = jnp.tanh(pre)
        return h_new, h_new


Rnn = VanillaRnn


class Lstm(_RnnBase):
    def init_memory(self, batch_size, dtype=jnp.float32) -> Memory:
        if isinstance(batch_size, int):
            batch_size = (batch_size,)
        shape = (*batch_size, self.num_layers, self.hidden_size)
        return {"hidden": jnp.zeros(shape, dtype), "cell": jnp.zeros(shape, dtype)}

    def _split_memory(self, memory, layer):
        return {"hidden": memory["hidden"][..., layer, :], "cell": memory["cell"][..., layer, :]}

    def _merge_memory(self, slices):
        return {
            "hidden": jnp.stack([s["hidden"] for s in slices], axis=-2),
            "cell": jnp.stack([s["cell"] for s in slices], axis=-2),
        }

    def _cell(self, layer, x, hc):
        h = hc["hidden"].astype(jnp.float32)
        c = hc["cell"].astype(jnp.float32)
        gates = (
            _matmul(x, self.weights_ih[layer], self.compute_dtype)
            + self.biases_ih[layer]
            + _matmul(h, self.weights_hh[layer], self.compute_dtype)
            + self.biases_hh[layer]
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return h_new, {"hidden": h_new, "cell": c_new}


_NUM_GATES = {"gru": 3, "lstm": 4, "rnn": 1}
_CLASSES = {"gru": Gru, "lstm": Lstm, "rnn": VanillaRnn}


@dataclasses.dataclass
class RnnFactory(ModuleFactory):
    cell: str = "gru"
    hidden_size: int = 256
    num_layers: int = 1
    compute_dtype: str | None = None

    @property
    def is_recurrent(self) -> bool:
        return True

    def __call__(self, input_dim: int, output_dim: int | None, key: jax.Array) -> _RnnBase:
        cell = self.cell.lower()
        if cell not in _CLASSES:
            raise ValueError(f"Unsupported RNN cell '{self.cell}'")
        gates = _NUM_GATES[cell]
        h = self.hidden_size
        w_ih, w_hh, b_ih, b_hh = [], [], [], []
        bound = 1.0 / jnp.sqrt(h)
        for layer in range(self.num_layers):
            in_dim = input_dim if layer == 0 else h
            k1, k2, k3, k4, key = jax.random.split(key, 5)
            w_ih.append(jax.random.uniform(k1, (gates * h, in_dim), jnp.float32, -bound, bound))
            w_hh.append(jax.random.uniform(k2, (gates * h, h), jnp.float32, -bound, bound))
            b_ih.append(jax.random.uniform(k3, (gates * h,), jnp.float32, -bound, bound))
            b_hh.append(jax.random.uniform(k4, (gates * h,), jnp.float32, -bound, bound))
        return _CLASSES[cell](
            weights_ih=tuple(w_ih),
            weights_hh=tuple(w_hh),
            biases_ih=tuple(b_ih),
            biases_hh=tuple(b_hh),
            input_dim=input_dim,
            hidden_size=h,
            num_layers=self.num_layers,
            compute_dtype=self.compute_dtype,
        )


# Reference-style Factory attributes (cusrl module.Factory contract).
Gru.Factory = RnnFactory
Lstm.Factory = RnnFactory
VanillaRnn.Factory = RnnFactory
