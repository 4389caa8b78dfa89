"""Action distributions (counterpart of cusrl/nn/module/distribution.py:33-366).

All distribution math is a float32 island regardless of the backbone compute
dtype, mirroring the reference's ``disable_autocast`` + ``LinearFp32`` policy:
heads are built with ``compute_dtype=None`` and parameters/log-probs are computed
in float32.  Distribution parameters are plain dicts of arrays so they store
directly into transitions/buffers.

API shape (functional):
    dist_params            = dist(backbone_feat)
    action, logp           = dist.sample(dist_params, key)
    logp                   = dist.compute_logp(dist_params, action)
    entropy                = dist.compute_entropy(dist_params)
    kl                     = dist.compute_kl_div(p_params, q_params)
    action                 = dist.determine(backbone_feat)
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from cusrl_tpu.nn.base import Module, static_field
from cusrl_tpu.nn.layer.bijector import Bijector, make_bijector
from cusrl_tpu.nn.layer.linear import Linear

__all__ = [
    "AdaptiveNormalDist",
    "AdaptiveNormalDistFactory",
    "Distribution",
    "DistributionFactory",
    "NormalDist",
    "NormalDistFactory",
    "OneHotCategoricalDist",
    "OneHotCategoricalDistFactory",
]

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


class Distribution(Module):
    """Abstract distribution head: backbone features -> action distribution."""

    mean_head: Linear

    @property
    def input_dim(self) -> int:
        return self.mean_head.input_dim

    @property
    def output_dim(self) -> int:
        return self.mean_head.output_dim

    def __call__(self, backbone_feat: jax.Array, **kwargs) -> dict[str, jax.Array]:
        raise NotImplementedError

    def sample(self, dist_params: dict[str, jax.Array], key: jax.Array):
        raise NotImplementedError

    def compute_logp(self, dist_params: dict[str, jax.Array], sample: jax.Array) -> jax.Array:
        raise NotImplementedError

    def compute_entropy(self, dist_params: dict[str, jax.Array], key: jax.Array | None = None) -> jax.Array:
        """Single-sample Monte-Carlo fallback (counterpart of the reference
        base's default, cusrl/nn/module/distribution.py:121-139): subclasses
        with closed forms override.  Pure-functional twist: pass ``key`` for a
        fresh estimate; without one a fixed key keeps the estimate
        deterministic per parameters (the torch reference draws from its
        global RNG instead)."""
        _, logp = self.sample(dist_params, jax.random.key(0) if key is None else key)
        return -logp

    def compute_kl_div(
        self, p: dict[str, jax.Array], q: dict[str, jax.Array], key: jax.Array | None = None
    ) -> jax.Array:
        """Single-sample MC fallback KL(p||q) (reference distribution.py:140-159)."""
        sample, logp = self.sample(p, jax.random.key(0) if key is None else key)
        logq = self.compute_logp(q, sample)
        return logp - logq

    def determine(self, backbone_feat: jax.Array, **kwargs) -> jax.Array:
        return self.mean_head(backbone_feat.astype(jnp.float32))

    def mode(self, dist_params: dict[str, jax.Array]) -> jax.Array:
        """Deterministic action from already-computed distribution parameters."""
        return dist_params["mean"]


def _normal_logp(mean, std, x):
    z = (x - mean) / std
    return jnp.sum(-0.5 * jnp.square(z) - jnp.log(std) - _LOG_SQRT_2PI, axis=-1, keepdims=True)


class _Normal(Distribution):
    """Shared diagonal-Gaussian math in float32."""

    def sample(self, dist_params, key):
        mean = dist_params["mean"].astype(jnp.float32)
        std = dist_params["std"].astype(jnp.float32)
        noise = jax.random.normal(key, mean.shape, jnp.float32)
        action = mean + std * noise
        return action, _normal_logp(mean, std, action)

    def compute_logp(self, dist_params, sample):
        mean = dist_params["mean"].astype(jnp.float32)
        std = dist_params["std"].astype(jnp.float32)
        return _normal_logp(mean, std, sample.astype(jnp.float32))

    def compute_entropy(self, dist_params):
        std = dist_params["std"].astype(jnp.float32)
        return jnp.sum(jnp.log(std) + 0.5 + _LOG_SQRT_2PI, axis=-1, keepdims=True)

    def compute_kl_div(self, p, q):
        mean1, std1 = p["mean"].astype(jnp.float32), p["std"].astype(jnp.float32)
        mean2, std2 = q["mean"].astype(jnp.float32), q["std"].astype(jnp.float32)
        var_ratio = jnp.square(std1 / std2)
        kl = 0.5 * (var_ratio + jnp.square((mean2 - mean1) / std2) - 1.0) - jnp.log(std1 / std2)
        return jnp.sum(kl, axis=-1, keepdims=True)


def _resolve_init_std(init_std: float | None) -> float:
    if init_std is None:
        return 1.0
    if init_std <= 0:
        raise ValueError("'init_std' must be positive")
    return init_std


class NormalDist(_Normal):
    """Gaussian with a state-independent learnable std vector (through a bijector)."""

    mean_head: Linear
    std_param: jax.Array
    bijector: Bijector = static_field(default_factory=lambda: make_bijector("exp"))

    def __call__(self, backbone_feat, **kwargs):
        feat = backbone_feat.astype(jnp.float32)
        mean = self.mean_head(feat)
        std = self.bijector(self.std_param.astype(jnp.float32))
        std = jnp.broadcast_to(std, mean.shape)
        return {"mean": mean, "std": std}


class AdaptiveNormalDist(_Normal):
    """Gaussian with a state-dependent std head; optional gradient detach of the
    std path (``backward=False`` detaches backbone features feeding std_head)."""

    mean_head: Linear
    std_head: Linear
    bijector: Bijector = static_field(default_factory=lambda: make_bijector("exp"))
    backward: bool = static_field(default=True)

    def __call__(self, backbone_feat, **kwargs):
        feat = backbone_feat.astype(jnp.float32)
        mean = self.mean_head(feat)
        std_feat = feat if self.backward else jax.lax.stop_gradient(feat)
        std = self.bijector(self.std_head(std_feat))
        return {"mean": mean, "std": std.astype(jnp.float32)}


class OneHotCategoricalDist(Distribution):
    """One-hot categorical with straight-through reparameterized samples."""

    mean_head: Linear

    def __call__(self, backbone_feat, **kwargs):
        return {"logits": self.mean_head(backbone_feat.astype(jnp.float32))}

    def _log_probs(self, logits):
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def sample(self, dist_params, key):
        logits = dist_params["logits"].astype(jnp.float32)
        index = jax.random.categorical(key, logits, axis=-1)
        hard = jax.nn.one_hot(index, logits.shape[-1], dtype=jnp.float32)
        # Straight-through estimator: forward = hard one-hot, backward = softmax.
        soft = jax.nn.softmax(logits, axis=-1)
        action = soft + jax.lax.stop_gradient(hard - soft)
        logp = jnp.sum(self._log_probs(logits) * hard, axis=-1, keepdims=True)
        return action, logp

    def compute_logp(self, dist_params, sample):
        logp = self._log_probs(dist_params["logits"])
        return jnp.sum(logp * sample.astype(jnp.float32), axis=-1, keepdims=True)

    def compute_entropy(self, dist_params):
        logp = self._log_probs(dist_params["logits"])
        return -jnp.sum(jnp.exp(logp) * logp, axis=-1, keepdims=True)

    def compute_kl_div(self, p, q):
        logp = self._log_probs(p["logits"])
        logq = self._log_probs(q["logits"])
        return jnp.sum(jnp.exp(logp) * (logp - logq), axis=-1, keepdims=True)

    def determine(self, backbone_feat, **kwargs):
        logits = self.mean_head(backbone_feat.astype(jnp.float32))
        return jax.nn.one_hot(jnp.argmax(logits, axis=-1), logits.shape[-1], dtype=jnp.float32)

    def mode(self, dist_params):
        logits = dist_params["logits"]
        return jax.nn.one_hot(jnp.argmax(logits, axis=-1), logits.shape[-1], dtype=jnp.float32)


# -- factories -------------------------------------------------------------------


@dataclasses.dataclass
class DistributionFactory:
    def __call__(self, input_dim: int, output_dim: int, key: jax.Array) -> Distribution:
        raise NotImplementedError


@dataclasses.dataclass
class NormalDistFactory(DistributionFactory):
    init_std: float | None = None
    bijector: str | None = "exp"

    def __call__(self, input_dim, output_dim, key):
        bij = make_bijector(self.bijector)
        init_param = bij.inverse(_resolve_init_std(self.init_std))
        return NormalDist(
            mean_head=Linear.init(key, input_dim, output_dim),
            std_param=jnp.full((output_dim,), init_param, jnp.float32),
            bijector=bij,
        )


@dataclasses.dataclass
class AdaptiveNormalDistFactory(DistributionFactory):
    init_std: float | None = None
    bijector: str | None = "exp"
    backward: bool = True

    def __call__(self, input_dim, output_dim, key):
        bij = make_bijector(self.bijector)
        mean_key, _ = jax.random.split(key)
        # std head starts at zero weights with bias = inverse(init_std), matching
        # the reference init (cusrl/nn/module/distribution.py:310-312).
        std_head = Linear(
            weight=jnp.zeros((output_dim, input_dim), jnp.float32),
            bias=jnp.full((output_dim,), bij.inverse(_resolve_init_std(self.init_std)), jnp.float32),
            compute_dtype=None,
        )
        return AdaptiveNormalDist(
            mean_head=Linear.init(mean_key, input_dim, output_dim),
            std_head=std_head,
            bijector=bij,
            backward=self.backward,
        )


@dataclasses.dataclass
class OneHotCategoricalDistFactory(DistributionFactory):
    def __call__(self, input_dim, output_dim, key):
        return OneHotCategoricalDist(mean_head=Linear.init(key, input_dim, output_dim))


# Reference-style Factory attributes (cusrl module.Factory contract).
NormalDist.Factory = NormalDistFactory
AdaptiveNormalDist.Factory = AdaptiveNormalDistFactory
OneHotCategoricalDist.Factory = OneHotCategoricalDistFactory
