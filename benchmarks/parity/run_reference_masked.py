"""Torch-reference recurrent/transformer PPO on velocity-masked Pendulum.

Usage: python run_reference_masked.py <recurrent|transformer> <seed> <out.jsonl>

Builds the reference's RecurrentPpoAgentFactory (cusrl/preset/ppo.py:186-298)
or a manual ActorCriticFactory around CausalTransformerEncoderLayer
(cusrl/nn/module/causal_attn.py:261-330 — the reference ships no transformer
preset) with the shared hyperparameters from masked_pendulum.py, and trains on
the SAME masked env both implementations use.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "ref_stubs"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, HERE)

import masked_pendulum as mp  # noqa: E402

import cusrl  # noqa: E402
from cusrl.environment.gym import GymVectorEnvAdapter  # noqa: E402
from cusrl.template.logger import Logger  # noqa: E402


class CaptureLogger(Logger):
    def __init__(self, out_path: str, **kwargs):
        super().__init__(**kwargs)
        self.out_path = out_path
        self._fh = open(out_path, "w")

    def _log_impl(self, data, iteration):
        self._fh.write(json.dumps({"iteration": int(iteration), **{k: float(v) for k, v in data.items()}}) + "\n")
        self._fh.flush()


def make_factory(algo: str):
    hp = mp.HPARAMS
    if algo == "recurrent":
        return _recurrent_factory(hp)
    return _transformer_factory(hp)


def _recurrent_factory(hp):
    from cusrl.preset.ppo import RecurrentPpoAgentFactory

    return RecurrentPpoAgentFactory(
        num_steps_per_update=hp["num_steps_per_update"],
        rnn_type=mp.RNN["rnn_type"].upper(),
        actor_num_layers=1,
        actor_hidden_size=mp.RNN["hidden_size"],
        critic_num_layers=1,
        critic_hidden_size=mp.RNN["hidden_size"],
        lr=hp["lr"],
        sampler_epochs=hp["sampler_epochs"],
        sampler_mini_batches=hp["sampler_mini_batches"],
        normalize_observation=hp["normalize_observation"],
        gae_gamma=hp["gae_gamma"],
        entropy_loss_weight=hp["entropy_loss_weight"],
        max_grad_norm=hp["max_grad_norm"],
        empty_cuda_cache=False,
    )


def _patch_flex_attention_for_cpu():
    """flex_attention has NO CPU backward (torch 2.13) — substitute an eager
    dense SDPA that reuses the reference's OWN mask_mod/score_mod semantics so
    the reference transformer trains on this host.  The mods are pure
    broadcastable tensor arithmetic (cusrl/nn/utils/attention.py:117-163)."""
    import types

    import torch

    import cusrl.nn.module.causal_attn as ca
    import cusrl.nn.utils.attention as ua

    def eager_block_mask(kv_mask, window_size, seq_len, q_segments=None, kv_segments=None):
        # Same body as the reference's mask_mod (attention.py:117-124); torch
        # advanced indexing broadcasts the [B,1,1,1]/[1,1,L,1]/[1,1,1,S] index
        # tensors, so the scalar-index semantics lift to dense tensors as-is.
        def mask_mod(b, h, q_idx, kv_idx):
            causal = kv_idx <= q_idx + window_size
            window = kv_idx >= q_idx
            valid = kv_mask[b, kv_idx]
            mask = causal & window & valid
            if q_segments is not None:
                mask = mask & (q_segments[b, q_idx] == kv_segments[b, kv_idx])
            return mask

        return types.SimpleNamespace(mask_mod=mask_mod)

    def eager_flex(q, k, v, score_mod=None, block_mask=None, scale=None, **_kw):
        bsz, heads, q_len, dim = q.shape
        kv_len = k.shape[2]
        scale = (1.0 / dim**0.5) if scale is None else scale
        scores = (q.float() @ k.float().transpose(-1, -2)) * scale
        b = torch.arange(bsz)[:, None, None, None]
        h = torch.arange(heads)[None, :, None, None]
        qi = torch.arange(q_len)[None, None, :, None]
        ki = torch.arange(kv_len)[None, None, None, :]
        if score_mod is not None:
            scores = score_mod(scores, b, h, qi, ki)
        if block_mask is not None:
            mask = block_mask.mask_mod(b, h, qi, ki)
            scores = scores.masked_fill(~mask, float("-inf"))
            weights = torch.softmax(scores, dim=-1)
            weights = torch.where(mask.any(-1, keepdim=True), weights, torch.zeros_like(weights))
        else:
            weights = torch.softmax(scores, dim=-1)
        return weights @ v.float()

    ca.flex_attention = eager_flex
    ca.causal_sliding_window_block_mask = eager_block_mask
    ua.causal_sliding_window_block_mask = eager_block_mask


def _transformer_factory(hp):
    import cusrl as c
    from cusrl.preset.optimizer import AdamFactory
    from cusrl.preset.ppo import ppo_hook_suite

    _patch_flex_attention_for_cpu()
    ActorCriticFactory = c.ActorCritic.Factory

    cfg = mp.TRANSFORMER
    backbone = c.CausalTransformerEncoderLayer.Factory(
        embed_dim=cfg["embed_dim"],
        num_heads=cfg["num_heads"],
        window_size=cfg["window"],
        layer_norm="post",
        gate_type="residual",
        rope_base=10000.0,
    )
    return ActorCriticFactory(
        num_steps_per_update=hp["num_steps_per_update"],
        actor_factory=c.Actor.Factory(
            backbone_factory=backbone,
            distribution_factory=c.NormalDist.Factory(),
        ),
        critic_factory=c.Value.Factory(backbone_factory=backbone),
        optimizer_factory=AdamFactory(defaults={"lr": hp["lr"]}),
        sampler=c.AutoMiniBatchSampler(
            num_epochs=hp["sampler_epochs"], num_mini_batches=hp["sampler_mini_batches"]
        ),
        hooks=ppo_hook_suite(
            normalize_observation=hp["normalize_observation"],
            gae_gamma=hp["gae_gamma"],
            entropy_loss_weight=hp["entropy_loss_weight"],
            max_grad_norm=hp["max_grad_norm"],
            empty_cuda_cache=False,
        ),
    )


def main():
    algo, seed, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    num_iterations = int(sys.argv[4]) if len(sys.argv) > 4 else mp.NUM_ITERATIONS

    cusrl.set_global_seed(seed)
    factory = make_factory(algo)

    from cusrl.template import Trainer

    trainer = Trainer(
        environment=lambda: GymVectorEnvAdapter(mp.make_masked_pendulum_vec(mp.NUM_ENVS)),
        agent_factory=factory,
        logger_factory=lambda: CaptureLogger(
            out_path, log_dir=os.path.join("/tmp/parity_ref_logs", f"masked_{algo}_{seed}"), name=""
        ),
        num_iterations=num_iterations,
        checkpoint_interval=10**9,
    )
    trainer.run_training_loop()
    print(f"reference masked run complete: {algo} seed={seed} -> {out_path}")


if __name__ == "__main__":
    main()
