"""cusrl_tpu recurrent/transformer PPO on velocity-masked Pendulum (the same
masked env + shared hyperparameters as run_reference_masked.py).

Usage: JAX_PLATFORMS=cpu python run_ours_masked.py <recurrent|transformer> <seed> <out.jsonl>
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))
sys.path.insert(0, HERE)

import jax

jax.config.update("jax_platforms", "cpu")

import masked_pendulum as mp  # noqa: E402

import cusrl_tpu  # noqa: E402
from cusrl_tpu.environment.gym import GymVectorEnvAdapter  # noqa: E402
from cusrl_tpu.template.logger import Logger  # noqa: E402


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
    common = dict(
        num_steps_per_update=hp["num_steps_per_update"],
        lr=hp["lr"],
        sampler_epochs=hp["sampler_epochs"],
        sampler_mini_batches=hp["sampler_mini_batches"],
        normalize_observation=hp["normalize_observation"],
        gae_gamma=hp["gae_gamma"],
        entropy_loss_weight=hp["entropy_loss_weight"],
        max_grad_norm=hp["max_grad_norm"],
    )
    if algo == "recurrent":
        return cusrl_tpu.RecurrentPpoAgentFactory(
            rnn_type=mp.RNN["rnn_type"],
            rnn_hidden_size=mp.RNN["hidden_size"],
            rnn_num_layers=1,
            mlp_hidden_dims=(),
            **common,
        )
    cfg = mp.TRANSFORMER
    # "transformer_post" reproduces the reference's exact layer semantics:
    # post-norm placement (the reference default, causal_attn.py:271) — the
    # round-4 parity gap traced to pre-vs-post norm, not the positional scheme
    # (rope-by-age == window-offset positions; tests/test_fused_block.py /
    # tests/test_attention.py positional-equivalence coverage).
    return cusrl_tpu.TransformerPpoAgentFactory(
        embed_dim=cfg["embed_dim"],
        num_heads=cfg["num_heads"],
        attention_window=cfg["window"],
        mlp_hidden_dims=(),
        use_rope=True,
        attention_norm_mode="post" if algo == "transformer_post" else "pre",
        **common,
    )


def main():
    algo, seed, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    num_iterations = int(sys.argv[4]) if len(sys.argv) > 4 else mp.NUM_ITERATIONS

    from cusrl_tpu.template.trainer import Trainer
    from cusrl_tpu.utils.misc import set_global_seed

    set_global_seed(seed)
    trainer = Trainer(
        environment=lambda: GymVectorEnvAdapter(mp.make_masked_pendulum_vec(mp.NUM_ENVS)),
        agent_factory=make_factory(algo),
        logger_factory=lambda *_a, **_k: CaptureLogger(
            out_path, log_dir=os.path.join("/tmp/parity_ours_logs", f"masked_{algo}_{seed}"), name=""
        ),
        num_iterations=num_iterations,
        checkpoint_interval=10**9,
        verbose=False,
    )
    trainer.run_training_loop()
    print(f"ours masked run complete: {algo} seed={seed} -> {out_path}")


if __name__ == "__main__":
    main()
