from cusrl_tpu.logger.backends import Jsonl, Swanlab, Tensorboard, Wandb

__all__ = ["Jsonl", "Swanlab", "Tensorboard", "Wandb"]
