from cusrl_tpu.logger.backends import Swanlab, Tensorboard, Wandb

__all__ = ["Swanlab", "Tensorboard", "Wandb"]
