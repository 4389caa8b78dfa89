from cusrl_tpu.nn.kernels.banded_attention import banded_window_attention

__all__ = ["banded_window_attention"]
