"""Optimizer factory presets (counterpart of cusrl/preset/optimizer.py:9-40)."""

from cusrl_tpu.template.optimizer import AdamFactory, AdamWFactory, SgdFactory

__all__ = ["AdamFactory", "AdamWFactory", "SgdFactory"]
