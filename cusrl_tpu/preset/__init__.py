from cusrl_tpu.preset.optimizer import AdamFactory, AdamWFactory, SgdFactory
from cusrl_tpu.preset.ppo import (
    PpoAgentFactory,
    RecurrentPpoAgentFactory,
    TransformerPpoAgentFactory,
    ppo_hook_suite,
)
from cusrl_tpu.preset.amp import AmpAgentFactory
from cusrl_tpu.preset.distillation import DistillationAgentFactory, distillation_hook_suite
