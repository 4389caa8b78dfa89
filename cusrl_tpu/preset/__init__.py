from cusrl_tpu.preset.optimizer import AdamFactory, AdamWFactory, SgdFactory
from cusrl_tpu.preset.ppo import PpoAgentFactory, RecurrentPpoAgentFactory, ppo_hook_suite
