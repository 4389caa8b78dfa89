from cusrl_tpu.template.actor_critic import ActorCritic, ActorCriticFactory, AgentState
from cusrl_tpu.template.agent import Agent, AgentFactory
from cusrl_tpu.template.buffer import Buffer, Sampler
from cusrl_tpu.template.environment import (
    Environment,
    EnvironmentSpec,
    JaxEnvironment,
    get_done_indices,
    update_observation_and_state,
)
from cusrl_tpu.template.hook import Hook, HookComposite
from cusrl_tpu.template.optimizer import (
    AdamFactory,
    AdamWFactory,
    Optimizer,
    OptimizerFactory,
    SgdFactory,
    build_optimizer,
)
from cusrl_tpu.template.logger import Logger, LoggerFactory, make_logger_factory
from cusrl_tpu.template.player import Player, PlayerHook
from cusrl_tpu.template.rollout import ScanRolloutDriver
from cusrl_tpu.template.trainer import EnvironmentStats, Trainer, TrainerHook
from cusrl_tpu.template.trial import Trial
