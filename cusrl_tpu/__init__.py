"""cusrl_tpu — a TPU-native composable on-policy RL framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the hook-oriented
CusRL framework (see SURVEY.md): algorithms are composable pipelines of pure-
functional hooks over one jitted train state, rollouts fuse policy and JAX-native
environments into a single lax.scan, and scaling rides a jax.sharding mesh.
"""

from cusrl_tpu import hook, nn, preset, sampler, template, testing, utils
from cusrl_tpu.nn import (
    Actor,
    ActorFactory,
    AdaptiveNormalDist,
    Mlp,
    MlpFactory,
    Module,
    NormalDist,
    OneHotCategoricalDist,
    RunningMeanStd,
    Value,
    ValueFactory,
)
from cusrl_tpu.preset import PpoAgentFactory, RecurrentPpoAgentFactory, TransformerPpoAgentFactory, ppo_hook_suite
from cusrl_tpu.sampler import AutoMiniBatchSampler, MiniBatchSampler, TemporalMiniBatchSampler
from cusrl_tpu.template import (
    ActorCritic,
    ActorCriticFactory,
    Agent,
    AgentFactory,
    Buffer,
    Environment,
    EnvironmentSpec,
    Hook,
    JaxEnvironment,
    Logger,
    LoggerFactory,
    Player,
    ScanRolloutDriver,
    Trainer,
    Trial,
    make_logger_factory,
)
from cusrl_tpu.export import (
    ExportedStatefulPolicy,
    InferencePolicy,
    InferenceWrapper,
    export_agent,
    load_exported_graph,
    load_exported_policy,
)
from cusrl_tpu.utils import CONFIG, Metrics, Rate, Timer, set_global_seed

__version__ = "0.1.0"
