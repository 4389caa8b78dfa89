from cusrl_tpu.nn.base import (
    Memory,
    Module,
    ModuleFactory,
    combine,
    frozen_field,
    partition,
    reset_memory,
    static_field,
    trainable_mask,
    tree_paths,
)
from cusrl_tpu.nn.layer.bijector import (
    Bijector,
    ExponentialBijector,
    IdentityBijector,
    SigmoidBijector,
    SoftplusBijector,
    make_bijector,
)
from cusrl_tpu.nn.layer.linear import ACTIVATIONS, Linear, get_activation
from cusrl_tpu.nn.layer.rms import RunningMeanStd
from cusrl_tpu.nn.module.actor import Actor, ActorFactory
from cusrl_tpu.nn.module.critic import Value, ValueFactory
from cusrl_tpu.nn.module.distribution import (
    AdaptiveNormalDist,
    AdaptiveNormalDistFactory,
    Distribution,
    NormalDist,
    NormalDistFactory,
    OneHotCategoricalDist,
    OneHotCategoricalDistFactory,
)
from cusrl_tpu.nn.module.mlp import Mlp, MlpFactory
from cusrl_tpu.nn.module.cnn import Cnn, CnnFactory
from cusrl_tpu.nn.module.rnn import Gru, Lstm, Rnn, RnnFactory, VanillaRnn
from cusrl_tpu.nn.module.sequential import Sequential, SequentialFactory
from cusrl_tpu.nn.module.simba import Simba, SimbaFactory
from cusrl_tpu.nn.module.stub import Identity, IdentityFactory, StubModule, StubModuleFactory
from cusrl_tpu.nn.layer.activation import DetachGradient, GeGlu, ParameterWrapper, SwiGlu
from cusrl_tpu.nn.layer.encoding import (
    LearnablePositionalEncoding,
    RotaryEmbedding,
    SinusoidalPositionalEncoding,
    alibi_slopes,
)
from cusrl_tpu.nn.layer.gate import GruGate, HighwayGate, InputGate, OutputGate, ResidualGate, make_gate
from cusrl_tpu.nn.layer.loss import GradientPenaltyLoss, L2RegularizationLoss, NormalNllLoss, gradient_penalty
from cusrl_tpu.nn.layer.mha import (
    FeedForward,
    MultiheadAttention,
    MultiheadCrossAttention,
    MultiheadSelfAttention,
    TransformerDecoderLayer,
    TransformerEncoderLayer,
    scaled_dot_product_attention,
)
from cusrl_tpu.nn.module.causal_attn import (
    CausalMultiheadSelfAttention,
    CausalTransformerEncoderLayer,
    CausalTransformerEncoderLayerFactory,
)
