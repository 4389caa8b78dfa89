from cusrl_tpu.sampler.mini_batch_sampler import (
    AutoMiniBatchSampler,
    MiniBatchSampler,
    TemporalMiniBatchSampler,
)
from cusrl_tpu.sampler.random_sampler import AutoRandomSampler, RandomSampler, TemporalRandomSampler
