from cusrl_tpu.sampler.mini_batch_sampler import (
    AutoMiniBatchSampler,
    MiniBatchSampler,
    TemporalMiniBatchSampler,
)
