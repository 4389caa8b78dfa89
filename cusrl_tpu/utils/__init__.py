from cusrl_tpu.utils import distributed, nest
from cusrl_tpu.utils.config import CONFIG, configure_distributed, device_count, mesh
from cusrl_tpu.utils.dict_utils import from_dict, get_first, prefix_dict_keys, to_dict
from cusrl_tpu.utils.metrics import Metrics
from cusrl_tpu.utils.misc import MISSING, import_module, import_obj, new_key, set_global_seed, to_numpy
from cusrl_tpu.utils.scheduler import (
    CosineAnnealingScheduler,
    ExponentialScheduler,
    LessThan,
    NotLessThan,
    PiecewiseLinearScheduler,
    StepScheduler,
    TanhScheduler,
)
from cusrl_tpu.utils.timing import Rate, Timer, sync
