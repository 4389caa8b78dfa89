from cusrl_tpu.zoo.experiment import ExperimentSpec
from cusrl_tpu.zoo.registry import (
    add_experiment_modules,
    get_experiment,
    list_experiments,
    load_experiment_modules,
    register_experiment,
    registry,
)
