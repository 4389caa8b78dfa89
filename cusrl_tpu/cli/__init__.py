from cusrl_tpu.cli import benchmark, export, find_trial, list_experiments, play, train
