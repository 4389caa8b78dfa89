from cusrl_tpu.environment.gym import GymEnvAdapter, GymVectorEnvAdapter, make_gym_env, make_gym_vec
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
from cusrl_tpu.environment.isaaclab import IsaacLabEnvAdapter, IsaacLabEnvLauncher, TrainerCfg, make_isaaclab_env
from cusrl_tpu.environment.mjlab import MjlabEnvAdapter, MjlabPlayer, make_mjlab_env
from cusrl_tpu.environment.native import NativeCartPoleEnv, build_native_library
