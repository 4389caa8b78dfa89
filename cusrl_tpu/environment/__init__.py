from cusrl_tpu.environment.gym import GymEnvAdapter, GymVectorEnvAdapter, make_gym_env, make_gym_vec
from cusrl_tpu.environment.locomotion import VelocityLocomotionEnv
