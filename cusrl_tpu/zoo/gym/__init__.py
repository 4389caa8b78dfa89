from cusrl_tpu.zoo.gym import box2d, classic_control
