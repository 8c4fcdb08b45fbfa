from byogan_tpu.compat.torch_ckpt import (  # noqa: F401
    generator_params_from_torch,
    critic_params_from_torch,
    generator_params_to_torch,
    critic_params_to_torch,
    load_torch_checkpoint,
)
