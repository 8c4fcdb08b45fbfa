from byogan_tpu.core.random import truncated_noise, synthesis_noise  # noqa: F401
from byogan_tpu.core.resize import (  # noqa: F401
    upsample2x_bilinear,
    avg_pool2x,
    resize_bilinear_torch,
)
