from byogan_tpu.models.layers import (  # noqa: F401
    EqualizedDense,
    EqualizedConv,
    NoiseInjection,
    AdaIN,
    StyleConvBlock,
    StyleStage,
    MappingNetwork,
    MinibatchStdDev,
)
from byogan_tpu.models.generator import Generator, GENERATOR_CHANNELS  # noqa: F401
from byogan_tpu.models.critic import Critic, CRITIC_CHANNELS  # noqa: F401
