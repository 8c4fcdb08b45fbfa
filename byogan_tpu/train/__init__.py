from byogan_tpu.train.config import TrainConfig, load_ini_config  # noqa: F401
from byogan_tpu.train.state import TrainState, create_train_state  # noqa: F401
from byogan_tpu.train.steps import make_train_step, make_eval_step  # noqa: F401
