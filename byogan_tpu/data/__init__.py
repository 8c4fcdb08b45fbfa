from byogan_tpu.data.pipeline import StageDataset, make_stage_loader  # noqa: F401
from byogan_tpu.data.prep import prepare_pyramid  # noqa: F401
from byogan_tpu.data.synthetic import write_synthetic_dataset  # noqa: F401
