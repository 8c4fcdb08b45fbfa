"""End-to-end serving throughput: synthesis + streamed PNG encode, 512px."""
import json
import os
import tempfile
import time

import jax.numpy as jnp

from byogan_tpu.core.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    import jax

    from byogan_tpu.models.factory import ModelSpec, build_critic, build_generator
    from byogan_tpu.serve import Sampler
    from byogan_tpu.train.checkpoint import save_checkpoint
    from byogan_tpu.train.config import TrainConfig
    from byogan_tpu.train.state import create_train_state

    n = int(os.environ.get("BENCH_N", 128))
    tmp = tempfile.mkdtemp()
    spec = ModelSpec()
    config = TrainConfig(compute_dtype="bfloat16")
    state = create_train_state(config, build_generator(spec), build_critic(spec))
    state = state.replace(stage=8)
    ckpt = save_checkpoint(tmp, state, alpha=None, model_spec=spec)

    s = Sampler(ckpt, batch=32, seed=0)
    # warm (compile)
    s.sample(1)
    t0 = time.perf_counter()
    written = s.save_stream(os.path.join(tmp, "out"), n)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "serve_pngs_per_sec_512px",
        "value": round(written / dt, 2),
        "unit": "pngs/sec (synthesis+encode, 1 host core)",
        "n": written,
    }))


if __name__ == "__main__":
    main()
