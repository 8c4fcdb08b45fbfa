"""byogan_tpu — a TPU-native progressive-growing StyleGAN framework.

A ground-up JAX / Flax / Pallas / pjit rebuild of the capabilities of
MeMeBigProgrammer/BYO-GAN (reference mounted read-only at /root/reference):
progressive-growing StyleGAN training (4x4 -> 512x512 with fade-in alpha
blending), an 8-layer mapping network, AdaIN style modulation, per-layer noise
injection, equalized-learning-rate convolutions, minibatch-stddev, trained
with R1-regularized logistic or WGAN-GP losses.

Key design decisions (TPU-first, not a port):
  * NHWC layout everywhere on device; NCHW only at the PyTorch-parity boundary
    (compat/torch_ckpt.py).
  * Pure-functional models with explicit PRNG keys; one fused jitted train
    step per (progressive stage, fade-in?) compile bucket.
  * Data parallelism via jax.sharding.Mesh + jit sharding annotations, with
    optional tensor-parallel sharding of the mapping network / wide convs.
  * Pallas kernels for the fused noise-inject/LeakyReLU/AdaIN epilogue (and a
    conv3x3+epilogue variant), with pure-lax fallbacks and measured dispatch
    gates (ops/, benchmarks/RESULTS.md); minibatch-stddev deliberately stays
    lax — it is microseconds of VPU work on a (B,4,4,512) tensor.

Beyond reference parity (all default-off / additive — PARITY.md "opt-in
extensions"): EMA generator weights (train.config.ema_beta), SWD evaluation
(eval/, byogan-eval, in-training eval_step), W-space tools (truncation-psi,
style mixing, W-walks), latent projection (projector.py, byogan-project),
and unsupervised SeFa editing (editing.py, byogan-edit).
"""

__version__ = "0.1.0"

from byogan_tpu.models.generator import Generator  # noqa: F401
from byogan_tpu.models.critic import Critic  # noqa: F401
