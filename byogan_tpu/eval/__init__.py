"""Evaluation metrics (TPU-native extension; the reference has none).

The reference offers no quantitative sample-quality readout — its only
evaluation is eyeballing the 5x5 grids train.py saves.  This package adds
the Progressive-GAN paper's own metric, multi-scale sliced Wasserstein
distance (SWD), chosen because it needs NO pretrained feature network
(FID/IS need Inception weights — unavailable offline) and runs entirely
on-device: Laplacian pyramid, patch gather, random projections, and the
per-direction sorts are all jitted XLA ops.

MS-SSIM (eval/msssim.py) complements it: pairwise multi-scale structural
similarity within the generated set reads out MODE COLLAPSE (mean score
-> 1.0 when the generator emits near-identical images), the failure SWD's
distribution distance is least sensitive to.  Also pretrained-free and
fully on-device.
"""

from byogan_tpu.eval.msssim import msssim, msssim_diversity
from byogan_tpu.eval.swd import sliced_wasserstein_distance, swd_summary

__all__ = [
    "msssim",
    "msssim_diversity",
    "sliced_wasserstein_distance",
    "swd_summary",
]
