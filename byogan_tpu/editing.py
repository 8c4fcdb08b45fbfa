"""Unsupervised W-space edit directions (SeFa-style closed-form
factorization).

The reference offers no editing tools at all; this extension derives
semantic directions WITHOUT any labels, data, or training: the top
eigenvectors of ``A A^T`` (a style_dim x style_dim matrix) where ``A``
stacks the AdaIN style-projection weights
(`stages_i/conv{1,2}/adain/style/weight`, each
``(style_dim, 2*channels)``) — the directions in W along which the
per-layer modulations change the most (Shen & Zhou, "Closed-Form
Factorization of Latent Semantics in GANs", 2021; method reimplemented
from the paper's description).  Restricting to a stage range localizes the
edit: early stages move coarse structure, late stages fine texture.

IMPORTANT: every checkpoint carries ALL stages' parameters from init
(models/generator.py builds full depth); pass ``trained_stages`` (the
checkpoint's ``step``) so the factorization excludes the random-init
stages beyond it — their noise otherwise contaminates the eigenvectors.

Pairs with the generator's style injection (models/generator.py) and the
projector (projector.py): invert an image to w, walk it along a direction,
re-synthesize.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def style_projection_matrix(
    gen_params,
    stages: Optional[Sequence[int]] = None,
    trained_stages: Optional[int] = None,
) -> np.ndarray:
    """Stack the AdaIN style-projection weights of the chosen stages.

    Returns ``(style_dim, sum 2*channels)``.  The equalized-LR runtime
    scale (sqrt(2/style_dim)) is identical for every projection, so it
    cancels in the eigendecomposition and is omitted.  ``trained_stages``
    (the checkpoint's ``step``) caps the default all-stages selection so
    random-init stages beyond it never enter (module docstring).
    """
    if stages is None and trained_stages is not None:
        stages = range(trained_stages)
    mats = []
    i = 0
    while f"stages_{i}" in gen_params:
        if stages is None or i in stages:
            stage = gen_params[f"stages_{i}"]
            for conv in ("conv1", "conv2"):
                mats.append(np.asarray(stage[conv]["adain"]["style"]["weight"]))
        i += 1
    if not mats:
        raise ValueError(f"no stages selected (generator has {i} stages)")
    return np.concatenate(mats, axis=1)


def sefa_directions(
    gen_params,
    k: int = 10,
    stages: Optional[Sequence[int]] = None,
    trained_stages: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-``k`` unit edit directions in W, strongest first.

    Returns ``(directions (k, style_dim), eigenvalues (k,))``; directions
    are orthonormal (eigenvectors of the symmetric ``A A^T``).  Pass
    ``trained_stages`` = the checkpoint's ``step`` unless ``stages`` is
    explicit (module docstring: untrained stages are random init).
    """
    a = style_projection_matrix(gen_params, stages, trained_stages)
    m = a @ a.T  # (style_dim, style_dim)
    vals, vecs = np.linalg.eigh(m)  # ascending
    order = np.argsort(vals)[::-1][:k]
    return vecs[:, order].T.copy(), vals[order].copy()


@functools.partial(
    jax.jit, static_argnames=("gen", "steps", "edit_stages", "w_plus")
)
def _render_sheet(
    gen, params, w_edit, w_orig, noise, steps, alpha, edit_stages, w_plus
):
    """Jitted sheet synthesis — module-level so repeated edit_sheet calls
    with the same shapes reuse the compiled program (a fresh jit closure
    per call would retrace every time; remote compiles cost minutes)."""
    if w_plus:
        # (N, steps, D): per-stage styles, each stage's row edited/original
        # according to the restriction.
        style = [
            w_edit[:, i, :]
            if edit_stages is None or i in edit_stages
            else w_orig[:, i, :]
            for i in range(steps)
        ]
    elif edit_stages is None:
        style = w_edit
    else:
        style = [
            w_edit if i in edit_stages else w_orig for i in range(steps)
        ]
    return gen.apply(
        params, None, list(noise), steps=steps, alpha=alpha, style=style
    ).astype(jnp.float32)


def edit_sheet(
    gen,
    params,
    w: jax.Array,
    direction: np.ndarray,
    steps: int,
    coeffs: Sequence[float],
    noise_seed: int = 0,
    edit_stages: Optional[Sequence[int]] = None,
    alpha: Optional[float] = None,
) -> jax.Array:
    """Render ``w`` walked along ``direction``: (B*len(coeffs), H, W, 3).

    Row-major: for each input w, one image per coefficient.  ``w`` is
    either ``(B, style_dim)`` or a W+ latent ``(B, steps, style_dim)``
    (byogan-project --w-plus output); in W+ every stage's vector walks the
    same direction.  With ``edit_stages`` given, only those stages receive
    the edited w (per-stage style injection); others keep the original — a
    localized edit.  ``alpha`` is the checkpoint's fade alpha (None = no
    blend).  Synthesis noise is fixed across the sheet.
    """
    from byogan_tpu.core.random import synthesis_noise

    w = jnp.asarray(w, jnp.float32)
    w_plus = w.ndim == 3
    if w_plus and w.shape[1] != steps:
        raise ValueError(
            f"W+ latent has {w.shape[1]} stage rows, checkpoint uses {steps}"
        )
    if edit_stages is not None and any(
        not 0 <= s < steps for s in edit_stages
    ):
        raise ValueError(
            f"edit_stages {list(edit_stages)} outside [0, {steps}) — an "
            "out-of-range restriction would silently render an unedited "
            "sheet"
        )
    d = jnp.asarray(direction, jnp.float32)
    batch = w.shape[0]
    cs = jnp.asarray(list(coeffs), jnp.float32)
    k = cs.shape[0]
    n = batch * k
    if w_plus:
        w_edit = (
            w[:, None, :, :] + cs[:, None, None] * d[None, None, None, :]
        ).reshape(n, steps, w.shape[-1])
    else:
        w_edit = (w[:, None, :] + cs[:, None] * d[None, None, :]).reshape(
            n, w.shape[-1]
        )
    w_orig = jnp.repeat(w, k, axis=0)
    one_noise = synthesis_noise(jax.random.PRNGKey(noise_seed), 1, steps)
    noise = tuple(
        jnp.broadcast_to(m, (n,) + m.shape[1:]) for m in one_noise
    )
    return _render_sheet(
        gen, params, w_edit, w_orig, noise, steps,
        None if alpha is None else jnp.float32(alpha),
        None if edit_stages is None else tuple(edit_stages),
        w_plus,
    )
