"""Golden-value parity tests against the PyTorch reference implementation.

These tests import the reference (read-only at /root/reference) as an oracle,
convert its randomly-initialized state dicts through compat/torch_ckpt.py,
and compare forward passes element-wise.  This validates BOTH the converter
and every block's math (equalized scaling, AdaIN, minibatch-stddev quirks,
fade-in algebra, bilinear stencils) in one shot — SURVEY.md §4's
"golden-value tests vs PyTorch".

Skipped automatically when torch or the reference checkout is unavailable.
"""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, requires_reference

torch = pytest.importorskip("torch")

if REFERENCE_DIR not in sys.path:
    sys.path.insert(0, REFERENCE_DIR)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from byogan_tpu.compat.torch_ckpt import (  # noqa: E402
    critic_params_from_torch,
    critic_params_to_torch,
    generator_params_from_torch,
    generator_params_to_torch,
)
from byogan_tpu.core.resize import (  # noqa: E402
    avg_pool2x,
    resize_bilinear_torch,
    upsample2x_bilinear,
)
from byogan_tpu.models import Critic, Generator  # noqa: E402

TOL = dict(rtol=2e-4, atol=2e-4)


def to_nhwc(x: "torch.Tensor") -> np.ndarray:
    return x.detach().cpu().numpy().transpose(0, 2, 3, 1)


def from_nhwc(x: np.ndarray) -> "torch.Tensor":
    # np.array (not ascontiguousarray) so jax-backed non-writable inputs
    # are always copied — for C=1 the transpose can already be contiguous
    # and a pass-through would trip torch's non-writable-tensor warning.
    return torch.from_numpy(np.array(x.transpose(0, 3, 1, 2), order="C"))


@pytest.fixture(scope="module")
def ref_modules():
    import gan  # the reference model file, imported as an oracle

    torch.manual_seed(0)
    gen = gan.Generator().eval()
    critic = gan.Critic().eval()
    return gan, gen, critic


@requires_reference
def test_upsample2x_matches_torch():
    torch.manual_seed(1)
    for shape in [(2, 3, 4, 4), (1, 5, 7, 9), (3, 2, 16, 16)]:
        x = torch.randn(*shape)
        want = torch.nn.functional.interpolate(x, scale_factor=2, mode="bilinear")
        got = upsample2x_bilinear(jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=1e-5, atol=1e-6)


@requires_reference
def test_resize_bilinear_matches_torch():
    torch.manual_seed(2)
    x = torch.randn(2, 3, 16, 16)
    for out_size in [(16, 16), (8, 8), (32, 32), (11, 5)]:
        want = torch.nn.functional.interpolate(x, size=out_size, mode="bilinear")
        got = resize_bilinear_torch(jnp.asarray(to_nhwc(x)), *out_size)
        np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=1e-5, atol=1e-5)


@requires_reference
def test_avg_pool2x_matches_torch():
    torch.manual_seed(3)
    x = torch.randn(2, 3, 8, 8)
    want = torch.nn.functional.avg_pool2d(x, 2)
    got = avg_pool2x(jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=1e-6, atol=1e-6)


@requires_reference
@pytest.mark.parametrize("steps,alpha", [(1, None), (2, 0.3), (2, None), (3, 0.82)])
def test_generator_forward_parity(ref_modules, steps, alpha):
    gan, ref_gen, _ = ref_modules
    batch = 2
    torch.manual_seed(10 + steps)
    z = torch.randn(batch, 512)
    noise_t = [torch.randn(batch, 1, 4 * 2**i, 4 * 2**i) for i in range(steps)]

    with torch.no_grad():
        want = ref_gen.forward(z, noise=noise_t, steps=steps, alpha=alpha)

    params = {"params": generator_params_from_torch(ref_gen.state_dict())}
    gen = Generator()
    noise_j = [jnp.asarray(to_nhwc(n)) for n in noise_t]
    got = gen.apply(
        params,
        jnp.asarray(z.numpy()),
        noise_j,
        steps=steps,
        alpha=None if alpha is None else jnp.float32(alpha),
    )
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), **TOL)


@requires_reference
@pytest.mark.parametrize(
    "steps,alpha,batch", [(1, None, 4), (2, 0.4, 4), (3, None, 6), (2, 0.9, 3)]
)
def test_critic_forward_parity(ref_modules, steps, alpha, batch):
    """Covers fade-in blend, avg-pool path, minibatch-stddev (batch 4 exercises
    group_size=4; batches 3/6 exercise the non-divisible fallback and m>1)."""
    gan, _, ref_critic = ref_modules
    size = 4 * 2 ** (steps - 1)
    torch.manual_seed(20 + steps + batch)
    images = torch.randn(batch, 3, size, size)

    with torch.no_grad():
        want = ref_critic.forward(images, steps=steps, alpha=alpha)

    params = {"params": critic_params_from_torch(ref_critic.state_dict())}
    critic = Critic()
    got = critic.apply(
        params,
        jnp.asarray(to_nhwc(images)),
        steps=steps,
        alpha=None if alpha is None else jnp.float32(alpha),
    )
    np.testing.assert_allclose(
        np.asarray(got), want.detach().cpu().numpy(), **TOL
    )


@requires_reference
def test_converter_round_trip(ref_modules):
    """ours -> torch -> ours is the identity (and keys match exactly)."""
    _, ref_gen, ref_critic = ref_modules
    gparams = generator_params_from_torch(ref_gen.state_dict())
    gstate = generator_params_to_torch(gparams, data_parallel_prefix=False)
    want_keys = set(ref_gen.state_dict().keys())
    assert set(gstate.keys()) == want_keys
    gparams2 = generator_params_from_torch(gstate)
    leaves1, treedef1 = jax.tree_util.tree_flatten(gparams)
    leaves2, treedef2 = jax.tree_util.tree_flatten(gparams2)
    assert treedef1 == treedef2
    for v1, v2 in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    cparams = critic_params_from_torch(ref_critic.state_dict())
    cstate = critic_params_to_torch(cparams, data_parallel_prefix=False)
    assert set(cstate.keys()) == set(ref_critic.state_dict().keys())


@requires_reference
def test_converted_tree_matches_init_structure(ref_modules):
    """Converted torch params have exactly our init's tree structure/shapes."""
    _, ref_gen, ref_critic = ref_modules
    key = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 512))
    noise = [jnp.zeros((1, 4, 4, 1))]
    gen_shapes = jax.eval_shape(
        lambda: Generator().init(key, z, noise, steps=1)
    )["params"]
    converted = generator_params_from_torch(ref_gen.state_dict())
    want = jax.tree.map(lambda s: (s.shape), gen_shapes)
    got = jax.tree.map(lambda a: a.shape, converted)
    assert want == got

    crit_shapes = jax.eval_shape(
        lambda: Critic().init(key, jnp.zeros((4, 4, 4, 3)), steps=1)
    )["params"]
    cconverted = critic_params_from_torch(ref_critic.state_dict())
    assert jax.tree.map(lambda s: s.shape, crit_shapes) == jax.tree.map(
        lambda a: a.shape, cconverted
    )


@requires_reference
def test_generator_512px_full_depth_parity(ref_modules):
    """BASELINE.md fidelity target: 512x512 samples from a converted
    checkpoint match the PyTorch reference pixel-wise (steps=8, full depth,
    post-fade)."""
    gan, ref_gen, _ = ref_modules
    torch.manual_seed(99)
    z = torch.randn(1, 512)
    noise_t = [torch.randn(1, 1, 4 * 2**i, 4 * 2**i) for i in range(8)]
    with torch.no_grad():
        want = ref_gen.forward(z, noise=noise_t, steps=8, alpha=None)

    params = {"params": generator_params_from_torch(ref_gen.state_dict())}
    gen = Generator()
    noise_j = [jnp.asarray(to_nhwc(n)) for n in noise_t]
    got = gen.apply(params, jnp.asarray(z.numpy()), noise_j, steps=8, alpha=None)
    assert got.shape == (1, 512, 512, 3)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=5e-4, atol=5e-4)


@requires_reference
def test_critic_512px_full_depth_parity(ref_modules):
    """Full 8-stage critic forward at 512x512 matches the reference
    (exercises every block incl. minibatch-stddev at full depth)."""
    gan, _, ref_critic = ref_modules
    torch.manual_seed(123)
    images = torch.randn(4, 3, 512, 512)
    with torch.no_grad():
        want = ref_critic.forward(images, steps=8, alpha=0.6)

    params = {"params": critic_params_from_torch(ref_critic.state_dict())}
    critic = Critic()
    got = critic.apply(
        params, jnp.asarray(to_nhwc(images)), steps=8, alpha=jnp.float32(0.6)
    )
    np.testing.assert_allclose(
        np.asarray(got), want.detach().cpu().numpy(), rtol=5e-4, atol=5e-4
    )


@requires_reference
def test_reference_strict_loads_our_export(ref_modules):
    """The reference's OWN nn.Module consumes our exported state dict with
    strict=True and renders the same pixels — the export interop claim
    (cli/export.py) asserted at the torch API boundary, not just key sets."""
    gan, _, _ = ref_modules
    gen = Generator()
    key = jax.random.PRNGKey(41)
    z = jax.random.normal(jax.random.PRNGKey(42), (2, 512))
    noise = [
        jax.random.normal(jax.random.PRNGKey(43 + i), (2, 4 * 2**i, 4 * 2**i, 1))
        for i in range(2)
    ]
    params = gen.init(key, z, noise, steps=2)["params"]

    # Tensor conversion exactly as export_torch_checkpoint does it
    # (checkpoint.py) — the raw converter returns numpy; copy because
    # jax-backed arrays are non-writable and torch warns on them.
    state_dict = {
        k: torch.from_numpy(np.array(v))
        for k, v in generator_params_to_torch(
            params, data_parallel_prefix=False
        ).items()
    }
    ref = gan.Generator().eval()
    missing = ref.load_state_dict(state_dict, strict=True)
    assert not missing.missing_keys and not missing.unexpected_keys

    ours = gen.apply({"params": params}, z, noise, steps=2, alpha=None)
    with torch.no_grad():
        theirs = ref.forward(
            torch.from_numpy(np.array(z)),
            noise=[from_nhwc(np.asarray(n)) for n in noise],
            steps=2,
            alpha=None,
        )
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), to_nhwc(theirs), **TOL
    )
