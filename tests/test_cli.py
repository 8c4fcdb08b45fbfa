"""CLI surface tests: prep / train / generate_samples / interpolate."""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from byogan_tpu.cli import generate_samples, interpolate, prep
from byogan_tpu.data.synthetic import write_synthetic_dataset
from byogan_tpu.train.checkpoint import save_checkpoint
from byogan_tpu.train.state import create_train_state
from tests.conftest import build, small_config


@pytest.fixture(scope="module")
def small_ckpt(tmp_path_factory):
    """A saved checkpoint from factory-built tiny models at stage 2 (8x8);
    its ModelSpec travels in the meta so CLIs rebuild the right arch."""
    from byogan_tpu.models.factory import ModelSpec, build_critic, build_generator

    spec = ModelSpec(num_stages=3, channel_divisor=16, mapping_depth=2)
    config = small_config()
    gen, critic = build_generator(spec), build_critic(spec)
    state = create_train_state(config, gen, critic)
    state = state.replace(iters=jnp.int32(11), stage=2)
    path = save_checkpoint(
        str(tmp_path_factory.mktemp("ckpt")), state, alpha=None, model_spec=spec
    )
    return path


def test_prep_cli(tmp_path, capsys):
    root = str(tmp_path / "ds")
    write_synthetic_dataset(root, n_images=6, size=8)
    prep.main([root, "4", "8", "--yes"])
    out = capsys.readouterr().out
    assert "dataset ready: 2 resolution sets" in out
    assert os.path.isdir(os.path.join(root, "prepared", "set_2", "images"))


def test_generate_samples_cli(small_ckpt, tmp_path, capsys):
    out_dir = str(tmp_path / "samples")
    os.makedirs(out_dir)
    generate_samples.main(
        [small_ckpt, "5", "-o", out_dir, "-z", "32", "-t", "0.5", "--seed", "0"]
    )
    files = sorted(glob.glob(os.path.join(out_dir, "image_*.png")))
    assert len(files) == 5
    # reference naming: image_1.png .. image_5.png (generate_samples.py:58)
    assert os.path.basename(files[0]) == "image_1.png"
    from PIL import Image

    with Image.open(files[0]) as im:
        assert im.size == (8, 8)  # stage 2 -> 8x8


def test_generate_samples_missing_output_dir(small_ckpt, tmp_path):
    with pytest.raises(OSError, match="path does not exist"):
        generate_samples.main([small_ckpt, "1", "-o", str(tmp_path / "nope")])


def test_interpolate_cli(small_ckpt, tmp_path, capsys):
    out_dir = str(tmp_path / "frames")
    interpolate.main(
        [small_ckpt, "-o", out_dir, "-n", "3", "-p", "5", "-z", "32"]
    )
    frames = sorted(glob.glob(os.path.join(out_dir, "image_*.png")))
    # (n-1) pairs x p frames = 2 x 5 = 10
    assert len(frames) == 10
    out = capsys.readouterr().out
    assert "wrote 10 frames" in out


def test_train_cli_reads_reference_config(tmp_path, monkeypatch):
    """main.py surface: config.txt section selection + checkpoint flag."""
    from byogan_tpu.cli import main as train_cli

    cfg = tmp_path / "config.txt"
    cfg.write_text(
        "[DEFAULT]\nbatch_progression=2,2\nepoch_progression=1,1\nlr=0.002\n"
        "[tiny]\ndata=/nonexistent\n"
    )
    captured = {}

    def fake_train(
        config, checkpoint=None, max_iters=None, allow_config_mismatch=False
    ):
        captured["config"] = config
        captured["checkpoint"] = checkpoint
        captured["allow_mismatch"] = allow_config_mismatch

    monkeypatch.setattr(train_cli, "train", fake_train)
    train_cli.main(["tiny", "--config-file", str(cfg), "-c", "some.pth"])
    assert captured["config"].learning_rate == 0.002
    assert captured["config"].data == "/nonexistent"
    assert captured["checkpoint"] == "some.pth"
    assert captured["allow_mismatch"] is False  # guard on unless --force-resume

    train_cli.main([
        "tiny", "--config-file", str(cfg), "-c", "some.pth", "--force-resume",
    ])
    assert captured["allow_mismatch"] is True


def test_export_cli_requires_reference_shape(small_ckpt, tmp_path):
    """Scaled architectures have no torch counterpart -> clean error."""
    from byogan_tpu.cli import export

    with pytest.raises(SystemExit, match="not the reference shape"):
        export.main([small_ckpt, str(tmp_path / "out.pth")])


def test_export_cli_full_size(tmp_path):
    torch = pytest.importorskip("torch")
    from byogan_tpu.cli import export
    from byogan_tpu.models.factory import ModelSpec, build_critic, build_generator

    spec = ModelSpec()  # reference shape
    config = small_config(noise_size=512)
    gen, critic = build_generator(spec), build_critic(spec)
    state = create_train_state(config, gen, critic)
    state = state.replace(iters=jnp.int32(5), stage=1)
    ckpt = save_checkpoint(str(tmp_path), state, alpha=0.25, model_spec=spec)

    out = str(tmp_path / "chk-5.pth")
    export.main([ckpt, out])
    save = torch.load(out, weights_only=False)
    assert save["step"] == 1 and save["alpha"] == 0.25
    assert "module.to_w_noise.0.layers.0.0.weight" in save["gen"]


def test_export_cli_ema(tmp_path):
    """--ema exports the EMA shadow into the .pth 'gen' slot; without EMA
    in the checkpoint it refuses."""
    torch = pytest.importorskip("torch")
    import jax

    from byogan_tpu.cli import export
    from byogan_tpu.models.factory import ModelSpec, build_critic, build_generator

    spec = ModelSpec()  # reference shape
    config = small_config(noise_size=512, ema_beta=0.9)
    gen, critic = build_generator(spec), build_critic(spec)
    state = create_train_state(config, gen, critic)
    # Make the shadow visibly different from the live weights.
    state = state.replace(
        gen_ema=jax.tree.map(lambda x: x + 1.0, state.gen_params),
        iters=jnp.int32(5), stage=1,
    )
    ckpt = save_checkpoint(str(tmp_path / "a"), state, alpha=None,
                           model_spec=spec)

    out = str(tmp_path / "ema.pth")
    export.main([ckpt, out, "--ema"])
    save = torch.load(out, weights_only=False)
    live = np.asarray(
        jax.tree.leaves(state.gen_params)[0], np.float32
    ).ravel()
    exported = save["gen"]["module.to_w_noise.0.layers.0.0.bias"].numpy()
    # exported values came from the shifted shadow, not the live weights
    assert not np.allclose(exported[: live.size][:4], live[:4])

    no_ema = create_train_state(
        small_config(noise_size=512), gen, critic
    ).replace(iters=jnp.int32(1), stage=1)
    ckpt2 = save_checkpoint(str(tmp_path / "b"), no_ema, alpha=None,
                            model_spec=spec)
    with pytest.raises(SystemExit, match="no EMA"):
        export.main([ckpt2, str(tmp_path / "x.pth"), "--ema"])
