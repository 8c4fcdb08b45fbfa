"""Real 2-process multi-host smoke test (VERDICT r2 missing #1).

The multi-host story (SURVEY.md §2.6, parallel/mesh.py docstring) is:
``jax.distributed.initialize`` + one global mesh; every host seeds the same
global shuffle but decodes only its own row slice of each batch
(``make_stage_loader(process_index, process_count)``); the slices assemble
into one global jax.Array via ``jax.make_array_from_process_local_data``
(``device_prefetch``).  Until this script, that last branch
(pipeline.py device_prefetch, process_count > 1) and
``jax.distributed.initialize`` itself had never executed anywhere.

What runs here, all on one machine:
  * launcher (this file, no args): writes a tiny synthetic prepared dataset,
    then spawns THREE subprocesses of itself —
      - one single-process run with 8 virtual CPU devices (the oracle),
      - two coordinated workers, 4 virtual CPU devices each, that
        ``jax.distributed.initialize`` against a shared local coordinator
        (gloo CPU collectives, jax's default) into one 8-device cluster;
  * each worker builds the SAME data=8 mesh over the 8 global devices,
    shards the train state with the production rules, pulls batches through
    ``make_stage_loader(process_index=i, process_count=2)`` +
    ``device_prefetch(process_count=2)`` (asserting the assembled global
    batch is NOT fully addressable — proof the multi-host branch ran), and
    takes real ``make_train_step`` steps;
  * the launcher asserts both workers' per-step losses are finite and match
    the single-process oracle run.

Usage:
    PYTHONPATH=/root/repo python scripts/multihost_smoke.py
    # internal: --role worker --process-id {0,1} / --role single
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_STEPS = 3
SEED = 11


def _run_training_steps(process_id: int, process_count: int, data_root: str):
    """Shared worker body: mesh + sharded state + per-host loader + steps.

    Identical code for the single-process oracle (process_count=1) and the
    2-process cluster so the comparison isolates exactly the multi-host
    data path and cross-process collectives.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import numpy as np

    from byogan_tpu.data.pipeline import (
        device_prefetch,
        make_stage_loader,
        open_stage_dataset,
    )
    from byogan_tpu.parallel.mesh import make_mesh, shard_train_state
    from byogan_tpu.train.config import TrainConfig
    from byogan_tpu.train.loop import build_models
    from byogan_tpu.train.state import create_train_state
    from byogan_tpu.train.steps import make_train_step

    assert jax.device_count() == 8, jax.devices()
    assert jax.process_count() == process_count

    mesh = make_mesh(data=8)
    config = TrainConfig(
        data=data_root,
        noise_size=16,
        compute_dtype="float32",
        batch_progression=(8, 8),
        epoch_progression=(1, 1),
        channel_divisor=16,
        mapping_depth=2,
        seed=SEED,
    )
    gen, critic = build_models(config)
    state = create_train_state(config, gen, critic)
    state = shard_train_state(state, mesh)

    steps, batch = 2, 8
    dataset = open_stage_dataset(data_root, steps)
    loader = make_stage_loader(
        dataset,
        batch,
        seed=SEED * 100003 + steps * 1009,
        workers=2,
        process_index=process_id,
        process_count=process_count,
        epochs=None,
        # Production transport (train/loop.py): raw uint8 slices assemble
        # into the global array; the step normalizes on device.
        device_normalize=True,
    )
    sharding = NamedSharding(mesh, P("data", None, None, None))
    loader = device_prefetch(
        loader, sharding=sharding, process_count=process_count
    )

    step_fn = make_train_step(
        gen, critic, config,
        steps=steps, batch=batch, fade_in=100.0,
        critic_fade=(True,), gen_fade=True, donate=False,
    )

    c_losses, g_losses = [], []
    for i, real in enumerate(loader):
        if i >= N_STEPS:
            break
        assert real.shape == (batch, 8, 8, 3), real.shape
        assert real.dtype == jnp.uint8, real.dtype  # u8 crossed assembly
        if process_count > 1:
            # The make_array_from_process_local_data branch really ran: the
            # assembled global batch spans devices this process cannot see.
            assert not real.is_fully_addressable
        state, metrics = step_fn(state, real)
        c_losses.append(float(metrics["c_loss"]))
        g_losses.append(float(metrics["g_loss"]))
        assert np.isfinite(c_losses[-1]) and np.isfinite(g_losses[-1])
    return {
        "process_id": process_id,
        "process_count": process_count,
        "devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "c_losses": c_losses,
        "g_losses": g_losses,
    }


def _force_cpu():
    import jax

    # The axon TPU plugin force-selects its platform via jax.config — the
    # env var alone is not enough (CLAUDE.md).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")


def worker_main(process_id: int, coordinator: str, data_root: str) -> None:
    _force_cpu()
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=2,
        process_id=process_id,
        initialization_timeout=120,
    )
    result = _run_training_steps(process_id, 2, data_root)
    print("RESULT " + json.dumps(result), flush=True)
    jax.distributed.shutdown()


def single_main(data_root: str) -> None:
    _force_cpu()
    result = _run_training_steps(0, 1, data_root)
    print("RESULT " + json.dumps(result), flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _child_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={n_local_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    # Subprocesses need the axon site dir or jax dies with
    # "Unknown backend: axon" (CLAUDE.md); keep the repo importable too.
    extra = [REPO]
    if os.path.isdir("/root/.axon_site"):
        extra.append("/root/.axon_site")
    env["PYTHONPATH"] = os.pathsep.join(
        extra + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )
    return env


def _parse_result(proc: subprocess.CompletedProcess, tag: str) -> dict:
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-4000:])
        raise SystemExit(f"{tag} failed with rc={proc.returncode}")
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-4000:])
    raise SystemExit(f"{tag} produced no RESULT line")


def launcher_main(keep_json: str | None = None) -> dict:
    import numpy as np

    with tempfile.TemporaryDirectory(prefix="byogan_multihost_") as tmp:
        data_root = os.path.join(tmp, "data")
        prep = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--role",
                "prep",
                "--data-root",
                data_root,
            ],
            env=_child_env(1),
            capture_output=True,
            text=True,
            timeout=300,
        )
        if prep.returncode != 0:
            sys.stderr.write(prep.stdout + prep.stderr)
            raise SystemExit("dataset prep failed")

        port = _free_port()
        coordinator = f"localhost:{port}"
        script = os.path.abspath(__file__)

        # The two cluster workers must run CONCURRENTLY (they rendezvous at
        # the coordinator); the oracle can share the wall clock too.
        workers = [
            subprocess.Popen(
                [
                    sys.executable, script,
                    "--role", "worker",
                    "--process-id", str(i),
                    "--coordinator", coordinator,
                    "--data-root", data_root,
                ],
                env=_child_env(4),
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
            for i in range(2)
        ]
        single = subprocess.Popen(
            [
                sys.executable, script,
                "--role", "single",
                "--data-root", data_root,
            ],
            env=_child_env(8),
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )

        results = {}
        for tag, proc in [("worker0", workers[0]), ("worker1", workers[1]),
                          ("single", single)]:
            out, err = proc.communicate(timeout=900)
            results[tag] = _parse_result(
                subprocess.CompletedProcess(proc.args, proc.returncode, out, err),
                tag,
            )

    oracle = results["single"]
    report = {"steps": N_STEPS, "runs": results}
    for tag in ("worker0", "worker1"):
        r = results[tag]
        assert r["devices"] == 8 and r["local_devices"] == 4, r
        for key in ("c_losses", "g_losses"):
            got, want = np.asarray(r[key]), np.asarray(oracle[key])
            assert np.all(np.isfinite(got)), (tag, key, got)
            # Cross-process gloo collectives may reduce in a different
            # order than the single-program 8-device run — tight, not
            # bitwise, equality.
            np.testing.assert_allclose(
                got, want, rtol=2e-4, atol=2e-5,
                err_msg=f"{tag} {key} diverged from the single-process run",
            )
    report["losses_match_single_process"] = True
    print(json.dumps(report, indent=2))
    if keep_json:
        with open(keep_json, "w") as f:
            json.dump(report, f, indent=2)
    print("multihost_smoke OK: 2-process cluster == single-process oracle")
    return report


def prep_main(data_root: str) -> None:
    from byogan_tpu.data.prep import prepare_pyramid
    from byogan_tpu.data.synthetic import write_synthetic_dataset

    write_synthetic_dataset(data_root, n_images=32, size=8)
    prepare_pyramid(data_root, start_size=4, end_size=8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--role", choices=("launcher", "worker", "single", "prep"),
        default="launcher",
    )
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()
    if args.role == "launcher":
        launcher_main(keep_json=args.json_out)
    elif args.role == "prep":
        prep_main(args.data_root)
    elif args.role == "single":
        single_main(args.data_root)
    else:
        worker_main(args.process_id, args.coordinator, args.data_root)


if __name__ == "__main__":
    main()
