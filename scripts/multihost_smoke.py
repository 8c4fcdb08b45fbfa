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

Round 4 adds ``--mode train`` (VERDICT r3 next-round #1): the same
2-process cluster drives the REAL production ``train()`` entrypoint —
progressive stages, fade buckets, sample grids, SWD evals, coordinated
orbax checkpoints, metrics.jsonl — not just mesh+loader+step.  Three runs:

  A. single-process 8-device ``train()`` to completion (the oracle);
  B. 2-process ``train()`` stopped mid-stage-2 by ``max_iters`` (its
     stop-checkpoint is written by the COORDINATED multi-process save);
  C. single-process ``train()`` resuming from B's 2-process checkpoint.

Asserted: B's per-iteration losses equal A's prefix; C's continuation
equals A's suffix (the 2-process checkpoint resumes batch-exactly in a
single-process run); B's metrics.jsonl has exactly one record per readout
(no double-append) and one artifact set (process-0-gated IO).

Usage:
    PYTHONPATH=/root/repo python scripts/multihost_smoke.py [--mode steps|train]
    # internal: --role worker --process-id {0,1} / --role single / ...
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


TRAIN_TOTAL_ITERS = 16  # (8,8) batches x (2,2) epochs on 32 images
TRAIN_STOP_ITERS = 12  # mid stage 2: forces a mid-stage stop checkpoint


def _train_config(data_root: str, out_root: str):
    from byogan_tpu.train.config import TrainConfig

    return TrainConfig(
        data=data_root,
        noise_size=16,
        compute_dtype="float32",
        batch_progression=(8, 8),
        epoch_progression=(2, 2),
        channel_divisor=16,
        mapping_depth=2,
        seed=SEED,
        data_axis=8,  # the production mesh path inside train()
        refresh_stat_step=1,  # one metrics record per iteration
        display_step=8,
        eval_step=4,
        eval_images=8,
        checkpoint_step=8,
        checkpoint_dir=os.path.join(out_root, "checkpoints"),
        output_dir=os.path.join(out_root, "output"),
    )


def _run_real_train(
    data_root: str,
    out_root: str,
    checkpoint: str | None = None,
    max_iters: int | None = None,
) -> dict:
    """Drive the PRODUCTION train() (not a hand-rolled step loop)."""
    import jax

    from byogan_tpu.train.loop import train

    config = _train_config(data_root, out_root)
    state = train(config, checkpoint=checkpoint, max_iters=max_iters)
    return {
        "process_id": jax.process_index(),
        "process_count": jax.process_count(),
        "devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "iters": int(state.iters),
        "stage": int(state.stage),
    }


def train_worker_main(
    process_id: int, coordinator: str, data_root: str, out_root: str,
    max_iters: int,
) -> None:
    _force_cpu()
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=2,
        process_id=process_id,
        initialization_timeout=120,
    )
    result = _run_real_train(data_root, out_root, max_iters=max_iters)
    print("RESULT " + json.dumps(result), flush=True)
    jax.distributed.shutdown()


def train_single_main(
    data_root: str, out_root: str, checkpoint: str | None
) -> None:
    _force_cpu()
    result = _run_real_train(data_root, out_root, checkpoint=checkpoint)
    print("RESULT " + json.dumps(result), flush=True)


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


def _read_jsonl(path: str) -> list:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def train_launcher_main(keep_json: str | None = None) -> dict:
    """A/B/C end-to-end train() runs (module docstring); returns the report."""
    import numpy as np

    script = os.path.abspath(__file__)

    def run_one(tag, args_list, n_local, timeout=1200):
        proc = subprocess.run(
            [sys.executable, script, *args_list],
            env=_child_env(n_local),
            capture_output=True,
            text=True,
            timeout=timeout,
        )
        return _parse_result(proc, tag)

    with tempfile.TemporaryDirectory(prefix="byogan_mh_train_") as tmp:
        data_root = os.path.join(tmp, "data")
        prep = subprocess.run(
            [sys.executable, script, "--role", "prep",
             "--data-root", data_root],
            env=_child_env(1), capture_output=True, text=True, timeout=300,
        )
        if prep.returncode != 0:
            sys.stderr.write(prep.stdout + prep.stderr)
            raise SystemExit("dataset prep failed")

        dir_a = os.path.join(tmp, "A")
        dir_b = os.path.join(tmp, "B")
        dir_c = os.path.join(tmp, "C")

        # A: single-process oracle, full run.
        res_a = run_one("train_single", [
            "--role", "train-single", "--data-root", data_root,
            "--out-root", dir_a,
        ], n_local=8)

        # B: 2-process production train(), stopped mid-stage-2.  The two
        # workers share the SAME output/checkpoint dirs (one filesystem =
        # the multi-host shared-storage layout) — exactly the setup that
        # corrupted artifacts before the process-0 gating.
        port = _free_port()
        coordinator = f"localhost:{port}"
        workers = [
            subprocess.Popen(
                [sys.executable, script,
                 "--role", "train-worker",
                 "--process-id", str(i),
                 "--coordinator", coordinator,
                 "--data-root", data_root,
                 "--out-root", dir_b,
                 "--max-iters", str(TRAIN_STOP_ITERS)],
                env=_child_env(4),
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
            for i in range(2)
        ]
        res_b = {}
        for i, proc in enumerate(workers):
            out, err = proc.communicate(timeout=1200)
            res_b[f"worker{i}"] = _parse_result(
                subprocess.CompletedProcess(
                    proc.args, proc.returncode, out, err
                ),
                f"train_worker{i}",
            )

        # C: single-process resume FROM THE 2-PROCESS CHECKPOINT.
        stop_ckpt = os.path.join(
            dir_b, "checkpoints", f"chk-{TRAIN_STOP_ITERS}"
        )
        assert os.path.isdir(stop_ckpt), os.listdir(
            os.path.join(dir_b, "checkpoints")
        )
        res_c = run_one("train_resume", [
            "--role", "train-single", "--data-root", data_root,
            "--out-root", dir_c, "--checkpoint", stop_ckpt,
        ], n_local=8)

        # ---- assertions ----
        def step_records(out_dir):
            recs = [
                r
                for r in _read_jsonl(
                    os.path.join(out_dir, "output", "metrics.jsonl")
                )
                if "c_loss" in r
            ]
            return {r["iter"]: r for r in recs}, recs

        a_by_iter, a_recs = step_records(dir_a)
        b_by_iter, b_recs = step_records(dir_b)
        c_by_iter, c_recs = step_records(dir_c)

        assert res_a["iters"] == TRAIN_TOTAL_ITERS, res_a
        assert res_c["iters"] == TRAIN_TOTAL_ITERS, res_c
        for r in res_b.values():
            assert r["process_count"] == 2 and r["devices"] == 8, r
            assert r["iters"] == TRAIN_STOP_ITERS, r

        # One record per readout — the double-append bug would duplicate.
        assert len(b_recs) == len(b_by_iter) == TRAIN_STOP_ITERS, (
            f"B wrote {len(b_recs)} step records for {TRAIN_STOP_ITERS} "
            "iterations (duplicate appends?)"
        )
        assert sorted(b_by_iter) == list(range(1, TRAIN_STOP_ITERS + 1))
        assert sorted(c_by_iter) == list(
            range(TRAIN_STOP_ITERS + 1, TRAIN_TOTAL_ITERS + 1)
        ), sorted(c_by_iter)

        def compare(tag, got_by_iter, want_by_iter, iters):
            for it in iters:
                for key in ("c_loss", "g_loss"):
                    np.testing.assert_allclose(
                        got_by_iter[it][key], want_by_iter[it][key],
                        rtol=2e-4, atol=2e-5,
                        err_msg=f"{tag} iter {it} {key} diverged",
                    )

        # B (2-process train) tracks the oracle's prefix; C (single-process
        # resume of B's checkpoint) tracks the oracle's suffix.
        compare("B", b_by_iter, a_by_iter, range(1, TRAIN_STOP_ITERS + 1))
        compare(
            "C", c_by_iter, a_by_iter,
            range(TRAIN_STOP_ITERS + 1, TRAIN_TOTAL_ITERS + 1),
        )

        # Eval records (SWD) written once each, matching the oracle's.
        b_evals = [
            r
            for r in _read_jsonl(
                os.path.join(dir_b, "output", "metrics.jsonl")
            )
            if r.get("kind") == "eval"
        ]
        eval_iters = [r["iter"] for r in b_evals]
        assert eval_iters == sorted(set(eval_iters)), eval_iters

        # One artifact set: the sample grid exists (written by process 0).
        assert os.path.exists(os.path.join(dir_b, "output", "s-8.png"))
        # C completed: FINAL checkpoint present and loadable metadata.
        assert os.path.isdir(os.path.join(dir_c, "checkpoints", "FINAL"))

        report = {
            "mode": "train",
            "total_iters": TRAIN_TOTAL_ITERS,
            "stop_iters": TRAIN_STOP_ITERS,
            "runs": {"single": res_a, **res_b, "resume": res_c},
            "b_losses_match_single_prefix": True,
            "resume_matches_single_suffix": True,
            "single_artifact_set": True,
            "losses": {
                "single": [
                    [a_by_iter[i]["c_loss"], a_by_iter[i]["g_loss"]]
                    for i in sorted(a_by_iter)
                ],
                "two_process": [
                    [b_by_iter[i]["c_loss"], b_by_iter[i]["g_loss"]]
                    for i in sorted(b_by_iter)
                ],
                "resumed": [
                    [c_by_iter[i]["c_loss"], c_by_iter[i]["g_loss"]]
                    for i in sorted(c_by_iter)
                ],
            },
        }
    print(json.dumps(report, indent=2))
    if keep_json:
        with open(keep_json, "w") as f:
            json.dump(report, f, indent=2)
    print(
        "multihost_smoke --mode train OK: 2-process train() == oracle "
        "prefix; its checkpoint resumed single-process == oracle suffix"
    )
    return report


def prep_main(data_root: str) -> None:
    from byogan_tpu.data.prep import prepare_pyramid
    from byogan_tpu.data.synthetic import write_synthetic_dataset

    write_synthetic_dataset(data_root, n_images=32, size=8)
    prepare_pyramid(data_root, start_size=4, end_size=8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--role",
        choices=(
            "launcher", "worker", "single", "prep",
            "train-worker", "train-single",
        ),
        default="launcher",
    )
    ap.add_argument(
        "--mode", choices=("steps", "train"), default="steps",
        help="launcher: 'steps' = mesh+loader+step equivalence (round 3); "
        "'train' = end-to-end production train() A/B/C runs (round 4)",
    )
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--out-root", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--max-iters", type=int, default=None)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()
    if args.role == "launcher":
        if args.mode == "train":
            train_launcher_main(keep_json=args.json_out)
        else:
            launcher_main(keep_json=args.json_out)
    elif args.role == "prep":
        prep_main(args.data_root)
    elif args.role == "single":
        single_main(args.data_root)
    elif args.role == "worker":
        worker_main(args.process_id, args.coordinator, args.data_root)
    elif args.role == "train-single":
        train_single_main(args.data_root, args.out_root, args.checkpoint)
    else:  # train-worker
        train_worker_main(
            args.process_id, args.coordinator, args.data_root,
            args.out_root, args.max_iters,
        )


if __name__ == "__main__":
    main()
