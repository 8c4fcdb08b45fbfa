"""Seal (or re-open) the headline roofline: is the backward memory-bound?
(VERDICT r4 next-round #5.)

RESULTS.md's round-3/4 claim — "the remaining MFU gap is intrinsic
backward-pass work ... HBM-heavy" — rested on one phase decomposition with
no bandwidth numbers behind it.  This benchmark substantiates it three
ways, all committed to benchmarks/roofline/summary.json:

1. PHASE ROOFLINES.  Each phase of the headline step (stage 6, batch 128,
   bf16) is timed as its own jit AND has XLA's compiled cost analysis
   pulled (flops + bytes accessed), giving per-phase achieved TFLOPS vs
   the 197 TFLOPS v5e bf16 peak and achieved GB/s vs the 819 GB/s v5e HBM
   peak.  A phase whose GB/s sits near peak while its TFLOPS sits far
   below is memory-bound — no FLOP-side lever exists for it.
   Caveat recorded in the artifact: "bytes accessed" is XLA's model of
   *logical* HBM traffic (it does not see VMEM reuse), so achieved GB/s is
   an upper bound on true DRAM traffic; conversely XLA's own
   optimal_seconds lower bound (max of flop-time and byte-time) per phase
   is reported beside the measured time as the closure ratio.

2. FULL-STEP CLOSURE.  The fused headline step's measured time vs its own
   optimal_seconds bound -> one number: how far from XLA's roofline the
   whole step runs.

3. TRACE.  A real profiler trace of 3 fused steps lands in
   benchmarks/roofline/trace/ (BYOGAN_TRACE_DIR machinery, profiling.py)
   so the timeline itself is on record.

Run on the chip:  PYTHONPATH=. python benchmarks/bench_roofline.py
"""

from __future__ import annotations

import json
import os
import shutil
import time

import jax
import jax.numpy as jnp
import optax

from byogan_tpu.core.cache import enable_compilation_cache
from byogan_tpu.core.random import synthesis_noise, truncated_noise
from byogan_tpu.models import Critic, Generator
from byogan_tpu.profiling import trace_if
from byogan_tpu.train import losses
from byogan_tpu.train.config import TrainConfig
from byogan_tpu.train.state import (
    create_train_state,
    make_critic_optimizer,
    make_gen_optimizer,
)
from byogan_tpu.train.steps import make_train_step

STAGE, BATCH = 6, 128
SIZE = 4 * 2 ** (STAGE - 1)
PEAK_TFLOPS = 197.0  # v5e bf16
PEAK_GBPS = 819.0  # v5e HBM
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "roofline")


def timeit(fn, args, iters=20):
    out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = fn(*args)
    float(jnp.asarray(jax.tree.leaves(acc)[0]).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters


def cost_of(fn, args):
    """(flops, bytes_accessed, optimal_seconds) from the compiled program;
    None entries where the backend does not report the key."""
    try:
        cost = fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
    except Exception:
        return None, None, None
    opt_sec = cost.get("optimal_seconds")
    # The tunneled backend reports garbage (negative) optimal_seconds —
    # drop it rather than record a nonsense bound; the flop/byte-derived
    # roofline_ms below is the meaningful bound either way.
    if opt_sec is not None and opt_sec <= 0:
        opt_sec = None
    return (cost.get("flops"), cost.get("bytes accessed"), opt_sec)


def main():
    enable_compilation_cache()
    config = TrainConfig(compute_dtype="bfloat16")
    gen = Generator(dtype=jnp.bfloat16)
    critic = Critic(dtype=jnp.bfloat16)
    state = create_train_state(config, gen, critic)
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    z = truncated_noise(key, BATCH, config.noise_size, config.noise_trunc, dt)
    noise = synthesis_noise(jax.random.PRNGKey(1), BATCH, STAGE, dtype=dt)
    real = jax.random.normal(
        jax.random.PRNGKey(2), (BATCH, SIZE, SIZE, 3), jnp.float32
    ).astype(dt)
    gp, cp = state.gen_params, state.critic_params
    c_tx, g_tx = make_critic_optimizer(config), make_gen_optimizer(config)
    c_opt = state.critic_opt_state
    g_opt = state.gen_opt_state

    @jax.jit
    def synth(gp):
        return gen.apply({"params": gp}, z, noise, steps=STAGE, alpha=None)

    fake = jax.block_until_ready(synth(gp))

    def crit_fn(cp):
        return lambda imgs: critic.apply(
            {"params": cp}, imgs, steps=STAGE, alpha=None
        )

    @jax.jit
    def critic_fwd(cp):
        return losses.critic_logistic_loss(crit_fn(cp), real, fake)[0]

    @jax.jit
    def critic_phase_r1(cp, c_opt):
        (loss, _), grads = jax.value_and_grad(
            lambda p: losses.critic_r1_loss(
                crit_fn(p), real, fake, config.c_lambda
            ),
            has_aux=True,
        )(cp)
        upd, c_opt = c_tx.update(grads, c_opt, cp)
        return optax.apply_updates(cp, upd), c_opt, loss

    @jax.jit
    def critic_phase_plain(cp, c_opt):
        (loss, _), grads = jax.value_and_grad(
            lambda p: losses.critic_logistic_loss(crit_fn(p), real, fake),
            has_aux=True,
        )(cp)
        upd, c_opt = c_tx.update(grads, c_opt, cp)
        return optax.apply_updates(cp, upd), c_opt, loss

    @jax.jit
    def gen_phase(gp, g_opt):
        def g_loss(p):
            f = gen.apply({"params": p}, z, noise, steps=STAGE, alpha=None)
            return losses.gen_logistic_loss(crit_fn(cp)(f))

        loss, grads = jax.value_and_grad(g_loss)(gp)
        upd, g_opt = g_tx.update(grads, g_opt, gp)
        return optax.apply_updates(gp, upd), g_opt, loss

    full = make_train_step(
        gen, critic, config, steps=STAGE, batch=BATCH, fade_in=100.0,
        critic_fade=(False,), gen_fade=False, donate=False,
    )

    phases = [
        ("full_fused_step", full, (state, real)),
        ("critic_phase_r1", critic_phase_r1, (cp, c_opt)),
        ("critic_phase_plain", critic_phase_plain, (cp, c_opt)),
        ("critic_fwd_only", critic_fwd, (cp,)),
        ("gen_phase", gen_phase, (gp, g_opt)),
        ("gen_synthesis_fwd", synth, (gp,)),
    ]

    rows = {}
    for name, fn, args in phases:
        sec = timeit(fn, args)
        flops, nbytes, opt_sec = cost_of(fn, args)
        row = {"measured_ms": round(sec * 1e3, 2)}
        if flops:
            row["tflops_achieved"] = round(flops / sec / 1e12, 1)
            row["flops_frac_of_peak"] = round(
                flops / sec / 1e12 / PEAK_TFLOPS, 3
            )
        if nbytes:
            row["gbps_achieved"] = round(nbytes / sec / 1e9, 1)
            row["bw_frac_of_peak"] = round(nbytes / sec / 1e9 / PEAK_GBPS, 3)
            row["bytes_accessed_gb"] = round(nbytes / 1e9, 3)
        if opt_sec:
            row["xla_optimal_ms"] = round(opt_sec * 1e3, 2)
            row["closure_vs_xla_optimal"] = round(opt_sec / sec, 3)
        # which wall is closer?  (only meaningful when both reported)
        if flops and nbytes:
            flop_time = flops / (PEAK_TFLOPS * 1e12)
            byte_time = nbytes / (PEAK_GBPS * 1e9)
            row["bound"] = "memory" if byte_time > flop_time else "compute"
            row["roofline_ms"] = round(max(flop_time, byte_time) * 1e3, 2)
            row["closure_vs_roofline"] = round(
                max(flop_time, byte_time) / sec, 3
            )
        rows[name] = row
        print(name, json.dumps(row))

    # R1's double-backward increment: the piece the "backward is HBM-heavy"
    # claim is actually about (headline critic phase minus the plain one).
    r1 = rows["critic_phase_r1"]
    plain = rows["critic_phase_plain"]
    if "bytes_accessed_gb" in r1 and "bytes_accessed_gb" in plain:
        d_ms = r1["measured_ms"] - plain["measured_ms"]
        d_gb = r1["bytes_accessed_gb"] - plain["bytes_accessed_gb"]
        if d_ms > 0:
            rows["r1_double_backward_delta"] = {
                "measured_ms": round(d_ms, 2),
                "bytes_accessed_gb": round(d_gb, 3),
                "gbps_achieved": round(d_gb / (d_ms / 1e3), 1),
                "bw_frac_of_peak": round(
                    d_gb / (d_ms / 1e3) / PEAK_GBPS, 3
                ),
            }

    # 3 traced fused steps — the timeline artifact.
    trace_dir = os.path.join(OUT, "trace")
    shutil.rmtree(trace_dir, ignore_errors=True)
    s = state
    with trace_if(trace_dir):
        for _ in range(3):
            s, metrics = full(s, real)
        float(metrics["c_loss"])

    os.makedirs(OUT, exist_ok=True)
    summary = {
        "config": f"stage {STAGE} ({SIZE}px), batch {BATCH}, bf16, R1",
        "peaks": {"tflops_bf16": PEAK_TFLOPS, "hbm_gbps": PEAK_GBPS},
        "note": (
            "bytes accessed = XLA's logical HBM traffic model (blind to "
            "VMEM reuse) -> gbps_achieved is an upper bound on true DRAM "
            "traffic; closure_vs_roofline = max(flop,byte)-time / measured "
            "(1.0 = at the roofline); per-phase jits carry dispatch "
            "overhead the fused step amortizes"
        ),
        "phases": rows,
        "trace_dir": os.path.relpath(trace_dir, os.path.dirname(OUT)),
    }
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"written": os.path.join(OUT, "summary.json")}))


if __name__ == "__main__":
    main()
