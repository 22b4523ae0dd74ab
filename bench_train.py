"""Benchmark: prober-training throughput at Gemma-2B scale (pipeline phase 3).

The reference's dominant training cost is the frozen-LM forward over
1536-token batches (train.py:260-266; SURVEY.md §3.3) — one script run per
layer, two probers per run. Here ONE forward captures all 12 (layer, site)
activations and a vmapped AdamW step updates the whole prober stack
(prober/train.py), so the bench reports examples/sec for the fused pipeline
plus the forward/update cost split that shows where the time goes.

Random bf16 weights (throughput doesn't need checkpoints), batch 8 at
max_len 1536 exactly like train.py:86,126-137. Prints ONE JSON line.

Smoke: BENCH_TRAIN_TINY=1 BENCH_PLATFORM=cpu runs a tiny config off-TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", 8))
MAX_LEN = int(os.environ.get("BENCH_TRAIN_LEN", 1536))
TINY = os.environ.get("BENCH_TRAIN_TINY", "0") == "1"
N_ITERS = int(os.environ.get("BENCH_TRAIN_ITERS", 8))


def main():
    from bench_util import require_live_device

    require_live_device()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from probing_rag_tpu.models.gemma import CaptureSpec, GemmaConfig, forward, init_params
    from probing_rag_tpu.prober.train import (
        ProberTrainConfig, init_prober_stack, make_optimizer, prober_train_step,
    )

    if TINY:
        import dataclasses

        cfg = dataclasses.replace(GemmaConfig.tiny(4096), compute_dtype=jnp.float32)
        params = init_params(cfg, jax.random.PRNGKey(0))
        tc = ProberTrainConfig(layers=cfg.probe_layers, batch_size=BATCH, max_len=MAX_LEN)
    else:
        cfg = GemmaConfig.gemma_2b()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        tc = ProberTrainConfig(batch_size=BATCH, max_len=MAX_LEN)  # 6 layers x 2 sites
    # throughput OPTION: int8 frozen LM (+ w8a8 at [B*1536] rows — the
    # capture forward is prefill-shaped, MXU-bound). Quantizing the frozen
    # LM changes the activations the probers train on; bf16 capture stays
    # the quality-default (the reference trains on full-precision
    # activations, train.py:260-266) — this row measures what the serving
    # stack buys IF a user accepts quantized capture.
    INT8 = os.environ.get("BENCH_TRAIN_INT8", "0") == "1"
    if INT8:
        import dataclasses

        from probing_rag_tpu.models.gemma import quantize_lm_params

        params = quantize_lm_params(params, bits=8)
        act8 = int(os.environ.get("BENCH_TRAIN_ACT8", "0"))
        if act8:
            cfg = dataclasses.replace(cfg, act_int8_rows=act8)

    capture = CaptureSpec(tc.sites)
    optimizer = make_optimizer(tc)
    stacked = init_prober_stack(tc, cfg.d_model, jax.random.PRNGKey(1))
    opt_state = optimizer.init(stacked)

    rng = np.random.default_rng(0)

    def make_batch(i):
        tokens = jnp.asarray(
            rng.integers(3, cfg.vocab_size, (BATCH, MAX_LEN)), jnp.int32
        )
        labels = jnp.asarray(rng.integers(0, 2, (BATCH,)), jnp.int32)
        pred_lens = jnp.asarray(rng.integers(10, 150, (BATCH,)), jnp.int32)
        return tokens, labels, pred_lens

    valid = jnp.ones((BATCH, MAX_LEN), bool)
    positions = jnp.broadcast_to(jnp.arange(MAX_LEN)[None, :], (BATCH, MAX_LEN))

    fwd = jax.jit(lambda p, t: forward(
        p, t, cfg, capture=capture, positions=positions, attn_valid=valid
    )[2])

    def fetch_scalar(x) -> float:
        return float(np.asarray(x))

    batches = [make_batch(i) for i in range(N_ITERS + 2)]
    key = jax.random.PRNGKey(2)

    # warmup: compile the frozen forward and the vmapped train step
    t0 = time.time()
    caps0 = fwd(params, batches[0][0])
    stacked_w, opt_w, losses = prober_train_step(
        stacked, opt_state, caps0, batches[0][1], batches[0][2], key,
        tc=tc, optimizer=optimizer,
    )
    fetch_scalar(jnp.sum(losses))
    compile_s = time.time() - t0

    # settling pass (untimed): absorb the first post-warmup tunnel stall
    caps_s = fwd(params, batches[1][0])
    stacked_w, opt_w, losses = prober_train_step(
        stacked, opt_state, caps_s, batches[1][1], batches[1][2], key,
        tc=tc, optimizer=optimizer,
    )
    fetch_scalar(jnp.sum(losses))

    # two trivial fetches: the first may pay its own compile; the min is
    # the steady-state tunnel fetch cost the timed loops actually see
    t0 = time.time()
    fetch_scalar(jnp.sum(jnp.zeros((8, 128))))
    f1 = time.time() - t0
    t0 = time.time()
    fetch_scalar(jnp.sum(jnp.ones((8, 128))))
    fetch_baseline = min(f1, time.time() - t0)

    # A) forward-only: the frozen-LM capture cost (the reference's hot loop)
    t0 = time.time()
    acc = jnp.zeros((), jnp.float32)
    for i in range(N_ITERS):
        caps = fwd(params, batches[i + 2][0])
        acc = acc + jnp.sum(caps[0, 0, -1].astype(jnp.float32))
    fetch_scalar(acc)
    fwd_raw = time.time() - t0
    fwd_s = max(fwd_raw - fetch_baseline, 0.05 * fwd_raw) / N_ITERS

    # B) composed forward + vmapped 12-site update (the real training step)
    t0 = time.time()
    s, o = stacked, opt_state
    acc = jnp.zeros((), jnp.float32)
    for i in range(N_ITERS):
        tokens, labels, pred_lens = batches[i + 2]
        caps = fwd(params, tokens)
        key, sk = jax.random.split(key)
        s, o, losses = prober_train_step(
            s, o, caps, labels, pred_lens, sk, tc=tc, optimizer=optimizer
        )
        acc = acc + jnp.sum(losses)
    fetch_scalar(acc)
    full_raw = time.time() - t0
    full_s = max(full_raw - fetch_baseline, 0.05 * full_raw) / N_ITERS

    examples_per_sec = BATCH / full_s
    # the reference trains each of 6 layers in a separate script run, each
    # paying its own frozen forward: 6 forwards + 6 small steps per batch
    ref_equiv_s = 6 * fwd_s + max(full_s - fwd_s, 0) * 6

    print(
        json.dumps(
            {
                "metric": "prober_train_examples_per_sec_per_chip"
                + ("_int8" if INT8 else "")
                + ("_a8" if INT8
                   and os.environ.get("BENCH_TRAIN_ACT8", "0") != "0" else "")
                + ("_tiny" if TINY else ""),
                "value": round(examples_per_sec, 2),
                "unit": "examples/s",
                "vs_baseline": None,
                "detail": {
                    "model": ("tiny (smoke)" if TINY
                              else "gemma-2b (random "
                              + ("int8 + w8a8)" if INT8 and os.environ.get(
                                  "BENCH_TRAIN_ACT8", "0") != "0"
                                 else "int8)" if INT8 else "bf16)")),
                    "batch": BATCH,
                    "max_len": MAX_LEN,
                    "n_sites": len(tc.sites),
                    "per_batch_s": round(full_s, 3),
                    "frozen_forward_s": round(fwd_s, 3),
                    "prober_update_s": round(max(full_s - fwd_s, 0.0), 3),
                    "fused_vs_per_layer_runs_speedup": round(ref_equiv_s / full_s, 1),
                    "compile_s": round(compile_s, 1),
                    "fetch_baseline_s": round(fetch_baseline, 2),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
