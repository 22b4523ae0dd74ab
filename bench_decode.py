"""Secondary benchmark: LM decode throughput (tokens/sec/chip) at Gemma-2B
geometry with the prober-capture pipeline active — the generation hot loop of
the adaptive RAG system (SURVEY.md §3.4). Random bf16 weights (quality needs
checkpoints; throughput doesn't). Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BATCH = int(os.environ.get("BENCH_DECODE_BATCH", 8))
PROMPT_LEN = int(os.environ.get("BENCH_DECODE_PROMPT", 1024))
MAX_NEW = int(os.environ.get("BENCH_DECODE_NEW", 150))
INT8 = os.environ.get("BENCH_DECODE_INT8", "0") == "1"
INT4 = os.environ.get("BENCH_DECODE_INT4", "0") == "1"  # grouped w4a16
# grouped (default) | rank1 — rank1 factorizes the scale matrix so the
# decode matmul is one fused-convert dot with true int4 HBM reads
INT4_SCHEME = os.environ.get("BENCH_DECODE_INT4_SCHEME", "grouped")
if INT8 and INT4:
    # a run with both set would measure int4 under a metric name claiming
    # both — poisoning the int8-vs-int4 comparison this bench exists for
    sys.exit("set only one of BENCH_DECODE_INT8 / BENCH_DECODE_INT4")
KV_INT8 = os.environ.get("BENCH_DECODE_KV_INT8", "0") == "1"
# int4 KV cache (sub-channel group scales, gemma._quant_kv4): quarters the
# cache — the batch-64 7B w8a8 single-chip enabler (the int8 cache misses
# that budget by ~2.5% even split + per-layer, ROUND5_NOTES §10)
KV_INT4 = os.environ.get("BENCH_DECODE_KV_INT4", "0") == "1"
if KV_INT8 and KV_INT4:
    sys.exit("set only one of BENCH_DECODE_KV_INT8 / BENCH_DECODE_KV_INT4")
# w8a8 prefill row threshold (0 = off). Only meaningful with INT8: the
# prompt forward (rows = B * prompt_len) crosses it, decode steps
# (rows = B) never do, so the decode loop keeps the exact w8a16 form.
ACT8 = int(os.environ.get("BENCH_DECODE_ACT8", "0"))
CAPTURE = os.environ.get("BENCH_DECODE_CAPTURE", "1") == "1"
TINY = os.environ.get("BENCH_DECODE_TINY", "0") == "1"
# speculative decode: SPEC = k drafts verified per forward (0 = off).
# SPEC_MODE oracle = drafts are a recorded greedy output of the same model
# (acceptance 1 — the honest measured CEILING, since random weights give
# the prompt-lookup drafter nothing to copy); prompt = the production
# prompt-lookup drafter (acceptance ~0 on random weights — the measured
# FLOOR, i.e. the overhead of speculating and missing).
SPEC = int(os.environ.get("BENCH_DECODE_SPEC", "0"))
SPEC_MODE = os.environ.get("BENCH_DECODE_SPEC_MODE", "oracle")
# two-program serving (prefill jit -> donated-cache decode jit): identical
# output, lower peak HBM — the fused program OOMs at 7B batch 64 on XLA
# compressed-remat copies of the KV cache (decode.py::decode_greedy_split)
SPLIT = os.environ.get("BENCH_DECODE_SPLIT", "0") == "1"
# gemma2b (default) | mistral7b — the reference's optional second model
# family (utils.py:295-297). 7B bf16 (14.5 GB) exceeds one v5e's HBM, so
# the mistral path inits leafwise straight into the int8 serving format
# (gemma.init_quantized_lm_params); requires INT8.
MODEL = os.environ.get("BENCH_DECODE_MODEL", "gemma2b")


def main():
    from bench_util import require_live_device

    require_live_device()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from probing_rag_tpu.models.decode import (
        StopTables,
        decode_greedy,
        decode_greedy_split,
    )
    from probing_rag_tpu.models.gemma import CaptureSpec, GemmaConfig, init_params

    if TINY:  # CPU smoke of the harness
        import dataclasses

        cfg = dataclasses.replace(
            GemmaConfig.tiny(4096), compute_dtype=jnp.float32)
        params = init_params(cfg, jax.random.PRNGKey(0))
        if INT8 or INT4:
            from probing_rag_tpu.models.gemma import quantize_lm_params

            params = quantize_lm_params(
                params, bits=4 if INT4 else 8, int4_scheme=INT4_SCHEME)
    elif MODEL == "mistral7b":
        if not (INT8 or INT4):
            sys.exit("mistral7b needs BENCH_DECODE_INT8 or _INT4: the bf16 "
                     "tree (14.5 GB) does not fit one v5e chip's HBM")
        from probing_rag_tpu.models.gemma import init_quantized_lm_params

        cfg = GemmaConfig.mistral_7b()
        # leafwise init+quantize on device: peak HBM = quantized tree + 1
        # bf16 leaf. UNSTACKED layers: stacked [L, ...] weights cost a
        # full hoisted slice-temp copy of the layer weights inside the
        # decode jit (~6 GB at 7B int8, 8x-padded for s4 — the MEASURE_r5
        # decode_mistral7b_* OOMs); per-layer trees are plain arguments
        params = init_quantized_lm_params(
            cfg, jax.random.PRNGKey(0), bits=4 if INT4 else 8,
            int4_scheme=INT4_SCHEME, unstacked=True)
        # per-layer cache for the same reason as per-layer weights: the
        # stacked 2.3 GB K/V carries defeat XLA's in-place while_loop
        # buffer reuse at this scale (GemmaConfig.kv_unstacked)
        import dataclasses

        cfg = dataclasses.replace(cfg, kv_unstacked=True)
    else:
        cfg = GemmaConfig.gemma_2b()
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        if INT8 or INT4:
            from probing_rag_tpu.models.gemma import quantize_lm_params

            # int8 halves the HBM weight payload; int4 (grouped w4a16,
            # embed int8) halves the layer-weight payload again
            params = quantize_lm_params(
                params, bits=4 if INT4 else 8, int4_scheme=INT4_SCHEME)
    ACT8_ON = ACT8 and (INT8 or (INT4 and INT4_SCHEME == "rank1"))
    if ACT8_ON:
        import dataclasses

        cfg = dataclasses.replace(cfg, act_int8_rows=ACT8)
    # chunked prefill attention (memory-exact, see GemmaConfig.attn_q_chunk):
    # required at 7B — the unchunked [32, 8, 4, 1024, 1174] f32 score
    # temporaries are 2 x 4.59 GB and OOM the chip under w8a8
    QCHUNK = int(os.environ.get(
        "BENCH_DECODE_QCHUNK", "128" if MODEL == "mistral7b" else "0"))
    if QCHUNK:
        import dataclasses

        cfg = dataclasses.replace(cfg, attn_q_chunk=QCHUNK)
    # chunked prefill MLP (memory-exact, see GemmaConfig.mlp_t_chunk):
    # required at 7B batch 64 — the unchunked [64, 1024, 14336] gate/up
    # temporaries are 3.65 GB of HLO temp next to the int8 KV cache and
    # weights and OOM the chip (MEASURE_r4 decode_mistral7b_int8a8_b64)
    MLPCHUNK = int(os.environ.get(
        "BENCH_DECODE_MLPCHUNK", "256" if MODEL == "mistral7b" else "0"))
    if MLPCHUNK:
        import dataclasses

        cfg = dataclasses.replace(cfg, mlp_t_chunk=MLPCHUNK)
    capture = CaptureSpec.for_probing(cfg) if CAPTURE else CaptureSpec()

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(3, cfg.vocab_size, (BATCH, PROMPT_LEN)), jnp.int32
    )
    valid = jnp.ones((BATCH, PROMPT_LEN), bool)
    stop = StopTables.disabled(cfg.vocab_size)  # measure the full-length loop
    zeros = jnp.asarray(stop.contains_dbl_nl)

    greedy_fn = decode_greedy_split if SPLIT else decode_greedy

    def run_greedy(toks):
        # eos_id=-1 never matches: measures the full max_new-length loop
        return greedy_fn(
            params, toks, valid, zeros, zeros, zeros,
            cfg=cfg, capture=capture, max_new_tokens=MAX_NEW, eos_id=-1,
            kv_int8=KV_INT8, kv_int4=KV_INT4,
        )

    spec_stats = None
    if SPEC:
        from probing_rag_tpu.models.speculative import decode_speculative

        def run(toks, oracle=None):
            out = decode_speculative(
                params, toks, valid, zeros, zeros, zeros, oracle,
                cfg=cfg, capture=capture, max_new_tokens=MAX_NEW, eos_id=-1,
                k=SPEC, drafter=SPEC_MODE, kv_int8=KV_INT8, kv_int4=KV_INT4,
            )
            return out[:5] + (out[5],)
    else:
        def run(toks, oracle=None):
            return run_greedy(toks) + (None,)

    def fetch_scalar(x) -> float:
        return float(np.asarray(x))

    oracle_fixpoint = []  # (iters, converged) per recorded oracle

    def record_oracle(toks):
        # ceiling mode: drafts must be what THE SPEC PATH's own verify
        # forward would greedily emit. Seeding with the sequential greedy
        # output is not enough: the verify forward runs k+1 tokens/row with
        # a larger physical cache, so its bf16 logits differ from the
        # 1-token recorder's in the low bits, and with random weights one
        # argmax near-tie flip early in the sequence derails the oracle
        # permanently (MEASURE_r5 decode_int8a8_spec4_b32 measured
        # tokens_per_forward 1.0 this way). Iterating o <- committed(o)
        # converges to the spec path's own greedy fixpoint: committed == o
        # elementwise iff every draft was accepted (a rejected draft is
        # replaced by a differing bonus token), and a full-acceptance
        # oracle reproduces itself deterministically.
        if not (SPEC and SPEC_MODE == "oracle"):
            return None
        o = run_greedy(toks)[0]
        iters, converged = 0, False
        for _ in range(25):
            committed = run(toks, o)[0]
            iters += 1
            if np.array_equal(np.asarray(committed), np.asarray(o)):
                converged = True
                break
            o = committed
        oracle_fixpoint.append((iters, converged))
        return jnp.asarray(np.asarray(o))

    t0 = time.time()
    oracle_warm = record_oracle(tokens)
    out = run(tokens, oracle_warm)
    fetch_scalar(out[3][0])  # true sync: only a fetch awaits execution here
    compile_s = time.time() - t0

    def hbm_breakdown():
        # AOT memory analysis of the measured executable: axon's
        # device.memory_stats() returns nothing (every MEASURE_r4/r5 row
        # recorded "hbm": {}), so the speculative cache's over-allocation
        # (prompt + max_new*(k+1) slots, speculative.py:31-43) is priced
        # from the compiled program itself. The persistent compilation
        # cache makes this lower+compile a cache hit, not a second build.
        def analyze(lowered):
            ma = lowered.compile().memory_analysis()
            out = {}
            for key, short in (
                ("argument_size_in_bytes", "args_gib"),
                ("temp_size_in_bytes", "temps_gib"),
                ("output_size_in_bytes", "output_gib"),
                ("alias_size_in_bytes", "alias_gib"),
            ):
                if hasattr(ma, key):
                    out[short] = round(getattr(ma, key) / 2**30, 3)
            return out

        try:
            if SPEC:
                from probing_rag_tpu.models.speculative import (
                    decode_speculative as fn,
                )

                return analyze(fn.lower(
                    params, tokens, valid, zeros, zeros, zeros, oracle_warm,
                    cfg=cfg, capture=capture, max_new_tokens=MAX_NEW,
                    eos_id=-1, k=SPEC, drafter=SPEC_MODE,
                    kv_int8=KV_INT8, kv_int4=KV_INT4,
                ))
            if SPLIT:
                # price each of the two programs: the split exists exactly
                # to bound per-program peak HBM, so report both
                from probing_rag_tpu.models.decode import (
                    _decode_loop_jit,
                    _prefill_jit,
                )
                from probing_rag_tpu.models.sampling import SamplingConfig

                samp = SamplingConfig()
                pre = _prefill_jit.lower(
                    params, tokens, valid, zeros, zeros, zeros, None,
                    cfg=cfg, max_new_tokens=MAX_NEW, eos_id=-1,
                    sampling=samp, kv_int8=KV_INT8, kv_int4=KV_INT4,
                )
                kv, g1, fin, counts, rng = _prefill_jit(
                    params, tokens, valid, zeros, zeros, zeros, None,
                    cfg=cfg, max_new_tokens=MAX_NEW, eos_id=-1,
                    sampling=samp, kv_int8=KV_INT8, kv_int4=KV_INT4,
                )
                loop = _decode_loop_jit.lower(
                    params, kv, g1, fin, counts, valid,
                    zeros, zeros, zeros, rng,
                    cfg=cfg, capture=capture, max_new_tokens=MAX_NEW,
                    eos_id=-1, sampling=samp,
                )
                return {"prefill": analyze(pre), "decode_loop": analyze(loop)}
            return analyze(decode_greedy.lower(
                params, tokens, valid, zeros, zeros, zeros,
                cfg=cfg, capture=capture, max_new_tokens=MAX_NEW,
                eos_id=-1, kv_int8=KV_INT8, kv_int4=KV_INT4,
            ))
        except Exception as e:  # never fail the bench over introspection
            return {"error": str(e)[:160]}

    t0 = time.time()
    fetch_scalar(jnp.sum(jnp.zeros((8, 128))))
    fetch_baseline = time.time() - t0

    # distinct inputs per iteration (identical dispatches can be memoized by
    # remote runtimes); one scalar fetch at the end truly synchronizes, with
    # the calibrated fetch cost subtracted
    n_iters = 8
    variants = [jnp.roll(tokens, i + 1, axis=-1) for i in range(n_iters)]
    # oracle recording happens OUTSIDE the timed loop: the ceiling number
    # measures the verify path, not the recording greedy pass
    oracles = [record_oracle(v) for v in variants]
    # settling pass: the FIRST timed block after warmup pays a ~1 s
    # position-dependent tunnel stall regardless of code (see bench.py)
    settle = jnp.roll(tokens, n_iters + 1, axis=-1)
    out = run(settle, record_oracle(settle))
    fetch_scalar(out[3][0])
    t0 = time.time()
    acc = jnp.zeros((), jnp.float32)
    rounds = []
    for i in range(n_iters):
        out = run(variants[i], oracles[i])
        # the sync scalar must depend on every step: generated tokens always
        # do; pooled captures additionally when capture is on
        acc = acc + jnp.sum(out[0].astype(jnp.float32)) + jnp.sum(out[2])
        if out[5] is not None:
            rounds.append(out[5]["rounds"])
    fetch_scalar(acc)
    raw_elapsed = time.time() - t0
    if rounds:
        r = float(np.mean([int(np.asarray(x)) for x in rounds]))
        spec_stats = {
            "k": SPEC,
            "mode": SPEC_MODE,
            "verify_rounds_per_decode": round(r, 1),
            "sequential_rounds": MAX_NEW - 1,
            "tokens_per_forward": round((MAX_NEW - 1) / max(r, 1), 2),
        }
        if oracle_fixpoint:
            spec_stats["oracle_fixpoint"] = {
                "mean_iters": round(
                    float(np.mean([i for i, _ in oracle_fixpoint])), 1),
                "max_iters": max(i for i, _ in oracle_fixpoint),
                "all_converged": all(c for _, c in oracle_fixpoint),
            }
    adj = raw_elapsed - fetch_baseline
    elapsed = (adj if adj > 0.05 * raw_elapsed else raw_elapsed) / n_iters
    tok_s = BATCH * MAX_NEW / elapsed

    # device HBM after the runs: with SPEC this prices the over-allocated
    # prompt + max_new*(k+1) speculative cache (speculative.py:31-43)
    # against the sequential loop's prompt + max_new cache
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        hbm = {k: int(ms[k]) for k in ("bytes_in_use", "peak_bytes_in_use")
               if k in ms}
    except Exception:
        hbm = {}
    hbm["program"] = hbm_breakdown()

    print(
        json.dumps(
            {
                "metric": ("mistral7b" if MODEL == "mistral7b" and not TINY
                           else "gemma2b")
                + "_decode_tokens_per_sec_per_chip"
                + ("_int8" if INT8 else "")
                + (("_int4r1" if INT4_SCHEME == "rank1" else "_int4")
                   if INT4 else "")
                + ("_a8" if ACT8_ON else "")
                + ("_kvint8" if KV_INT8 else "")
                + ("_kvint4" if KV_INT4 else "")
                + ((f"_spec{SPEC}" if SPEC_MODE == "oracle"
                    else f"_specpl{SPEC}") if SPEC else "")
                # smoke runs must never share a metric key with real ones
                + ("_tiny" if TINY else ""),
                "value": round(tok_s, 1),
                "unit": "tokens/s",
                "vs_baseline": None,
                "detail": {
                    "model": ("tiny (smoke)" if TINY
                              else "mistral-7b (random)"
                              if MODEL == "mistral7b" else "gemma-2b (random)"),
                    "batch": BATCH,
                    "prompt_len": PROMPT_LEN,
                    "max_new": MAX_NEW,
                    "capture_sites": capture.n_sites,
                    "kv_int8": KV_INT8,
                    "kv_int4": KV_INT4,
                    "split_prefill": SPLIT,
                    "attn_q_chunk": QCHUNK,
                    "mlp_t_chunk": MLPCHUNK,
                    "speculative": spec_stats,
                    "hbm": hbm,
                    "compile_s": round(compile_s, 1),
                    "per_batch_latency_s": round(elapsed, 2),
                    "fetch_baseline_s": round(fetch_baseline, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
