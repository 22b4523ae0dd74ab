"""Probe: does compiling the split decode-loop program with AUTO layouts
for the donated KV cache remove the 2.3 GB relayout/compressed-remat
copies that OOM the 7B batch-64 row? AOT-only, ShapeDtypeStructs — no
device buffers; the remote compile service does the work.

Usage: python scripts/probe_auto_layout.py [fused|auto|default]
"""

import dataclasses
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from probing_rag_tpu.models import decode as D
from probing_rag_tpu.models.gemma import (
    CaptureSpec,
    GemmaConfig,
    init_quantized_lm_params,
)
from probing_rag_tpu.models.sampling import SamplingConfig

B, T, NEW = 64, 1024, 150
MODE = sys.argv[1] if len(sys.argv) > 1 else "auto"


def report(tag, compiled):
    ma = compiled.memory_analysis()
    print(f"[{tag}] args={ma.argument_size_in_bytes/2**30:.2f}G "
          f"temps={ma.temp_size_in_bytes/2**30:.2f}G "
          f"out={ma.output_size_in_bytes/2**30:.2f}G "
          f"alias={ma.alias_size_in_bytes/2**30:.2f}G")


def main():
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    cfg = dataclasses.replace(
        GemmaConfig.mistral_7b(), act_int8_rows=512,
        attn_q_chunk=128, mlp_t_chunk=256,
        kv_unstacked=(MODE in ("unstacked", "nodouble")))
    capture = CaptureSpec.for_probing(cfg)
    samp = SamplingConfig()

    params_s = jax.eval_shape(
        lambda: init_quantized_lm_params(
            cfg, jax.random.PRNGKey(0), bits=8, unstacked=True))
    toks_s = jax.ShapeDtypeStruct((B, T), jnp.int32)
    valid_s = jax.ShapeDtypeStruct((B, T), jnp.bool_)
    z_s = jax.ShapeDtypeStruct((cfg.vocab_size,), jnp.bool_)
    key_s = jax.ShapeDtypeStruct((2,), jnp.uint32)

    pre = functools.partial(
        D._prefill_impl, cfg=cfg, max_new_tokens=NEW, eos_id=-1,
        sampling=samp, kv_int8=True)
    kv_s, g1_s, fin_s, counts_s, rng_s = jax.eval_shape(
        pre, params_s, toks_s, valid_s, z_s, z_s, z_s, key_s)
    print("cache leaf shapes:", jax.tree.map(lambda a: (a.shape, str(a.dtype)), kv_s))

    loop_kw = dict(cfg=cfg, capture=capture, max_new_tokens=NEW,
                   eos_id=-1, sampling=samp)
    loop_args = (params_s, kv_s, g1_s, fin_s, counts_s, valid_s,
                 z_s, z_s, z_s, rng_s)

    if MODE in ("default", "unstacked", "nodouble"):
        copts = None
        if MODE == "nodouble":
            copts = {"xla_tpu_enable_while_loop_double_buffering": "false"}
        lo = D._decode_loop_jit.lower(*loop_args, **loop_kw)
        report(f"loop/{MODE}", lo.compile(compiler_options=copts)
               if copts else lo.compile())
        lo_pre = D._prefill_jit.lower(
            params_s, toks_s, valid_s, z_s, z_s, z_s, key_s,
            cfg=cfg, max_new_tokens=NEW, eos_id=-1, sampling=samp,
            kv_int8=True)
        report(f"prefill/{MODE}", lo_pre.compile())
        return
    if MODE == "fused":
        lo = D.decode_greedy.lower(
            params_s, toks_s, valid_s, z_s, z_s, z_s,
            cfg=cfg, capture=capture, max_new_tokens=NEW, eos_id=-1,
            sampling=samp, kv_int8=True)
        report("fused", lo.compile())
        return

    from jax._src.layout import AutoLayout
    from jax.experimental.layout import Format

    AUTO = Format(AutoLayout())
    auto_kv = jax.tree.map(lambda _: AUTO, kv_s)
    jit_auto = jax.jit(
        functools.partial(D._decode_loop_impl, **loop_kw),
        donate_argnames=("kv",),
        in_shardings=(None, auto_kv, None, None, None, None, None, None, None, None),
        out_shardings=(None, None, None, None, None, auto_kv),
    )
    co = jit_auto.lower(*loop_args).compile()
    report("loop/AUTO", co)
    kv_fmt = co.input_formats[0][1]
    print("chosen cache formats:",
          jax.tree.map(lambda f: str(getattr(f, "layout", f)), kv_fmt))

    # prefill constrained to produce exactly those layouts
    jit_pre = jax.jit(
        functools.partial(
            D._prefill_impl, cfg=cfg, max_new_tokens=NEW, eos_id=-1,
            sampling=samp, kv_int8=True),
        out_shardings=(kv_fmt, None, None, None, None),
    )
    co_pre = jit_pre.lower(
        params_s, toks_s, valid_s, z_s, z_s, z_s, key_s).compile()
    report("prefill/constrained", co_pre)


if __name__ == "__main__":
    main()
