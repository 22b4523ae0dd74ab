"""Shared helpers for the repo-root benchmark scripts."""

import numpy as np


def require_live_device(timeout_s: float = 0.0) -> None:
    """Fail FAST if the device backend is unreachable.

    The TPU here rides an RPC tunnel whose relay can die outright (it has,
    twice): every device op then hangs forever, and a driver-invoked bench
    would hang with it. Run one trivial jit + device->host fetch (the only
    true sync on this tunnel) under a watchdog; on timeout, print a clear
    diagnostic and hard-exit nonzero so the caller records a failure
    instead of a stall.

    Timeout default is 480 s (override with BENCH_PROBE_TIMEOUT): round 3's
    240 s default false-positived — a live-but-degraded tunnel measured
    117 s for this trivial probe, and the harness recorded "tunnel down"
    for a session that would have succeeded. The persistent compilation
    cache is enabled BEFORE the probe so its compile is cached across runs.
    """
    import concurrent.futures
    import os
    import sys

    if timeout_s <= 0:
        timeout_s = float(os.environ.get("BENCH_PROBE_TIMEOUT", 480.0))

    forced = os.environ.get("BENCH_PLATFORM")
    if forced:
        # CPU smoke path while the tunnel is down. The JAX_PLATFORMS env
        # var does NOT override this machine's sitecustomize pin
        # ("axon,cpu"); only an in-process config update does.
        import jax

        jax.config.update("jax_platforms", forced)
        return

    def _probe() -> float:
        import jax
        import jax.numpy as jnp

        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return float(np.asarray(jax.jit(jnp.sum)(jnp.ones((8, 128)))))

    ex = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    try:
        ex.submit(_probe).result(timeout=timeout_s)
    except concurrent.futures.TimeoutError:
        print(
            f"[bench] device probe did not complete in {timeout_s:.0f}s — "
            "TPU tunnel is down (relay dead?); aborting instead of hanging",
            file=sys.stderr,
            flush=True,
        )
        os._exit(2)  # the probe thread is stuck in an unkillable RPC wait
    finally:
        ex.shutdown(wait=False)


def zipf_tokens(rng, n, a=1.3, lo=180):
    """Exactly ``n`` Zipf(a) draws >= ``lo``.

    A fixed 3x oversample only survives the ``>= lo`` filter ~18% of the
    time — round 2's corpus silently came out at ~53% of the stated doc
    count, with the tail docs empty. The rejection loop keeps drawing until
    exactly ``n`` survivors exist (one shared implementation for bench.py,
    bench_e2e.py, and bench_wiki_scale.py so the corpus shape can't diverge
    between benches again)."""
    out = []
    need = n
    # cap each draw at 256M so the oversampled int64 batch stays ~2 GB —
    # a single need/0.17 draw at wiki scale (21M docs x 60 tokens) would
    # be a ~59 GB allocation
    max_draw = 256_000_000
    while need > 0:
        z = rng.zipf(a, size=min(int(need / 0.17) + 1024, max_draw))
        z = z[z >= lo]
        out.append(z[:need])
        need -= len(out[-1])
    return np.concatenate(out)
