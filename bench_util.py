"""Shared helpers for the repo-root benchmark scripts."""

import numpy as np


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
    while need > 0:
        z = rng.zipf(a, size=int(need / 0.17) + 1024)
        z = z[z >= lo]
        out.append(z[:need])
        need -= len(out[-1])
    return np.concatenate(out)
