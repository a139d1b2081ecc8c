"""Benchmark: QCMRF sampling throughput at n=20 on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": R}

Task (BASELINE.json north-star config): sample full measurement outcomes of
the QCMRF circuit for an n=20 (4x5) grid MRF — 52 qubits worth of circuit
(20 variables + 31 edge-clique ancillas + workspace), far beyond any dense
statevector simulator (Aer would need 2^52 amplitudes), executed here via
the factorized outcome law P(x, a) = 2^-n * prod_k Bernoulli terms
(qcmrf_tpu.sim.analytic, exactness proven in tests against the gate-level
engine).

``vs_baseline`` is the speedup over the best *CPU numpy* implementation of
the same sampler (the honest classical stand-in for the reference's
C++ Aer backend, which cannot run this workload at all — see BASELINE.md).
"""

import json
import time

import numpy as np


def numpy_baseline(theta_tab, offsets, shifts_a, shifts_b, n, shots, reps):
    """Vectorized numpy version of the factorized sampler (pairwise grid).

    Takes the BEST (fastest) of ``reps`` runs so the reported speedup is
    conservative against host timing jitter."""
    rng = np.random.RandomState(0)
    K = len(offsets)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        x = rng.randint(0, 1 << n, size=shots).astype(np.int64)
        ba = (x[:, None] >> shifts_a) & 1
        bb = (x[:, None] >> shifts_b) & 1
        yidx = (ba << 1) | bb
        c2 = np.exp(theta_tab[np.arange(K)[None, :], yidx])
        u = rng.random_sample((shots, K))
        abits = (u >= c2).astype(np.int64)
        keys = x + ((abits << np.arange(K, dtype=np.int64)).sum(1) << (n + 1))
        best = min(best, time.perf_counter() - t0)
    return shots / best, keys


def main():
    import jax
    import jax.numpy as jnp

    from qcmrf_tpu.models.mrf import grid_mrf
    from qcmrf_tpu.sim import analytic

    SHOTS = 1 << 20  # 1M shots per call amortizes dispatch
    template = grid_mrf(4, 5)
    n, K = template.n, template.num_cliques
    rng = np.random.RandomState(0)
    theta = -np.abs(rng.randn(template.dimension)).astype(np.float32) * 0.3
    mrf = template.with_theta(jnp.asarray(theta))

    # --- TPU path: fused Pallas sampler (hardware PRNG, single pass) ----
    from qcmrf_tpu.ops import sampler_kernel

    fn = jax.jit(lambda s: sampler_kernel.sample_outcome_parts(s, mrf, SHOTS))
    jax.block_until_ready(fn(0))  # compile
    reps = 20
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    tpu_rate = SHOTS / dt

    # --- CPU numpy baseline --------------------------------------------
    offsets = np.asarray(template.theta_offsets)
    theta_tab = np.stack(
        [theta[o: o + 4] for o in offsets]
    )  # (K, 4) pairwise tables
    sa = np.array([n - 1 - C[0] for C in template.cliques], dtype=np.int64)
    sb = np.array([n - 1 - C[1] for C in template.cliques], dtype=np.int64)
    cpu_rate, _ = numpy_baseline(
        theta_tab, offsets, sa, sb, n, shots=1 << 17, reps=7
    )

    # sanity: acceptance rate matches Z/2^n (delta ~ 5.5e-4 at this theta,
    # so compare with a tolerance proportional to the value)
    acc = float((np.asarray(out[1]) == 0).mean())
    expected = float(mrf.success_rate())
    assert abs(acc - expected) < max(0.2 * expected, 1e-4), (acc, expected)

    print(json.dumps({
        "metric": "qcmrf outcome sampling, n=20 grid (20 vars + 31 ancillas)",
        "value": round(tpu_rate),
        "unit": "shots/sec",
        "vs_baseline": round(tpu_rate / cpu_rate, 1),
    }))


if __name__ == "__main__":
    main()
