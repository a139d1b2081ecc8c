"""Fused Pallas sampler: statistical agreement with the exact law.

Runs in interpret mode on CPU (skipped if the interpreter lacks the TPU
PRNG primitives); the TPU statistics are additionally asserted by bench.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qcmrf_tpu.models.mrf import MRF, grid_mrf
from qcmrf_tpu.sim import analytic


def _kernel_available():
    from qcmrf_tpu.ops import sampler_kernel

    try:
        sampler_kernel.sample_outcome_parts(
            0, MRF.create([[0, 1]], theta=[-0.2] * 4), 256
        )
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _kernel_available(),
    reason="TPU PRNG primitives unavailable in this interpreter",
)


def test_sampler_kernel_statistics():
    from qcmrf_tpu.ops import sampler_kernel

    rng = np.random.RandomState(0)
    mrf = MRF.create([[0, 1], [1, 2]],
                     theta=-np.abs(rng.randn(8)) * 0.4)
    x, a = sampler_kernel.sample_outcome_parts(7, mrf, 1 << 16)
    x, a = np.asarray(x), np.asarray(a)
    # acceptance ~ Z/2^n
    assert np.isclose((a == 0).mean(), float(mrf.success_rate()), atol=0.02)
    # accepted x ~ Gibbs
    acc = a == 0
    emp = np.bincount(x[acc], minlength=mrf.num_states) / acc.sum()
    np.testing.assert_allclose(
        emp, np.asarray(mrf.gibbs_probs()), atol=0.02
    )
    # unconditional x uniform
    u = np.bincount(x, minlength=mrf.num_states) / len(x)
    np.testing.assert_allclose(u, 1.0 / mrf.num_states, atol=0.01)


def test_sampler_kernel_deterministic_per_seed():
    from qcmrf_tpu.ops import sampler_kernel

    mrf = MRF.create([[0, 1]], theta=[-0.3] * 4)
    x1, a1 = sampler_kernel.sample_outcome_parts(42, mrf, 512)
    x2, a2 = sampler_kernel.sample_outcome_parts(42, mrf, 512)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    x3, _ = sampler_kernel.sample_outcome_parts(43, mrf, 512)
    assert not np.array_equal(np.asarray(x1), np.asarray(x3))


def test_accept_flags_match_postselected():
    """Flags-only variant: identical stream to sample_postselected for
    the same seed (the only difference is skipping the x output)."""
    from qcmrf_tpu.ops import sampler_kernel

    rng = np.random.RandomState(2)
    mrf = MRF.create([[0, 1], [1, 2]], theta=-np.abs(rng.randn(8)) * 0.4)
    _x, acc = sampler_kernel.sample_postselected(11, mrf, 1 << 13)
    flags = sampler_kernel.sample_accept_flags(11, mrf, 1 << 13)
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(flags))


def test_keep_prob_coefficients_reconstruct():
    from qcmrf_tpu.ops import sampler_kernel

    rng = np.random.RandomState(1)
    mrf = grid_mrf(2, 2)
    mrf = mrf.with_theta(-np.abs(rng.randn(mrf.dimension)) * 0.5)
    coef = np.asarray(sampler_kernel._keep_prob_coefficients(mrf))
    # evaluate the multilinear form by brute force and compare with exp
    x = np.arange(mrf.num_states)
    c2 = np.asarray(analytic.clique_keep_probs(mrf, jnp.asarray(x)))
    _, shifts, cmax = analytic._moebius_layout(mrf.cliques, mrf.n)
    for k, C in enumerate(mrf.cliques):
        for xi in x:
            val = 0.0
            for s in range(1 << cmax):
                term = coef[k * (1 << cmax) + s]
                for i in range(cmax):
                    if (s >> i) & 1:
                        if i < len(C):
                            term *= (xi >> shifts[i, k]) & 1
                        else:
                            term *= 0
                val += term
            assert np.isclose(val, c2[xi, k], rtol=1e-4), (k, xi)


def test_sampler_kernel_ragged_shots():
    """shots not a multiple of block_rows*128 must still return valid
    samples for every slot (floor-division grid used to leave garbage)."""
    from qcmrf_tpu.ops import sampler_kernel

    mrf = MRF.create([[0, 1]], theta=[-0.3] * 4)
    x, a = sampler_kernel.sample_outcome_parts(3, mrf, 128 * 600)
    x = np.asarray(x)
    assert x.shape == (128 * 600,)
    assert x.min() >= 0 and x.max() < mrf.num_states


def test_sampler_kernel_seed_streams_disjoint():
    """Consecutive seeds must not share per-block streams."""
    from qcmrf_tpu.ops import sampler_kernel

    mrf = MRF.create([[0, 1]], theta=[-0.3] * 4)
    shots = 128 * 512 * 2  # two grid blocks
    x0, _ = sampler_kernel.sample_outcome_parts(0, mrf, shots)
    x1, _ = sampler_kernel.sample_outcome_parts(1, mrf, shots)
    half = shots // 2
    # block 1 of seed 0 must differ from block 0 of seed 1
    assert not np.array_equal(np.asarray(x0)[half:], np.asarray(x1)[:half])


def test_accept_count_matches_flags_sum():
    """In-kernel reduction draws the identical stream as the flags path,
    so the count equals flags.sum() exactly — including when the shot
    count is not a whole number of kernel blocks (tail masking)."""
    from qcmrf_tpu.ops import sampler_kernel

    rng = np.random.RandomState(3)
    mrf = grid_mrf(3, 3).with_theta(
        jnp.asarray(-np.abs(rng.randn(48)).astype(np.float32) * 0.3))
    # (1 << 18) + 128 is the smallest case that actually exercises the
    # in-kernel tail masking: a full 2048x128 block plus one padded block
    # (grid 2). The smaller cases run grid 1 with block == array.
    for shots in (1 << 14, (1 << 14) - 128, 384, (1 << 18) + 128):
        flags = np.asarray(
            sampler_kernel.sample_accept_flags(11, mrf, shots))
        cnt = int(sampler_kernel.sample_accept_count(11, mrf, shots))
        assert flags.shape == (shots,)
        assert cnt == flags.sum(), (shots, cnt, flags.sum())
