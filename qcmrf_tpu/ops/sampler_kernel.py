"""Fused Pallas sampling kernel: QCMRF outcomes in one pass.

The factorized outcome law (qcmrf_tpu.sim.analytic) needs, per shot, a
uniform variable state ``x`` and one Bernoulli per clique with probability
``1 - c2_k(x)``. The XLA version materializes ``(shots, K)`` intermediates
(~10 arrays of 124 MB at the benchmark size); this kernel generates
everything in VMEM/registers — hardware PRNG for both ``x`` and the
per-clique uniforms, Moebius-coefficient FMA chains for ``c2`` (same
formulation as the log-potential kernel), and in-register packing of the
ancilla bitmask — so HBM traffic is exactly the two output arrays.

Statistical contract: outcomes follow the exact circuit distribution, but
the stream differs from ``jax.random`` (TPU hardware PRNG, seeded per
block); tests assert distribution-level agreement, not bit equality.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qcmrf_tpu.models.mrf import MRF
from qcmrf_tpu.ops._common import interpret as _interpret
from qcmrf_tpu.utils import moebius
from qcmrf_tpu.sim.analytic import _moebius_layout, check_theta_domain

LANE = 128
_U24 = np.float32(1.0 / (1 << 24))


@functools.lru_cache(maxsize=256)
def _build_sampler_kernel(cliques: tuple, n: int, block_rows: int,
                          accept_only: bool = False,
                          emit_x: bool = True,
                          reduce_counts: bool = False,
                          tail: tuple = ()):
    """``accept_only=False``: second output is the ancilla bitmask
    (requires K <= 32). ``True``: second output is the 0/1 post-selection
    flag (all ancillas zero) — no clique-count limit; used by the sharded
    n=24+ estimation path. ``emit_x=False`` (accept_only paths that only
    need the acceptance rate) drops the x output entirely — half the
    kernel's HBM writes. ``reduce_counts`` (implies accept_only, no x)
    column-sums the flags in-kernel and emits one 128-lane row per grid
    block — the per-shot HBM traffic drops from 4 B (plus the 4 B XLA
    re-reads to reduce it) to nothing, leaving the kernel purely
    VPU-bound; the delta-hat estimation path."""
    K = len(cliques)
    cmax = max(len(C) for C in cliques)
    n_sub = 1 << cmax

    def kernel(seed_ref, coef_ref, *out_refs):
        if emit_x:
            x_ref, a_ref = out_refs
        else:
            (a_ref,) = out_refs
        # spread user seeds so consecutive seeds never share per-block
        # streams (block b of seed s must differ from block b-1 of s+1)
        pltpu.prng_seed(
            seed_ref[0] * jnp.int32(1_000_003) + pl.program_id(0)
        )
        shape = (block_rows, LANE)
        xbits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        x = (xbits & np.uint32((1 << n) - 1)).astype(jnp.int32)
        # bit-planes are extracted LAZILY per clique (a shift+and+cast is
        # ~free on the VPU) rather than pre-extracted one-per-variable:
        # the live VMEM set drops from ~n planes to cmax, letting the
        # block grow 4x — measured +16% throughput at the n=20 benchmark
        # (the select-tree and packed-16-bit-uniform variants both
        # measured SLOWER; the kernel is VPU-bound, not PRNG-bound)
        def bit_plane(v):
            return ((x >> (n - 1 - v)) & 1).astype(jnp.float32)
        if accept_only:
            a = jnp.ones(shape, jnp.int32)
        else:
            a = jnp.zeros(shape, jnp.uint32)
        for k in range(K):  # static unroll over cliques
            m = len(cliques[k])
            # c2_k(x) via the shared Moebius FMA chain
            bits = [bit_plane(v) for v in cliques[k]]
            base = k * n_sub
            c2 = moebius.eval_multilinear(
                bits, m, lambda s: coef_ref[base + s],
                jnp.zeros(shape, jnp.float32),
            )
            # uniform in [0, 1) from 24 high bits
            ubits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            # uint32->float32 casts are unsupported in Mosaic; the high 24
            # bits fit int32 exactly
            u = (ubits >> 8).astype(jnp.int32).astype(jnp.float32) * _U24
            if accept_only:
                a = a * (u < c2).astype(jnp.int32)
            else:
                fired = (u >= c2).astype(jnp.uint32)
                a = a | (fired << np.uint32(k))
        if emit_x:
            x_ref[:] = x
        if reduce_counts:
            if tail:
                # zero the padding rows of the (static) last grid block so
                # they don't count as accepted shots
                last_block, valid_rows = tail
                rid = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                limit = jnp.where(pl.program_id(0) == last_block,
                                  valid_rows, block_rows)
                a = a * (rid < limit).astype(jnp.int32)
            # per-lane partial counts; block_rows <= 2048 so the int32
            # column sum cannot overflow. Mosaic requires >= 8 sublane
            # rows per output block — partials go in row 0, zeros below.
            part = jnp.sum(a, axis=0, keepdims=True)
            a_ref[:] = jnp.concatenate(
                [part, jnp.zeros((7, LANE), jnp.int32)], axis=0
            )
        else:
            a_ref[:] = a

    return kernel


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 5, 6))
def _sample_call(seed, cliques_and_n, shots: int, accept_only: bool, coef,
                 emit_x: bool = True, reduce_counts: bool = False):
    cliques, n = cliques_and_n
    rows = shots // LANE
    # VMEM-aware block: cmax lazily-extracted planes + temporaries live
    cmax = max(len(C) for C in cliques)
    block_rows = moebius.vmem_block_rows(cmax + 2, rows, max_block=2048)
    # pad the row count up to a whole number of blocks (floor division
    # would leave tail rows unwritten — garbage samples); callers slice
    # back down to the requested shot count, and the reduce_counts path
    # masks the padding rows in-kernel before summing
    grid = -(-rows // block_rows)
    rows_padded = grid * block_rows
    tail = ()
    if reduce_counts and rows_padded != rows:
        tail = (grid - 1, rows - (grid - 1) * block_rows)
    kernel = _build_sampler_kernel(cliques, n, block_rows, accept_only,
                                   emit_x, reduce_counts, tail)
    bspec = pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    a_shape = jax.ShapeDtypeStruct(
        (rows_padded, LANE), jnp.int32 if accept_only else jnp.uint32
    )
    if reduce_counts:
        bspec_a = pl.BlockSpec((8, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        a_shape = jax.ShapeDtypeStruct((8 * grid, LANE), jnp.int32)
    else:
        bspec_a = bspec
    x_shape = jax.ShapeDtypeStruct((rows_padded, LANE), jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=(x_shape, a_shape) if emit_x else (a_shape,),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coef (K * 2^cmax,)
        ],
        out_specs=(bspec, bspec_a) if emit_x else (bspec_a,),
        interpret=_interpret(),
    )(seed, coef)
    if reduce_counts:
        return jnp.sum(out[0])
    if emit_x:
        return out[0].reshape(-1)[:shots], out[1].reshape(-1)[:shots]
    return out[0].reshape(-1)[:shots]


def _keep_prob_coefficients(mrf: MRF) -> jax.Array:
    """In-graph Moebius coefficients of each clique's exp(beta*theta) table,
    flattened (K * 2^cmax,)."""
    idx_map, _, cmax = _moebius_layout(mrf.cliques, mrf.n)
    tab = jnp.exp(mrf.beta * mrf.theta[jnp.asarray(idx_map)])
    return moebius.transform(tab, cmax).reshape(-1)


def sample_outcome_parts(seed, mrf: MRF, shots: int):
    """Hardware-PRNG fused sampler: returns (x, ancilla_mask).

    ``shots`` must be a multiple of 128. ``seed`` is an int32 scalar (or
    array of shape (1,)); successive grid blocks derive distinct streams.
    """
    if mrf.num_cliques > 32:
        raise ValueError("ancilla bitmask limited to 32 cliques")
    if shots % LANE:
        raise ValueError("shots must be a multiple of 128")
    check_theta_domain(mrf)
    seed = jnp.reshape(jnp.asarray(seed, jnp.int32), (1,))
    coef = _keep_prob_coefficients(mrf)
    return _sample_call(seed, (mrf.cliques, mrf.n), shots, False, coef)


def sample_postselected(seed, mrf: MRF, shots: int):
    """Hardware-PRNG fused sampler: returns (x, accepted 0/1 flags).

    No clique-count limit (the acceptance AND is computed in-kernel) —
    the throughput path for n=24+ grid estimation.
    """
    if shots % LANE:
        raise ValueError("shots must be a multiple of 128")
    check_theta_domain(mrf)
    seed = jnp.reshape(jnp.asarray(seed, jnp.int32), (1,))
    coef = _keep_prob_coefficients(mrf)
    x, a = _sample_call(seed, (mrf.cliques, mrf.n), shots, True, coef)
    return x, a == 1


def sample_accept_flags(seed, mrf: MRF, shots: int):
    """Acceptance flags ONLY (no x output — half the HBM writes of
    sample_postselected): the delta-hat / lnZ-hat estimation path, where
    the variable samples are never consumed.
    """
    if shots % LANE:
        raise ValueError("shots must be a multiple of 128")
    check_theta_domain(mrf)
    seed = jnp.reshape(jnp.asarray(seed, jnp.int32), (1,))
    coef = _keep_prob_coefficients(mrf)
    a = _sample_call(seed, (mrf.cliques, mrf.n), shots, True, coef, False)
    return a == 1


def sample_accept_count(seed, mrf: MRF, shots: int) -> jax.Array:
    """Number of accepted shots out of ``shots``, reduced IN-kernel: no
    per-shot HBM traffic at all (one 128-lane partial row per grid block),
    so throughput is the kernel's pure-VPU rate. Draws the identical PRNG
    stream as ``sample_accept_flags`` with the same seed, so
    ``count == flags.sum()`` exactly.
    """
    if shots % LANE:
        raise ValueError("shots must be a multiple of 128")
    if shots >= 1 << 31:
        # the final count accumulates in int32 (x64 disabled); capping
        # shots below 2**31 makes overflow impossible (count <= shots)
        raise ValueError("shots must be < 2**31 per call (int32 count); "
                         "loop calls for more")
    check_theta_domain(mrf)
    seed = jnp.reshape(jnp.asarray(seed, jnp.int32), (1,))
    coef = _keep_prob_coefficients(mrf)
    return _sample_call(seed, (mrf.cliques, mrf.n), shots, True, coef,
                        False, True)
