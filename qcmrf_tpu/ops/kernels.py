"""Pallas TPU kernels — the hot ops of the framework.

These replace the compute cores the reference delegates to native engines
(Aer's C++ statevector loops, kiopto's exact inference; SURVEY.md §2.3
N1/N5) with TPU kernels designed around the hardware:

* state tables live as ``(rows, 128)`` float32 arrays (lane-aligned);
* the log-potential table kernel computes ``beta * theta^T phi(x)`` for a
  block of states entirely in registers/VMEM: basis indices are derived
  from ``broadcasted_iota``, clique-state indices by shift/mask bit
  arithmetic, and the theta lookup is a one-hot contraction against a
  small padded ``(K, 2^cmax)`` table — no gather, no ``(2^n, K, cmax)``
  HBM intermediates (the jnp reference path materializes those);
* single-qubit gate application on *lane* qubits (q < 7) is recast as a
  ``(rows, 128) @ (128, 128)`` matmul with the gate embedded as
  ``I_{2^(6-q)} ⊗ U ⊗ I_{2^q}`` — the MXU does the permutation work that
  would otherwise be an in-lane shuffle; *row* qubits (q >= 7) are a
  two-row linear combination over a strided view;
* complex amplitudes are stored as separate real/imag planes (the TPU
  backend has no complex support), so every gate is a pair of real
  contractions.

Kernels run with ``interpret=True`` automatically off-TPU so the unit
suite exercises them on CPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qcmrf_tpu.models.mrf import MRF
from qcmrf_tpu.utils import moebius

from qcmrf_tpu.ops._common import interpret as _interpret

LANE = 128
_MIN_KERNEL_N = 10  # below this, plain jnp is faster than kernel launch


# --------------------------------------------------------------------------
# Log-potential table kernel: out[x] = beta * sum_k theta_k[y_k(x)]
#
# TPU-first formulation: the clique structure is *static*, so the kernel is
# generated per structure with the clique loop unrolled in Python — bit
# positions are immediate constants (no SMEM-dependent control flow) — and
# each clique's theta table is converted host-side to its multilinear
# (Moebius) coefficients, turning the per-state evaluation into a short
# fused-multiply-add chain over bit monomials:
#
#   theta_k(y) = sum_{S subset of clique} c_S * prod_{i in S} bit_i(x)
#
# The only runtime inputs are the coefficient vector (SMEM) and beta, so
# one compiled kernel serves every theta of the same graph.
# --------------------------------------------------------------------------


def _moebius_coefficients(mrf: MRF) -> jax.Array:
    """Multilinear coefficients of every clique table, padded (K * 2^cmax,).

    Entry layout per clique: subset ``s`` encoded with bit ``i`` <-> clique
    slot ``i`` (slot order = clique variable order); cliques smaller than
    cmax alias the extra slots down, so their high-subset coefficients
    vanish after the transform. Pure jnp (traceable: theta may be a
    tracer inside shard_map / grad), tiny ((K, 2^cmax)) work.
    """
    from qcmrf_tpu.sim.analytic import _moebius_layout

    idx_map, _, cmax = _moebius_layout(mrf.cliques, mrf.n)
    tab = mrf.theta[jnp.asarray(idx_map)].astype(jnp.float32)
    return moebius.transform(tab, cmax).reshape(-1)


def _logpot_block(x, coef_ref, beta_ref, cliques, n: int, fuse_amp: bool):
    """Moebius FMA evaluation of beta*logpot for a block of state ids.

    ``coef_ref`` holds the padded (K * 2^cmax,) multilinear coefficients
    from :func:`_moebius_coefficients`."""
    cmax = max(len(C) for C in cliques)

    # one live bit-plane per used variable, shared across cliques
    var_bits = moebius.extract_bit_planes(
        x, [v for C in cliques for v in C], n
    )

    acc = jnp.zeros(x.shape, jnp.float32)
    for k, C in enumerate(cliques):  # static unroll over cliques
        off = k << cmax
        acc = moebius.eval_multilinear(
            [var_bits[v] for v in C], len(C),
            lambda s: coef_ref[off + s], acc,
        )
    acc = beta_ref[0] * acc
    if fuse_amp:
        return jnp.exp(0.5 * acc) * (2.0 ** (-0.5 * n))
    return acc


def _split_cliques(cliques: tuple, n: int, L: int):
    """Partition cliques by a block cut at state-id bit ``L``: variable v
    lives in a block's LOW id bits iff its bit position (n-1-v) < L
    (variable 0 = MSB; see utils/bits.py)."""
    low, high, cross = [], [], []
    for k, C in enumerate(cliques):
        inlow = [(n - 1 - v) < L for v in C]
        if all(inlow):
            low.append((k, tuple(C)))
        elif not any(inlow):
            high.append((k, tuple(C)))
        else:
            cross.append((k, tuple(C)))
    return low, high, cross


def _split_logpot(offset, coef_ref, cliques, n: int, L: int):
    """Block-invariant / per-block split of the Moebius log-potential sum
    for single-program loop kernels sweeping 2^L-state blocks.

    Every block's state ids decompose as ``x = base_blocks * 2^L +
    offset`` (the loop kernels' block size is a power of two and every
    caller's ``x0`` is a multiple of it — full sweeps use x0=0, ICI
    shards start at device*2^(n-dlog)), so

    * cliques entirely in LOW id bits contribute identically in every
      block: evaluated ONCE on the offset planes (returned ``acc0``);
    * cliques entirely in HIGH bits reduce to ONE scalar per block;
    * crossing cliques reduce to per-block scalar coefficients FMA'd
      onto loop-invariant low-bit monomial planes.

    Per-block VECTOR work then scales with the number of cut-crossing
    cliques, not the total clique count — for grid models the cut
    crosses ~1 column of edges, so the former per-block re-evaluation
    of every clique (``_logpot_block``) drops ~10x of its VPU work.

    Returns ``(invariants, vary)``: ``invariants`` is a flat tuple of
    (block, LANE) planes (the low-clique accumulator first, then the
    crossing cliques' monomials) and ``vary(base_blocks, invariants)``
    evaluates the full per-block log-potential. ``base_blocks`` is the
    absolute block index ``x >> L`` — working in BLOCK units keeps every
    in-kernel integer below int32 even past the 2^31-state-id limit
    (bit ``p`` of x for p >= L is bit ``p - L`` of base_blocks), which
    is what lets the streaming lnZ run n >= 32 on int32 hardware.
    Callers MUST thread ``invariants`` through their ``fori_loop``
    carry: Mosaic does not reliably hoist multi-plane invariant
    subgraphs out of the loop (measured: the n=24 grid recomputed ~4 MB
    of planes every iteration, 10x slower per step, while the n=28
    compile hoisted).
    """
    cmax = max(len(C) for C in cliques)
    low, high, cross = _split_cliques(cliques, n, L)

    lowvars = [v for _, C in low + cross for v in C if (n - 1 - v) < L]
    planes = moebius.extract_bit_planes(offset, lowvars, n)
    acc0 = jnp.zeros(offset.shape, jnp.float32)
    for k, C in low:
        off = k << cmax
        acc0 = moebius.eval_multilinear(
            [planes[v] for v in C], len(C),
            lambda s, off=off: coef_ref[off + s], acc0,
        )

    # loop-invariant low-bit monomial planes of the crossing cliques,
    # one per (clique, nonempty low-slot subset); slot bit i <-> C[i].
    # Flattened into the invariants tuple in deterministic order so the
    # kernels can carry them through fori_loop.
    mono_index = {}
    mono_planes = []
    cross_meta = []
    for k, C in cross:
        L_slots = [i for i, v in enumerate(C) if (n - 1 - v) < L]
        H_slots = [i for i, v in enumerate(C) if (n - 1 - v) >= L]
        for t in range(1, 1 << len(L_slots)):
            sl, p = 0, None
            for j in range(len(L_slots)):
                if (t >> j) & 1:
                    sl |= 1 << L_slots[j]
                    b = planes[C[L_slots[j]]]
                    p = b if p is None else p * b
            mono_index[(k, sl)] = len(mono_planes)
            mono_planes.append(p)
        cross_meta.append((k, C, L_slots, H_slots))

    hvars = sorted({v for _, C in high + cross for v in C
                    if (n - 1 - v) >= L})
    invariants = (acc0,) + tuple(mono_planes)

    def vary(base_blocks, inv):
        acc0, monos = inv[0], inv[1:]
        hb = {v: ((base_blocks >> (n - 1 - v - L)) & 1).astype(jnp.float32)
              for v in hvars}
        sacc = jnp.float32(0.0)
        for k, C in high:
            off = k << cmax
            sacc = moebius.eval_multilinear(
                [hb[v] for v in C], len(C),
                lambda s, off=off: coef_ref[off + s], sacc,
            )
        acc = acc0
        for k, C, L_slots, H_slots in cross_meta:
            off = k << cmax

            def hidx(s, H_slots=H_slots):
                e = 0
                for j in range(len(H_slots)):
                    if (s >> j) & 1:
                        e |= 1 << H_slots[j]
                return e

            for t in range(1 << len(L_slots)):
                sl = 0
                for j in range(len(L_slots)):
                    if (t >> j) & 1:
                        sl |= 1 << L_slots[j]
                # scalar reduced coefficient: the clique's multilinear
                # form marginalized onto this low-slot subset at the
                # block's high bits
                cL = moebius.eval_multilinear(
                    [hb[C[i]] for i in H_slots], len(H_slots),
                    lambda s, off=off, sl=sl, hidx=hidx:
                        coef_ref[off + sl + hidx(s)],
                    jnp.float32(0.0),
                )
                if sl == 0:
                    sacc = sacc + cL
                else:
                    acc = acc + cL * monos[mono_index[(k, sl)]]
        return acc + sacc

    return invariants, vary


@functools.lru_cache(maxsize=256)
def _build_logpot_kernel(cliques: tuple, n: int, block_rows: int,
                         fuse_amp: bool):
    """Structure-specialized kernel body (grid-parallel variant)."""

    def kernel(coef_ref, beta_ref, x0_ref, out_ref):
        i = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 1)
        # x0 offsets the state ids — used by the ICI-sharded path where
        # each device owns a contiguous slice of the 2**n state space
        x = x0_ref[0] + (i * block_rows + rows) * LANE + cols
        out_ref[:] = _logpot_block(x, coef_ref, beta_ref, cliques, n,
                                   fuse_amp)

    return kernel


@functools.lru_cache(maxsize=256)
def _build_logpot_loop_kernel(cliques: tuple, n: int, block_rows: int,
                              num_blocks: int, fuse_amp: bool):
    """Single-program variant: fori_loop over row blocks, DMA to HBM out.

    The axon remote compiler's time explodes with Pallas grid size (n=22:
    10 min at grid 32; n=24: 28 min at grid 128, measured 2026-08-16), so
    large tables run the whole sweep in ONE grid program with a dynamic
    loop — compile time is then independent of n.
    """

    assert block_rows & (block_rows - 1) == 0, block_rows

    def kernel(coef_ref, beta_ref, x0_ref, out_hbm_ref):
        def body(scratch, sem):
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (block_rows, LANE), 0
            )
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (block_rows, LANE), 1
            )
            offset = rows * LANE + cols
            L = block_rows.bit_length() - 1 + 7  # log2(block states)
            inv0, vary = _split_logpot(offset, coef_ref, cliques, n, L)
            x0b = x0_ref[0] // (block_rows * LANE)  # block units

            def step(i, inv):
                acc = beta_ref[0] * vary(x0b + i, inv)
                if fuse_amp:
                    acc = jnp.exp(0.5 * acc) * (2.0 ** (-0.5 * n))
                scratch[:] = acc
                dma = pltpu.make_async_copy(
                    scratch,
                    out_hbm_ref.at[pl.ds(i * block_rows, block_rows), :],
                    sem,
                )
                dma.start()
                dma.wait()
                return inv

            jax.lax.fori_loop(0, num_blocks, step, inv0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((block_rows, LANE), jnp.float32),
            sem=pltpu.SemaphoreType.DMA,
        )

    return kernel


_MAX_GRID = 8  # beyond this, remote-compile latency explodes (see above)

#: term-count cap for the masked-rotation-composition formulation (6 VPU
#: FMAs per term replace two whole-block cos/sin sweeps); beyond it the
#: accumulated-angle + transcendental path is cheaper again. The (cos-1,
#: sin) pairs MUST be precomputed host-side: in-kernel scalar cos/sin on
#: SMEM values makes the remote Mosaic compile ~100x slower (measured).
_MAX_ROTOR_TERMS = 12

#: support-size cap for the multilinear cos/sin select below. 2**k
#: coefficients per trig function stay numerically tame (worst f32 error
#: 6e-7 over randomized profiles at k <= 5) and the evaluation cost is
#: ~3 VPU ops per subset, but coefficient magnitude grows ~2**k so keep
#: the cap conservative.
_MAX_MOEBIUS_BITS = 4


def _cs_support(terms: tuple):
    """Support positions when a phase profile qualifies for the
    multilinear (Moebius) cos/sin select, else ``None``.

    A profile ``ang(x) = base + sum_t a_t * mask_t(x)`` only depends on
    its support bits S, so ``cos(ang)`` / ``sin(ang)`` are functions on
    {0,1}^|S| and equal their multilinear extensions EXACTLY at binary
    points. Host-side we tabulate the 2^|S| trig values and Moebius-
    transform them; the kernel then evaluates two FMA chains over shared
    bit monomials (~3 ops per subset) instead of composing one masked
    rotation per term (~8-10 ops per term). QCMRF's nu profiles are
    complete partitions (2^k terms over k clique-variable bits), where
    this is a ~3-4x VPU-op reduction; sparse profiles (few terms over
    many bits) keep the rotor path.
    """
    support = tuple(sorted({p for conds in terms for p, _ in conds}))
    k = len(support)
    if 0 < k <= _MAX_MOEBIUS_BITS and 3 * (1 << k) <= 8 * len(terms):
        return support
    return None


def _moebius_layout(profile_terms: tuple, tail_off: int):
    """Per-profile (support|None, SMEM offset) blocks appended after the
    existing angle layout at ``tail_off``; wrapper and kernel builder
    both derive offsets from this single convention."""
    blocks = []
    off = tail_off
    for terms in profile_terms:
        sup = _cs_support(terms)
        blocks.append((sup, off))
        if sup is not None:
            off += 2 * (1 << len(sup))
    return tuple(blocks), off


def _cs_coeff_block(terms: tuple, angles, base):
    """Host-side: multilinear coefficients of cos/sin over the profile's
    support bits — ``2 * 2^k`` floats ``[c_coefs..., s_coefs...]``
    (subset bit i of the coefficient index <-> support position i, the
    :mod:`qcmrf_tpu.utils.moebius` convention). ``angles``/``base`` may
    be traced (the sharded engine's device-bit-conditioned profiles)."""
    support = _cs_support(terms)
    k = len(support)
    pos_idx = {p: i for i, p in enumerate(support)}
    M = np.zeros((1 << k, max(len(terms), 1)), np.float32)
    for y in range(1 << k):
        for t, conds in enumerate(terms):
            M[y, t] = float(all(((y >> pos_idx[p]) & 1) == w
                                for p, w in conds))
    terms_a = jnp.asarray(list(angles), jnp.float32).reshape(-1)
    ang = (jnp.asarray(base, jnp.float32)
           + (M[:, :terms_a.size] @ terms_a if terms_a.size
              else jnp.zeros((1 << k,), jnp.float32)))
    cvals = moebius.transform(jnp.cos(ang)[None, :], k)[0]
    svals = moebius.transform(jnp.sin(ang)[None, :], k)[0]
    return jnp.concatenate([cvals, svals])


def _moebius_cs_eval(bit: dict, support: tuple, ang_ref, off: int,
                     shape: tuple):
    """In-kernel evaluation of the two multilinear FMA chains written by
    :func:`_cs_coeff_block`, sharing the bit monomials between cos and
    sin."""
    k = len(support)
    bl = [bit[p] for p in support]
    c = jnp.full(shape, 1.0) * ang_ref[off]
    s = jnp.full(shape, 1.0) * ang_ref[off + (1 << k)]
    prods = {0: None}
    for t in range(1, 1 << k):
        low = t & (-t)
        rest = t ^ low
        b = bl[low.bit_length() - 1]
        p = b if prods[rest] is None else prods[rest] * b
        prods[t] = p
        c = c + ang_ref[off + t] * p
        s = s + ang_ref[off + (1 << k) + t] * p
    return c, s


def _pick_block_rows(cliques: tuple, rows: int) -> int:
    """Block size bounded by Mosaic's 16 MB scoped VMEM: the kernel keeps
    one bit-plane per used variable live (shared across cliques) plus the
    scratch/output block."""
    used = len({v for C in cliques for v in C})
    return moebius.vmem_block_rows(used, rows)


def _split_live_planes(cliques: tuple, n: int, block_rows: int) -> int:
    """Live (block, LANE) f32 planes the split-loop kernels carry through
    their fori_loop at this block size: one bit-plane per low variable,
    the low-clique accumulator, and one loop-invariant monomial plane per
    (crossing clique, nonempty low-slot subset) — the ``invariants``
    tuple of :func:`_split_logpot`, which must stay resident (Mosaic
    recomputes rather than spills; see the _split_logpot docstring)."""
    L = block_rows.bit_length() - 1 + 7
    low, high, cross = _split_cliques(cliques, n, L)
    lowvars = {v for _, C in low + cross for v in C if (n - 1 - v) < L}
    monos = sum(
        (1 << sum(1 for v in C if (n - 1 - v) < L)) - 1 for _, C in cross
    )
    return len(lowvars) + 1 + monos


def _pick_loop_block_rows(cliques: tuple, n: int, rows: int) -> int:
    """Block size for the single-program loop kernels: like
    :func:`_pick_block_rows` but budgeting the split kernel's ACTUAL
    live-plane count — crossing cliques carry 2^|low-slots|-1 monomial
    planes each, which the distinct-variable count misses for
    higher-order cliques. The count depends on the cut position (which
    depends on the block size), hence the shrink-until-fit loop."""
    block = _pick_block_rows(cliques, rows)
    while block > 8:
        planes = _split_live_planes(cliques, n, block)
        if block <= moebius.vmem_block_rows(planes, rows):
            break
        block //= 2
    return block


def _logpot_call_sized(cliques: tuple, n: int, fuse_amp: bool,
                       num_states: int, coef, beta, x0):
    """Kernel invocation producing ``num_states`` entries starting at x0."""
    rows = num_states // LANE
    block_rows = _pick_block_rows(cliques, rows)
    grid = rows // block_rows
    smem = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # coef (d,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # beta (1,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # x0 (1,)
    ]
    if grid <= _MAX_GRID or _interpret():
        kernel = _build_logpot_kernel(cliques, n, block_rows, fuse_amp)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            grid=(grid,),
            in_specs=smem,
            out_specs=pl.BlockSpec(
                (block_rows, LANE), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            interpret=_interpret(),
        )(coef, beta, x0)
    else:
        # the loop kernel carries _split_logpot's invariants through its
        # fori_loop — re-pick the block with the split-aware VMEM budget
        block_rows = _pick_loop_block_rows(cliques, n, rows)
        grid = rows // block_rows
        kernel = _build_logpot_loop_kernel(cliques, n, block_rows, grid,
                                           fuse_amp)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
            in_specs=smem,
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            interpret=_interpret(),
        )(coef, beta, x0)
    return out.reshape(-1)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _logpot_call(cliques: tuple, n: int, fuse_amp: bool, coef, beta):
    return _logpot_call_sized(
        cliques, n, fuse_amp, 1 << n, coef, beta,
        jnp.zeros((1,), jnp.int32),
    )


def all_log_potentials(mrf: MRF) -> jax.Array:
    """``beta * theta^T phi(x)`` for all ``2**n`` states (Pallas).

    Drop-in accelerated version of ``beta * mrf.all_log_potentials()``;
    falls back to the jnp path for small n where a kernel launch would
    dominate.
    """
    if mrf.n < _MIN_KERNEL_N:
        return mrf.beta * mrf.all_log_potentials()
    coef = _moebius_coefficients(mrf)
    beta = jnp.reshape(jnp.asarray(mrf.beta, jnp.float32), (1,))
    return _logpot_call(mrf.cliques, mrf.n, False, coef, beta)


def gibbs_probs(mrf: MRF) -> jax.Array:
    """Exact Gibbs probabilities via the Pallas log-potential kernel."""
    lp = all_log_potentials(mrf)
    return jax.nn.softmax(lp)


@functools.lru_cache(maxsize=256)
def _build_lse_loop_kernel(cliques: tuple, n: int, block_rows: int,
                           num_blocks: int):
    """Streaming logsumexp over the log-potential table WITHOUT
    materializing it: a single grid program sweeps the state space with a
    fori_loop, carrying per-lane running (max, scaled-sum) pairs in
    vector registers. HBM traffic drops from write-1-table +
    read-it-back-twice to one (8, 128) output block, and the
    block-invariant split (:func:`_split_logpot`) removes the VPU
    bottleneck the first version had: re-evaluating every clique per
    block cost 48.8 ms at n=28, the split's cut-only per-block work
    costs 7.4 ms (grid 4x7) and 14.2 ms at n=31 (chain; was 381 ms) —
    where the 8.6 GB table would not fit beside anything else. Both
    validated against variable elimination."""

    assert block_rows & (block_rows - 1) == 0, block_rows

    def kernel(coef_ref, beta_ref, x0b_ref, out_ref):
        # x0b_ref is the slice start in BLOCK units (states >> L): block
        # units keep every in-kernel integer inside int32 past n=31
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 1)
        offset = rows * LANE + cols
        L = block_rows.bit_length() - 1 + 7  # log2(states per block)
        inv0, vary = _split_logpot(offset, coef_ref, cliques, n, L)

        def step(i, carry):
            m, s, inv = carry
            acc = beta_ref[0] * vary(x0b_ref[0] + i, inv)
            bm = jnp.max(acc, axis=0, keepdims=True)
            bs = jnp.sum(jnp.exp(acc - bm), axis=0, keepdims=True)
            new_m = jnp.maximum(m, bm)
            s = s * jnp.exp(m - new_m) + bs * jnp.exp(bm - new_m)
            return new_m, s, inv

        m0 = jnp.full((1, LANE), -jnp.inf, jnp.float32)
        s0 = jnp.zeros((1, LANE), jnp.float32)
        m, s, _ = jax.lax.fori_loop(0, num_blocks, step, (m0, s0, inv0))
        # row 0: per-lane max, row 1: per-lane scaled sum (Mosaic wants
        # >= 8 sublane rows per output block)
        out_ref[:] = jnp.concatenate(
            [m, s, jnp.zeros((6, LANE), jnp.float32)], axis=0
        )

    return kernel


def lse_block_states(cliques: tuple, n: int, num_states: int) -> int:
    """States per block of the streaming-lnZ kernel — the unit of its
    ``x0_blocks`` argument (callers with a device-slice offset divide by
    this; keeping x0 in block units is what stays inside int32 for
    n >= 32). Must match :func:`_lse_partials_call`'s internal pick,
    hence the shared split-aware helper."""
    return _pick_loop_block_rows(cliques, n, num_states // LANE) * LANE


@functools.lru_cache(maxsize=256)
def _build_map_loop_kernel(cliques: tuple, n: int, block_rows: int,
                           num_blocks: int):
    """Streaming argmax over the log-potential table: same sweep as the
    lnZ kernel (block-invariant split, block-unit bases), carrying the
    per-lane (best value, best block, best in-block row). The id
    coordinates ride as float32 — exact for blocks < 2^24 and rows <
    2^24, far above any reachable sweep — so the host can reconstruct
    the >int32 state id ``((block * block_rows + row) * 128 + lane)``
    with int64 math. Value ties resolve to the earliest block / lowest
    row (argmax semantics); cross-lane ties resolve to the lowest lane
    at combine time, which may not be the lowest id — measure-zero for
    generic theta."""

    assert block_rows & (block_rows - 1) == 0, block_rows

    def kernel(coef_ref, beta_ref, x0b_ref, out_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 1)
        offset = rows * LANE + cols
        L = block_rows.bit_length() - 1 + 7
        inv0, vary = _split_logpot(offset, coef_ref, cliques, n, L)

        def step(i, carry):
            best, blk, row, inv = carry
            acc = beta_ref[0] * vary(x0b_ref[0] + i, inv)
            bm = jnp.max(acc, axis=0, keepdims=True)
            br = jnp.argmax(acc, axis=0, keepdims=True).astype(jnp.float32)
            upd = bm > best
            best = jnp.where(upd, bm, best)
            blk = jnp.where(upd, (x0b_ref[0] + i).astype(jnp.float32), blk)
            row = jnp.where(upd, br, row)
            return best, blk, row, inv

        best0 = jnp.full((1, LANE), -jnp.inf, jnp.float32)
        zero = jnp.zeros((1, LANE), jnp.float32)
        best, blk, row, _ = jax.lax.fori_loop(
            0, num_blocks, step, (best0, zero, zero, inv0))
        out_ref[:] = jnp.concatenate(
            [best, blk, row, jnp.zeros((5, LANE), jnp.float32)], axis=0
        )

    return kernel


def map_block_states(cliques: tuple, n: int, num_states: int) -> int:
    """States per block of the streaming-MAP kernel — the unit of its
    ``x0_blocks`` argument AND of the (block, row, lane) id coordinates
    it returns, so the sharded MAP's host-side id reconstruction depends
    on it (parallel/sharded.py::_map_slice_parts). Must match
    :func:`_map_partials_call`'s internal pick — today identical to
    :func:`lse_block_states`, but the contract is pinned here by name so
    a MAP-only block-size tweak cannot silently skew reconstructed ids."""
    return _pick_loop_block_rows(cliques, n, num_states // LANE) * LANE


def map_partials_decode(cliques: tuple, n: int, num_states: int, out):
    """(state_id, value) from one (8, LANE) MAP-partials output — THE
    host-side inverse of the kernel's (value, block, row, lane)
    coordinates, pinned next to :func:`map_block_states` so every
    full-sweep decoder (single-chip MAP, streaming PAM) shares it.
    ``state_id`` is a host int (int64-safe past n=31)."""
    out = np.asarray(out)
    block_rows = map_block_states(cliques, n, num_states) // LANE
    lane = int(np.argmax(out[0]))
    state = ((int(out[1, lane]) * block_rows + int(out[2, lane])) * LANE
             + lane)
    return state, float(out[0, lane])


def _map_partials_call(cliques: tuple, n: int, num_states: int, coef,
                       beta, x0_blocks):
    """(best value, best ABSOLUTE block, best in-block row) per lane over
    ``num_states`` states starting at block index ``x0_blocks`` (block
    unit = :func:`map_block_states`; the ICI-sharded MAP passes a
    device-slice offset)."""
    rows = num_states // LANE
    block_rows = map_block_states(cliques, n, num_states) // LANE
    kernel = _build_map_loop_kernel(cliques, n, block_rows,
                                    rows // block_rows)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coef (d,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # beta (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # x0_blocks (1,)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(coef, beta, x0_blocks)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _map_partials(cliques: tuple, n: int, coef, beta):
    return _map_partials_call(cliques, n, 1 << n, coef, beta,
                              jnp.zeros((1,), jnp.int32))


def map_state_streaming(mrf: MRF):
    """Exact MAP state id by streaming enumeration — arbitrary clique
    structure at any width the sweep can cover (n=34 in ~80 ms of
    device time on one chip; the table-based
    :func:`~qcmrf_tpu.models.sample.map_state` caps at table-sized n,
    variable elimination needs bounded treewidth). Returns
    ``(state_id, beta*logpot)`` with the id a host int (int64-safe past
    n=31). Small n (below the kernel floor, where the sweep's row count
    would not even fill one lane block) takes the dense argmax."""
    if mrf.n < _MIN_KERNEL_N:
        lp = mrf.beta * mrf.all_log_potentials()
        i = int(jnp.argmax(lp))
        return i, float(lp[i])
    coef = _moebius_coefficients(mrf)
    beta = jnp.reshape(jnp.asarray(mrf.beta, jnp.float32), (1,))
    out = _map_partials(mrf.cliques, mrf.n, coef, beta)
    return map_partials_decode(mrf.cliques, mrf.n, 1 << mrf.n, out)


def _lse_partials_call(cliques: tuple, n: int, num_states: int, coef,
                       beta, x0_blocks):
    """(max, scaled-sum) per lane over ``num_states`` states starting at
    block index ``x0_blocks`` (see :func:`lse_block_states`)."""
    rows = num_states // LANE
    block_rows = _pick_loop_block_rows(cliques, n, rows)
    kernel = _build_lse_loop_kernel(cliques, n, block_rows,
                                    rows // block_rows)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coef (d,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # beta (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # x0_blocks (1,)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(coef, beta, x0_blocks)
    return out[0], out[1]


def _combine_lse(m: jax.Array, s: jax.Array) -> jax.Array:
    """logsumexp from per-lane (max, scaled-sum) partials."""
    M = jnp.max(m)
    return M + jnp.log(jnp.sum(s * jnp.exp(m - M)))


#: log2 in-block states per lane-GROUP of the streaming Gram kernel:
#: three live (S, 128) f32 arrays at S=2^12 stay ~6 MB inside Mosaic's
#: 16 MB VMEM
_GRAM_LOG_BLOCK = 12


def gram_geometry(width: int, num_states: int):
    """(logS, logP) of the Gram-kernel sweep — THE single source for its
    lane packing and block unit (host prep, the kernel builder and the
    sharded id arithmetic must all agree on it). Depends only on the
    lanes-per-group ``width`` and the swept state count, NOT on the
    global width ``n`` — sharded callers pass their per-device slice
    size and get the same packing on every device.

    ``width`` lanes per state-group: a ones lane + one lane per variable
    (+ one per PRODUCT lane for size-3/4 monomials, models/moments.py);
    ``P = 2^logP`` groups pack side by side so the 128-lane MXU tile is
    ~fully useful instead of 1/5 useful at typical widths (the Gram
    contributions of different groups ADD, and only the P diagonal
    width x width sub-blocks are ever read, so the cross-group entries
    are free garbage). One kernel block sweeps ``2^(logS+logP)`` states:
    group g holds states ``blk*2^(logS+logP) + g*2^logS + q``."""
    logP = max(0, (LANE // width).bit_length() - 1)
    logS = min(_GRAM_LOG_BLOCK,
               max(3, num_states.bit_length() - 1 - logP))
    logP = min(logP, max(0, num_states.bit_length() - 1 - logS))
    return logS, logP


def gram_kernel_applies(width: int, n: int, num_states: int) -> bool:
    """Whether the weighted-Gram moments kernel covers this sweep: the
    ``width`` group lanes (ones + variables + product lanes) must fit
    the 128-lane tile, the block index must stay under the 2^30 shift
    guard, and off-TPU the interpreted sweep must be small enough for
    the unit suite."""
    if width > LANE or num_states < (1 << 3):
        return False
    logS, logP = gram_geometry(width, num_states)
    if n - (logS + logP) > 30:
        return False
    if jax.default_backend() != "tpu" and n > 16:
        return False
    return True


# One dot operand is ALWAYS exactly bf16-representable in the Gram-sweep
# kernels (B and E are 0/1 matrices), so a HIGHEST f32 dot — Mosaic's
# 6-pass bf16x6 expansion over 3-term splits of BOTH operands — wastes
# half its passes on terms that are identically zero. Splitting only the
# inexact operand into the same 3 bf16 terms and running 3 DEFAULT bf16
# dots (f32 accumulate) computes the identical sum of products in half
# the MXU work.
def _bf16_terms3(a):
    h1 = a.astype(jnp.bfloat16)
    r1 = a - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    return h1, h2, (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)


def _dot_exact(x01, a_terms, dims, flip=False):
    """dot(x01, a) (or dot(a, x01) when ``flip``) with ``x01`` exactly
    bf16-representable and ``a`` pre-split by :func:`_bf16_terms3` —
    HIGHEST-f32-identical in 3 MXU passes."""
    acc = None
    for t in a_terms:
        p = (jax.lax.dot_general(t, x01, dims,
                                 preferred_element_type=jnp.float32)
             if flip else
             jax.lax.dot_general(x01, t, dims,
                                 preferred_element_type=jnp.float32))
        acc = p if acc is None else acc + p
    return acc


def _gram_lane_maker(S: int, lsh, grow, s1b, s2b):
    """Shared per-block lane build of the Gram-sweep kernels: bit planes
    from iota + the three shift rows, then (when ``s1b``/``s2b`` selector
    matrices are present) the PRODUCT-lane relayout ``B' = (B S1) *
    (B S2)`` — each selector column is one-hot onto a source lane, so
    variable/ones lanes select themselves (``b^2 = b``) and product
    lanes become the product of their two factor lanes, covering size-3
    and size-4 monomials as plain Gram entries. Selection matrices are
    exact 0/1, so the relayout is 2 exact DEFAULT-bf16 MXU passes and
    ``B'`` stays exactly 0/1."""
    qs = jax.lax.broadcasted_iota(jnp.int32, (S, LANE), 0)
    Binv = ((qs >> lsh) & 1).astype(jnp.float32) + grow

    def make(hrow):
        B = Binv + hrow  # block-constant lanes broadcast in
        if s1b is not None:
            Bb0 = B.astype(jnp.bfloat16)  # exact: B is 0/1
            dims = (((1,), (0,)), ((), ()))
            B = (jax.lax.dot_general(
                    Bb0, s1b, dims, preferred_element_type=jnp.float32)
                 * jax.lax.dot_general(
                    Bb0, s2b, dims, preferred_element_type=jnp.float32))
        return B, B.astype(jnp.bfloat16)  # exact: B' is 0/1

    return make


@functools.lru_cache(maxsize=256)
def _build_gram_loop_kernel(logS: int, num_blocks: int, relayout: bool):
    """Streaming weighted-Gram sweep: ONE (128, 128) matrix holds every
    monomial moment of a structure with cliques of <= 4 variables
    (models/moments.py).

    State bits live on LANES here, not rows: each block materializes the
    bit-plane matrix ``B`` of ``S = 2^logS`` rows x 128 lanes, where the
    lanes hold P side-by-side state-groups of ``width`` lanes each (per
    group: a constant-1 lane, one lane per variable, and — for
    structures with size-3/4 cliques — one lane per PRODUCT of two
    variables, built by the ``relayout`` selection matmuls of
    :func:`_gram_lane_maker`; see :func:`gram_geometry`). Three per-lane
    rows drive the build in fully vectorized ops: ``lsh`` shifts the
    in-block row index into the low state bits (shift 30 parks a lane
    at 0), ``grow`` adds the lane-constant part (the ones lanes and each
    group's group-index bits), and ``hsh`` shifts the running block
    index into the high bits. The log-potential is then ONE systolic
    contraction — every monomial's coefficient sits at its lane-pair
    entry of the block-diagonal matrix ``Q`` — ``lp = rowsum((B Q) *
    B)`` — and the moment accumulation is a second one,
    ``G += B^T (w * B)``, whose P diagonal width x width sub-blocks sum
    to the monomial moments (entry (0,0) = sum w, row 0 = singletons,
    (i,j) = pairs, product-lane rows = size-3/4 subsets). Everything
    derives from iota in VMEM: the sweep's HBM traffic is the kernel
    arguments plus one (128, 128) output, total, regardless of 2^n."""
    S = 1 << logS

    def kernel(q_ref, e_ref, lsh_ref, grow_ref, hsh_ref, *rest):
        if relayout:
            s1_ref, s2_ref, lnz_ref, x0b_ref, out_ref = rest
            s1b = s1_ref[:].astype(jnp.bfloat16)
            s2b = s2_ref[:].astype(jnp.bfloat16)
        else:
            lnz_ref, x0b_ref, out_ref = rest
            s1b = s2b = None
        make_B = _gram_lane_maker(S, lsh_ref[:], grow_ref[:], s1b, s2b)
        # loop-invariant split/casts hoist out of the block loop
        Qt = _bf16_terms3(q_ref[:])
        Eb = e_ref[:].astype(jnp.bfloat16)  # exact: 0/1 group projector
        hsh = hsh_ref[:]

        def step(i, G):
            blk = x0b_ref[0] + i
            hrow = ((blk >> hsh) & 1).astype(jnp.float32)  # (1, LANE)
            B, Bb = make_B(hrow)
            bq = _dot_exact(Bb, Qt, (((1,), (0,)), ((), ())))
            # per-LANE log-potential of the lane's own group's state (a
            # plain row-sum would mix the P packed states of each row)
            lpl = _dot_exact(Eb, _bf16_terms3(bq * B),
                             (((1,), (0,)), ((), ())), flip=True)
            W = jnp.exp(lpl - lnz_ref[0])  # (S, LANE), w per lane-group
            return G + _dot_exact(Bb, _bf16_terms3(B * W),
                                  (((0,), (0,)), ((), ())))

        out_ref[:] = jax.lax.fori_loop(
            0, num_blocks, step, jnp.zeros((LANE, LANE), jnp.float32))

    return kernel


def gram_block_states(width: int, num_states: int) -> int:
    """States per kernel block of the Gram sweep — the unit of its
    ``x0b`` argument (sharded callers divide their device-slice start by
    this). Derived from :func:`gram_geometry` so it cannot drift from
    the kernel's own packing."""
    logS, logP = gram_geometry(width, num_states)
    return 1 << (logS + logP)


def _gram_in_specs(relayout: bool, n_smem: int):
    return ([pl.BlockSpec(memory_space=pltpu.VMEM)] * (7 if relayout else 5)
            + [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_smem)


def gram_moments_call(width: int, Q, E, lnz, num_states: int,
                      x0_blocks, lsh, grow, hsh, s1=None, s2=None):
    """(128, 128) weighted-Gram moment partials over ``num_states``
    states starting at block index ``x0_blocks``; see
    :func:`_build_gram_loop_kernel` for the layout and
    ``models/moments.py`` for the host-side Q / projector / lane-row /
    selector prep."""
    logS, logP = gram_geometry(width, num_states)
    relayout = s1 is not None
    kernel = _build_gram_loop_kernel(
        logS, num_states >> (logS + logP), relayout)
    sel = (s1, s2) if relayout else ()
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((LANE, LANE), jnp.float32),
        in_specs=_gram_in_specs(relayout, 2),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(Q, E, lsh, grow, hsh, *sel, lnz, x0_blocks)


@functools.lru_cache(maxsize=256)
def _build_gram_lse_loop_kernel(logS: int, num_blocks: int,
                                relayout: bool):
    """Fused streaming (lnZ, weighted-Gram) sweep: ONE pass over the
    state space yields BOTH the log-partition and every monomial moment
    of a structure with cliques of <= 4 variables, by flash-style
    running-max accumulation —
    the per-block weights are ``exp(lp - M)`` against the running max
    ``M`` instead of a precomputed ``exp(lp - lnZ)``, and the Gram
    accumulator is rescaled by ``exp(M_old - M_new)`` whenever the max
    advances. Layout and contractions are identical to
    :func:`_build_gram_loop_kernel`; outputs are the SCALED Gram ``G``
    (whose group-summed (0, 0) entry is ``Z * exp(-M)``) and ``M``, so
    ``lnZ = M + log(G_sum[0, 0])`` and moments = sub-blocks / G_sum[0,0].
    Parked lanes (outside every group) are masked to -inf so they can
    neither win the max nor contribute weight. This halves exact-MLE
    training's sweep count: the NLL forward pass gets lnZ and its
    custom-VJP gradient's moments from the same sweep
    (models/moments.py::lnz_and_moments_streaming)."""
    S = 1 << logS

    def kernel(q_ref, e_ref, lsh_ref, grow_ref, hsh_ref, *rest):
        if relayout:
            s1_ref, s2_ref, x0b_ref, g_ref, m_ref = rest
            s1b = s1_ref[:].astype(jnp.bfloat16)
            s2b = s2_ref[:].astype(jnp.bfloat16)
        else:
            x0b_ref, g_ref, m_ref = rest
            s1b = s2b = None
        make_B = _gram_lane_maker(S, lsh_ref[:], grow_ref[:], s1b, s2b)
        E = e_ref[:]
        # loop-invariant split/casts hoist out of the block loop
        Qt = _bf16_terms3(q_ref[:])
        Eb = E.astype(jnp.bfloat16)
        # a lane is live iff it belongs to a group (its E column is
        # nonzero); parked lanes' lpl would otherwise read as 0
        live = jnp.sum(E, axis=0, keepdims=True) > 0.0  # (1, LANE)
        hsh = hsh_ref[:]

        def step(i, carry):
            M, G = carry
            blk = x0b_ref[0] + i
            hrow = ((blk >> hsh) & 1).astype(jnp.float32)  # (1, LANE)
            B, Bb = make_B(hrow)
            bq = _dot_exact(Bb, Qt, (((1,), (0,)), ((), ())))
            lpl = _dot_exact(Eb, _bf16_terms3(bq * B),
                             (((1,), (0,)), ((), ())), flip=True)
            lpl = jnp.where(live, lpl, -jnp.inf)
            M2 = jnp.maximum(M, jnp.max(lpl))
            W = jnp.exp(lpl - M2)  # parked lanes: exp(-inf) = 0
            G2 = G * jnp.exp(M - M2) + _dot_exact(
                Bb, _bf16_terms3(B * W), (((0,), (0,)), ((), ())))
            return M2, G2

        M, G = jax.lax.fori_loop(
            0, num_blocks, step,
            (jnp.float32(-jnp.inf), jnp.zeros((LANE, LANE), jnp.float32)))
        g_ref[:] = G
        m_ref[:] = jnp.full((8, LANE), M, jnp.float32)

    return kernel


def gram_lse_moments_call(width: int, Q, E, num_states: int, x0_blocks,
                          lsh, grow, hsh, s1=None, s2=None):
    """(scaled Gram (128, 128), running max M) over ``num_states`` states
    starting at block index ``x0_blocks`` — the fused lnZ+moments sweep
    (:func:`_build_gram_lse_loop_kernel`). Sharded callers combine
    per-device partials as ``G_d * exp(M_d - max_d M_d)`` summed."""
    logS, logP = gram_geometry(width, num_states)
    relayout = s1 is not None
    kernel = _build_gram_lse_loop_kernel(
        logS, num_states >> (logS + logP), relayout)
    sel = (s1, s2) if relayout else ()
    G, M = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((LANE, LANE), jnp.float32),
                   jax.ShapeDtypeStruct((8, LANE), jnp.float32)),
        in_specs=_gram_in_specs(relayout, 1),
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=_interpret(),
    )(Q, E, lsh, grow, hsh, *sel, x0_blocks)
    return G, M[0, 0]


@functools.partial(jax.jit, static_argnums=(0, 1))
def _log_partition_fused(cliques: tuple, n: int, coef, beta):
    m, s = _lse_partials_call(cliques, n, 1 << n, coef, beta,
                              jnp.zeros((1,), jnp.int32))
    return _combine_lse(m, s)


def log_partition(mrf: MRF) -> jax.Array:
    """ln Z by exact enumeration. Large tables (where the table would not
    fit VMEM anyway) stream through the fused logsumexp kernel; small n
    keeps the two-pass table path, whose XLA fusion is already fast."""
    if mrf.n < _MIN_KERNEL_N:
        return jax.scipy.special.logsumexp(mrf.beta
                                           * mrf.all_log_potentials())
    rows = (1 << mrf.n) // LANE
    if rows // _pick_block_rows(mrf.cliques, rows) > _MAX_GRID:
        coef = _moebius_coefficients(mrf)
        beta = jnp.reshape(jnp.asarray(mrf.beta, jnp.float32), (1,))
        return _log_partition_fused(mrf.cliques, mrf.n, coef, beta)
    return jax.scipy.special.logsumexp(all_log_potentials(mrf))


# --------------------------------------------------------------------------
# Statevector gate application on real/imag planes, (rows, 128) layout
# --------------------------------------------------------------------------


def _lane_gate_matrix(U: np.ndarray, q: int) -> np.ndarray:
    """Embed a 2x2 gate on lane-qubit q (< 7) as a 128x128 matrix:
    I_{2^(6-q)} ⊗ U ⊗ I_{2^q}."""
    return np.kron(
        np.kron(np.eye(1 << (6 - q)), U), np.eye(1 << q)
    ).astype(U.dtype)


#: MXU precision of the lane-gate matmul. TPU f32 matmuls decompose into
#: bf16 passes: DEFAULT = 1 pass (~2^-8 relative — fidelity checks see
#: it), HIGH = 3 passes (operands split hi+lo; only the lo*lo cross term
#: is dropped, ~2^-17 relative per apply since lane-gate rows have <= 2
#: nonzeros... <= 128 for a fully composed lane wall, still ~2^-16), and
#: HIGHEST = 6 passes (~f32-exact). A QCMRF circuit applies exactly ONE
#: composed lane pass, so HIGH's ~1e-5 norm-relative error is invisible
#: to every fidelity pin while halving the MXU work of the lane pass —
#: measured on-chip as gate_lane_copy_ratio (VERDICT round-3 item 5).
LANE_PRECISION = jax.lax.Precision.HIGH


@functools.lru_cache(maxsize=8)
def _build_matmul_pair_kernel(precision, emulate: bool):
    def dot(a, bT):
        # Mosaic lowers DEFAULT and HIGHEST dots natively but rejects
        # HIGH ("Unsupported dot precision: HIGH"), so on real TPU the
        # intermediate tiers are EMULATED as their defining bf16 MXU
        # pass compositions: DEFAULT = 1 pass on bf16-rounded operands,
        # HIGH = 3 passes (operands split hi+lo, the lo*lo cross term
        # dropped). Interpret mode (the CPU unit suite) keeps the native
        # f32-exact dot so precision-plumbing tests stay bit-clean; the
        # on-chip error of each tier is what bench.py's
        # lane_precision_study measures.
        if not emulate or precision == jax.lax.Precision.HIGHEST:
            return jnp.dot(a, bT, preferred_element_type=jnp.float32,
                           precision=precision)
        mm = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        a_hi = a.astype(jnp.bfloat16)
        b_hi = bT.astype(jnp.bfloat16)
        if precision == jax.lax.Precision.DEFAULT:
            return mm(a_hi, b_hi)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_lo = (bT - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return mm(a_hi, b_hi) + mm(a_hi, b_lo) + mm(a_lo, b_hi)

    def kernel(re_ref, im_ref, mr_ref, mi_ref, ore_ref, oim_ref):
        re = re_ref[:]
        im = im_ref[:]
        mr = mr_ref[:]
        mi = mi_ref[:]
        # (rows,128) @ (128,128): out = state @ M^T, complex via plane
        # algebra; precision trades bf16 MXU passes for accuracy (see
        # LANE_PRECISION).
        ore_ref[:] = dot(re, mr.T) - dot(im, mi.T)
        oim_ref[:] = dot(re, mi.T) + dot(im, mr.T)

    return kernel


@functools.partial(jax.jit, static_argnums=(4,))
def _lane_matmul_call(re, im, mr, mi,
                      precision: jax.lax.Precision = None):
    if precision is None:
        precision = LANE_PRECISION
    rows = re.shape[0]
    # 1024: the HIGHEST-precision matmul's f32 passes need ~3x the bf16
    # scratch; 2048-row blocks overflow the 16 MB scoped VMEM
    block_rows = min(rows, 1024)
    grid = pl.cdiv(rows, block_rows)
    out = pl.pallas_call(
        _build_matmul_pair_kernel(precision, not _interpret()),
        out_shape=(
            jax.ShapeDtypeStruct(re.shape, jnp.float32),
            jax.ShapeDtypeStruct(re.shape, jnp.float32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        # in-place plane update: each grid program reads only the block it
        # writes, so donating (re, im) into the outputs is safe. Halves
        # the live-plane footprint of a gate chain (2 planes instead of
        # 4), which is what lets 2^30-amplitude circuits fit in 16 GB HBM.
        input_output_aliases={0: 0, 1: 1},
        interpret=_interpret(),
    )(re, im, mr, mi)
    return out


def _row_gate_kernel(re_ref, im_ref, u_ref, ore_ref, oim_ref):
    """Gate on a row qubit: the block is (chunk_g, 2, sblk, LANE) — axis 1
    is the target qubit; u is the 2x2 complex gate as (2, 2, 2) real/imag
    scalars in SMEM."""
    a_re, b_re = re_ref[:, 0], re_ref[:, 1]
    a_im, b_im = im_ref[:, 0], im_ref[:, 1]
    u00r, u00i = u_ref[0, 0, 0], u_ref[0, 0, 1]
    u01r, u01i = u_ref[0, 1, 0], u_ref[0, 1, 1]
    u10r, u10i = u_ref[1, 0, 0], u_ref[1, 0, 1]
    u11r, u11i = u_ref[1, 1, 0], u_ref[1, 1, 1]
    ore_ref[:, 0] = u00r * a_re - u00i * a_im + u01r * b_re - u01i * b_im
    oim_ref[:, 0] = u00r * a_im + u00i * a_re + u01r * b_im + u01i * b_re
    ore_ref[:, 1] = u10r * a_re - u10i * a_im + u11r * b_re - u11i * b_im
    oim_ref[:, 1] = u10r * a_im + u10i * a_re + u11r * b_im + u11i * b_re


@functools.partial(jax.jit, static_argnums=(3,))
def _row_gate_call(re, im, u, stride_rows: int):
    rows = re.shape[0]
    # view as (groups, 2, stride_rows, LANE): axis 1 is the qubit. The
    # stride axis is tiled like _row_pair_call's (same scoped-VMEM math:
    # in/out plane buffers x2 pipeline stages must stay well under the
    # 16 MB limit, so blocks are capped at 1024 rows) — without it a lone
    # high-qubit gate at n >= 21 (stride 2^13+) fails Mosaic compile.
    g = rows // (2 * stride_rows)
    sblk = min(stride_rows, 256)
    chunk_g = max(1, min(g, 1024 // (2 * sblk)))
    re4 = re.reshape(g, 2, stride_rows, LANE)
    im4 = im.reshape(g, 2, stride_rows, LANE)
    bspec = pl.BlockSpec((chunk_g, 2, sblk, LANE),
                         lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _row_gate_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(re4.shape, jnp.float32),
            jax.ShapeDtypeStruct(re4.shape, jnp.float32),
        ),
        grid=(g // chunk_g, stride_rows // sblk),
        in_specs=[bspec, bspec, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(bspec, bspec),
        input_output_aliases={0: 0, 1: 1},  # in-place planes (see
        # _lane_matmul_call): per-program same-block read/write
        interpret=_interpret(),
    )(re4, im4, u)
    return (out[0].reshape(rows, LANE), out[1].reshape(rows, LANE))


def _row_pair_kernel(re_ref, im_ref, u_ref, ore_ref, oim_ref):
    """4x4 unitary over two ADJACENT row qubits: the block is
    (chunk_g, 4, stride, LANE) with axis 1 spanning (bit q+1, bit q); u is
    the 4x4 complex matrix as (4, 4, 2) real/imag scalars in SMEM."""
    a_re = [re_ref[:, j] for j in range(4)]
    a_im = [im_ref[:, j] for j in range(4)]
    for j in range(4):  # static unroll: 16 complex FMAs on full planes
        acc_re = None
        acc_im = None
        for l in range(4):
            ur = u_ref[j, l, 0]
            ui = u_ref[j, l, 1]
            tr = ur * a_re[l] - ui * a_im[l]
            ti = ur * a_im[l] + ui * a_re[l]
            acc_re = tr if acc_re is None else acc_re + tr
            acc_im = ti if acc_im is None else acc_im + ti
        ore_ref[:, j] = acc_re
        oim_ref[:, j] = acc_im


@functools.partial(jax.jit, static_argnums=(3,))
def _row_pair_call(re, im, u, stride_rows: int):
    rows = re.shape[0]
    g = rows // (4 * stride_rows)
    # Fixed <= 1024-row (0.5 MB/plane) blocks for ANY stride: a 2-D grid
    # tiles the group axis and the stride axis independently. Scoped VMEM
    # must hold the four in/out plane buffers x2 (pipeline double-
    # buffering) plus the kernel's accumulator temporaries, so the
    # per-buffer block has to stay well under limit/8 — a 4096-row block
    # measured 27.8 MB scoped against the 16 MB hardware limit.
    # Grid size is rows/4096 when fully packed (2 at n=20 planes). The
    # repo's grid-<=8 rule applies to LARGE-body kernels (the unrolled
    # Moebius chains); tiny-body kernels like this one (16 FMAs) compile
    # fast at much larger grids — the 1q row-gate kernel already runs at
    # grid 4096 (q=7, n=20) on this hardware.
    sblk = min(stride_rows, 256)
    chunk_g = max(1, min(g, 1024 // (4 * sblk)))
    re4 = re.reshape(g, 4, stride_rows, LANE)
    im4 = im.reshape(g, 4, stride_rows, LANE)
    bspec = pl.BlockSpec((chunk_g, 4, sblk, LANE),
                         lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _row_pair_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(re4.shape, jnp.float32),
            jax.ShapeDtypeStruct(re4.shape, jnp.float32),
        ),
        grid=(g // chunk_g, stride_rows // sblk),
        in_specs=[bspec, bspec, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(bspec, bspec),
        input_output_aliases={0: 0, 1: 1},  # in-place planes
        interpret=_interpret(),
    )(re4, im4, u)
    return (out[0].reshape(rows, LANE), out[1].reshape(rows, LANE))


def apply_2q_row_pair(re: jax.Array, im: jax.Array, U4: np.ndarray,
                      q_lo: int) -> Tuple[jax.Array, jax.Array]:
    """Apply a 4x4 unitary to adjacent row qubits (q_lo, q_lo+1), both
    >= 7; U4 row/col index = bit(q_lo+1)*2 + bit(q_lo)."""
    U4 = np.asarray(U4, dtype=np.complex64)
    u = jnp.asarray(
        np.stack([U4.real.astype(np.float32), U4.imag.astype(np.float32)],
                 axis=-1)
    )  # (4, 4, 2)
    return _row_pair_call(re, im, u, 1 << (q_lo - 7))


def apply_1q(re: jax.Array, im: jax.Array, U: np.ndarray, q: int,
             n: int) -> Tuple[jax.Array, jax.Array]:
    """Apply a 2x2 unitary to qubit q of an n-qubit state stored as
    (2**n / 128, 128) real/imag planes (requires n >= 7)."""
    U = np.asarray(U, dtype=np.complex64)
    if q < 7:
        M = _lane_gate_matrix(U, q)
        mr = jnp.asarray(M.real.astype(np.float32))
        mi = jnp.asarray(M.imag.astype(np.float32))
        return _lane_matmul_call(re, im, mr, mi)
    stride_rows = 1 << (q - 7)
    u = jnp.asarray(
        np.stack([U.real.astype(np.float32), U.imag.astype(np.float32)],
                 axis=-1)
    )  # (2, 2, 2): [out, in, re/im]
    return _row_gate_call(re, im, u, stride_rows)


# --------------------------------------------------------------------------
# Masked diagonal rotation: the universal diagonal-gate kernel.
#
# Applies the phase e^{i * (a0 + a1 * mask(x))} where mask(x) is a static
# conjunction of bit conditions on the basis index. Covers rz
# (a0 = -lam/2, a1 = lam, mask = bit q), cp (a1 = lam, mask = bit c & bit
# t) and the fused flags_phase of the QCMRF compiler (mask = pattern
# match & control), each as ONE pass over the state planes.
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=1024)
def _build_masked_rotation_kernel(conds: tuple, block_rows: int):
    """conds: tuple of (bit_position, wanted_value) static conditions."""

    def kernel(ang_ref, re_ref, im_ref, ore_ref, oim_ref):
        i = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 1)
        x = (i * block_rows + rows) * LANE + cols
        mask = jnp.ones((block_rows, LANE), jnp.float32)
        for pos, want in conds:  # static unroll
            b = ((x >> pos) & 1).astype(jnp.float32)
            mask = mask * (b if want else (1.0 - b))
        ang = ang_ref[0] + ang_ref[1] * mask
        c = jnp.cos(ang)
        s = jnp.sin(ang)
        re = re_ref[:]
        im = im_ref[:]
        ore_ref[:] = re * c - im * s
        oim_ref[:] = re * s + im * c

    return kernel


@functools.partial(jax.jit, static_argnums=(0,))
def _masked_rotation_call(conds: tuple, ang, re, im):
    rows = re.shape[0]
    block_rows = min(rows, 1024)
    kernel = _build_masked_rotation_kernel(conds, block_rows)
    bspec = pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(re.shape, jnp.float32),
            jax.ShapeDtypeStruct(re.shape, jnp.float32),
        ),
        grid=(rows // block_rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), bspec, bspec],
        out_specs=(bspec, bspec),
        input_output_aliases={1: 0, 2: 1},  # in-place planes
        interpret=_interpret(),
    )(ang, re, im)


def apply_masked_rotation(re, im, conds, base_angle: float,
                          masked_angle: float):
    """Phase e^{i(base + masked * [all conds hold])} on (rows, 128) planes."""
    ang = jnp.asarray([base_angle, masked_angle], jnp.float32)
    conds = tuple((int(p), int(w)) for p, w in conds)
    return _masked_rotation_call(conds, ang, re, im)


# --------------------------------------------------------------------------
# Fused diagonal profile: a RUN of consecutive diagonal gates in ONE pass.
#
# Any sequence of rz/cp/flags_phase gates multiplies the state by
# e^{i*(base + sum_t a_t * mask_t(x))}; diagonal passes are HBM-bound (the
# bit math is free next to the 4-plane traffic), so applying the whole
# per-clique cU_C phase profile in one sweep divides the traffic by the
# run length (round-1 VERDICT item 5: consecutive diagonal blocks of a
# clique fused into one pass).
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=1024)
def _build_diag_profile_kernel(terms: tuple, block_rows: int):
    """terms: tuple of conds tuples ((pos, want), ...). Angles arrive in
    SMEM as [base, a_0, ..., a_{T-1}] so one compiled kernel serves every
    parameterization of the same structure."""

    positions = sorted({p for conds in terms for p, _ in conds})

    def kernel(ang_ref, re_ref, im_ref, ore_ref, oim_ref):
        i = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANE), 1)
        x = (i * block_rows + rows) * LANE + cols
        # one live bit-plane per used position, shared across terms
        bit = {
            p: ((x >> p) & 1).astype(jnp.float32) for p in positions
        }

        def term_mask(conds):
            mask = None
            for pos, want in conds:
                b = bit[pos] if want else (1.0 - bit[pos])
                mask = b if mask is None else mask * b
            return mask

        # SMEM layout (host-precomputed — see _MAX_ROTOR_TERMS):
        #   [cos b, sin b, (cos a_t - 1, sin a_t) per term,
        #    b, angles...]   (raw tail for the high-term-count fallback)
        #   [+ multilinear cos/sin coefficient block — see _cs_support]
        raw = 2 + 2 * len(terms)
        mblocks, _ = _moebius_layout((terms,), raw + 1 + len(terms))
        sup, moff = mblocks[0]
        if sup is not None:
            c, s = _moebius_cs_eval(bit, sup, ang_ref, moff,
                                    (block_rows, LANE))
        elif len(terms) <= _MAX_ROTOR_TERMS:
            # masked rotation composition: R(a)R(b) = R(a+b), so each
            # term blends its precomputed (cos-1, sin) pair under its
            # 0/1 mask — no whole-block cos/sin (the transcendentals
            # made this kernel compute-bound: 420 vs a 900 GB/s copy)
            shp = (block_rows, LANE)
            c = jnp.full(shp, 1.0) * ang_ref[0]
            s = jnp.full(shp, 1.0) * ang_ref[1]
            for t, conds in enumerate(terms):  # static unroll
                mask = term_mask(conds)
                ca1 = ang_ref[2 + 2 * t]
                sa = ang_ref[2 + 2 * t + 1]
                u = c * ca1 - s * sa
                v = s * ca1 + c * sa
                if mask is None:
                    c = c + u
                    s = s + v
                else:
                    c = c + mask * u
                    s = s + mask * v
        else:
            ang = (jnp.full((block_rows, LANE), 0.0, jnp.float32)
                   + ang_ref[raw])
            for t, conds in enumerate(terms):  # static unroll
                mask = term_mask(conds)
                ang = ang + ang_ref[raw + 1 + t] * (
                    mask if mask is not None else 1.0
                )
            c = jnp.cos(ang)
            s = jnp.sin(ang)
        re = re_ref[:]
        im = im_ref[:]
        ore_ref[:] = re * c - im * s
        oim_ref[:] = re * s + im * c

    return kernel


@functools.partial(jax.jit, static_argnums=(0,))
def _diag_profile_call(terms: tuple, ang, re, im):
    rows = re.shape[0]
    # grid may exceed _MAX_GRID here: the remote-compile blowup documented
    # for the logpot kernel is body-size-dependent, and this small body
    # measured 3.1 s at grid 64 (nq=23, 2026-08-16) — no loop+DMA needed
    block_rows = min(rows, 1024)
    kernel = _build_diag_profile_kernel(terms, block_rows)
    bspec = pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(re.shape, jnp.float32),
            jax.ShapeDtypeStruct(re.shape, jnp.float32),
        ),
        grid=(rows // block_rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), bspec, bspec],
        out_specs=(bspec, bspec),
        input_output_aliases={1: 0, 2: 1},  # in-place planes
        interpret=_interpret(),
    )(ang, re, im)


def apply_diagonal_profile(re, im, terms, angles, base: float = 0.0):
    """One pass applying e^{i*(base + sum_t angles[t]*[conds_t hold])}.

    ``terms`` is a sequence of condition tuples ((pos, want), ...); an
    empty condition tuple contributes its angle unconditionally.
    """
    terms = tuple(
        tuple((int(p), int(w)) for p, w in conds) for conds in terms
    )
    base_a = jnp.asarray([base], jnp.float32)
    terms_a = jnp.asarray(list(angles), jnp.float32).reshape(-1)
    pairs = jnp.stack(
        [jnp.cos(terms_a) - 1.0, jnp.sin(terms_a)], axis=-1
    ).reshape(-1) if terms_a.size else terms_a
    parts = [jnp.cos(base_a), jnp.sin(base_a), pairs, base_a, terms_a]
    if _cs_support(terms) is not None:
        parts.append(_cs_coeff_block(terms, angles, base))
    ang = jnp.concatenate(parts)
    return _diag_profile_call(terms, ang, re, im)


# --------------------------------------------------------------------------
# Fused H·D·H sandwich: a clique's whole real-part-extraction block in ONE
# pass.
#
# The reference surrounds each clique's controlled-phase block with
# H(anc) · cU · X(anc) · cU† · X(anc) · H(anc) (QCMRF.py:231-236). After
# the X-deferral fusion, the middle is one diagonal profile
# D = diag(e^{i·alpha(x)}, e^{i·beta(x)}) over the ancilla, and
#
#   H · D · H = e^{i·mu(x)} · [[cos nu, -i sin nu], [-i sin nu, cos nu]]
#
# with mu = (alpha+beta)/2, nu = (beta-alpha)/2 — a position-dependent
# Rx on the ancilla. For QCMRF's matched ±2γ profiles mu ≡ 0 and
# nu(x) = Σ_y 2γ_y·mask_y(x), so cos(nu)·a0 realizes the e^{βθ/2}
# post-selected branch (SURVEY.md Appendix A item 5) directly. One pass
# replaces three (H, diag, H): 4 planes of HBM traffic instead of 12.
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=1024)
def _build_hdh_kernel(mu_terms: tuple, nu_terms: tuple, anc: int,
                      chunk_g: int, sblk: int, stride_rows: int,
                      has_mu: bool):
    """Sandwich kernel body. Blocks are (chunk_g, 2, sblk, LANE) with
    axis 1 = the ancilla bit; angles arrive in SMEM as
    [mu_base, nu_base, mu_a..., nu_a...] so one compiled kernel serves
    every parameterization of the same term structure."""

    num_mu = len(mu_terms)
    positions = sorted(
        {p for conds in (mu_terms + nu_terms) for p, _ in conds}
    )
    shape = (chunk_g, sblk, LANE)

    def kernel(ang_ref, re_ref, im_ref, ore_ref, oim_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        gi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        si = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        li = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        # basis index of the anc=0 element (mu/nu never condition on anc)
        x = (((i * chunk_g + gi) * 2 * stride_rows)
             + (j * sblk + si)) * LANE + li
        bit = {
            p: ((x >> p) & 1).astype(jnp.float32) for p in positions
        }

        def term_mask(conds):
            mask = None
            for pos, want in conds:
                b = bit[pos] if want else (1.0 - bit[pos])
                mask = b if mask is None else mask * b
            return mask

        # SMEM layout (host-precomputed — see _MAX_ROTOR_TERMS):
        #   [cos(mu_b), sin(mu_b), cos(nu_b), sin(nu_b),
        #    (cos a_t - 1, sin a_t) per mu term, same per nu term,
        #    mu_b, nu_b, mu angles..., nu angles...]   (raw tail for the
        #    accumulated-angle fallback at high term counts)
        num_nu = len(nu_terms)
        raw = 4 + 2 * (num_mu + num_nu)
        mblocks, _ = _moebius_layout((mu_terms, nu_terms),
                                     raw + 2 + num_mu + num_nu)

        def rotor(terms, base_cs, pair_off):
            """(cos, sin) of ``base + sum_t a_t*mask_t`` WITHOUT plane
            transcendentals: each term composes the rotation R(a_t)
            under its 0/1 mask (R(a)R(b) = R(a+b)) from its precomputed
            (cos-1, sin) SMEM pair — ~6 VPU FMAs per term instead of
            two cos/sin sweeps over the block (562 -> 773 GB/s measured
            on this kernel at n=24)."""
            c = jnp.full(shape, 1.0) * ang_ref[base_cs]
            s = jnp.full(shape, 1.0) * ang_ref[base_cs + 1]
            for t, conds in enumerate(terms):  # static unroll
                mask = term_mask(conds)
                ca1 = ang_ref[pair_off + 2 * t]
                sa = ang_ref[pair_off + 2 * t + 1]
                u = c * ca1 - s * sa
                v = s * ca1 + c * sa
                if mask is None:
                    c = c + u
                    s = s + v
                else:
                    c = c + mask * u
                    s = s + mask * v
            return c, s

        def profile(terms, base_idx, off):
            ang = jnp.zeros(shape, jnp.float32) + ang_ref[base_idx]
            for t, conds in enumerate(terms):  # static unroll
                mask = term_mask(conds)
                ang = ang + ang_ref[off + t] * (
                    mask if mask is not None else 1.0
                )
            return ang

        def cos_sin(terms, base_cs, pair_off, raw_base, raw_off, mblock):
            sup, moff = mblock
            if sup is not None:
                return _moebius_cs_eval(bit, sup, ang_ref, moff, shape)
            if len(terms) <= _MAX_ROTOR_TERMS:
                return rotor(terms, base_cs, pair_off)
            ang = profile(terms, raw_base, raw_off)
            return jnp.cos(ang), jnp.sin(ang)

        cn, sn = cos_sin(nu_terms, 2, 4 + 2 * num_mu,
                         raw + 1, raw + 2 + num_mu, mblocks[1])
        re0, re1 = re_ref[:, 0], re_ref[:, 1]
        im0, im1 = im_ref[:, 0], im_ref[:, 1]
        # e^{-i nu X}: new0 = cos(nu)·a0 - i sin(nu)·a1 (and symmetric)
        t0r = cn * re0 + sn * im1
        t0i = cn * im0 - sn * re1
        t1r = sn * im0 + cn * re1
        t1i = cn * im1 - sn * re0
        if has_mu:  # static specialization: QCMRF profiles have mu == 0
            cm, sm = cos_sin(mu_terms, 0, 4, raw, raw + 2, mblocks[0])
            ore_ref[:, 0] = cm * t0r - sm * t0i
            oim_ref[:, 0] = cm * t0i + sm * t0r
            ore_ref[:, 1] = cm * t1r - sm * t1i
            oim_ref[:, 1] = cm * t1i + sm * t1r
        else:
            ore_ref[:, 0] = t0r
            oim_ref[:, 0] = t0i
            ore_ref[:, 1] = t1r
            oim_ref[:, 1] = t1i

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _hdh_call(mu_terms: tuple, nu_terms: tuple, anc: int, has_mu: bool,
              ang, re, im):
    rows = re.shape[0]
    stride_rows = 1 << (anc - 7)
    g = rows // (2 * stride_rows)
    # same scoped-VMEM budget as _row_gate_call (1024-row blocks), minus
    # headroom for the bit/angle temporaries the profile keeps live
    sblk = min(stride_rows, 256)
    chunk_g = max(1, min(g, 512 // (2 * sblk)))
    re4 = re.reshape(g, 2, stride_rows, LANE)
    im4 = im.reshape(g, 2, stride_rows, LANE)
    kernel = _build_hdh_kernel(mu_terms, nu_terms, anc, chunk_g, sblk,
                               stride_rows, has_mu)
    bspec = pl.BlockSpec((chunk_g, 2, sblk, LANE),
                         lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(re4.shape, jnp.float32),
            jax.ShapeDtypeStruct(re4.shape, jnp.float32),
        ),
        grid=(g // chunk_g, stride_rows // sblk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), bspec, bspec],
        out_specs=(bspec, bspec),
        input_output_aliases={1: 0, 2: 1},  # in-place planes
        interpret=_interpret(),
    )(ang, re4, im4)
    return (out[0].reshape(rows, LANE), out[1].reshape(rows, LANE))


def apply_hdh_sandwich(re, im, anc: int, nu_terms, nu_angles,
                       nu_base: float = 0.0, mu_terms=(), mu_angles=(),
                       mu_base: float = 0.0):
    """Apply H(anc)·D·H(anc) in one pass on (rows, 128) planes.

    ``D`` is described by its half-sum/half-difference phase profiles:
    ``mu(x) = mu_base + Σ mu_angles[t]·[mu_terms[t] holds]`` (the common
    phase) and ``nu(x)`` likewise (the anc=1 minus anc=0 half-difference).
    Term conditions must not mention ``anc``; requires ``anc >= 7`` (row
    qubit) and angles known at trace time via the SMEM vector.
    """
    nu_terms = tuple(
        tuple((int(p), int(w)) for p, w in conds) for conds in nu_terms
    )
    mu_terms = tuple(
        tuple((int(p), int(w)) for p, w in conds) for conds in mu_terms
    )
    bases = jnp.asarray([mu_base, nu_base], jnp.float32)
    terms_a = jnp.asarray(list(mu_angles) + list(nu_angles),
                          jnp.float32).reshape(-1)
    # precomputed-rotation SMEM vector (see _build_hdh_kernel layout):
    # cos/sin bases + interleaved (cos-1, sin) per term + raw tail
    pairs = jnp.stack(
        [jnp.cos(terms_a) - 1.0, jnp.sin(terms_a)], axis=-1
    ).reshape(-1) if terms_a.size else terms_a
    base_cs = jnp.stack(
        [jnp.cos(bases), jnp.sin(bases)], axis=-1
    ).reshape(-1)  # [cos mu_b, sin mu_b, cos nu_b, sin nu_b]
    parts = [base_cs, pairs, bases, terms_a]
    for p_terms, p_angles, p_base in ((mu_terms, mu_angles, mu_base),
                                      (nu_terms, nu_angles, nu_base)):
        if _cs_support(p_terms) is not None:
            parts.append(_cs_coeff_block(p_terms, p_angles, p_base))
    ang = jnp.concatenate(parts)
    if isinstance(mu_base, (int, float)):
        has_mu = bool(mu_terms) or float(mu_base) != 0.0
    else:
        # traced base (the sharded engine's device-bit-conditioned
        # angles): can't be proven zero at trace time -> keep mu active
        has_mu = True
    return _hdh_call(mu_terms, nu_terms, int(anc), has_mu, ang, re, im)


# --------------------------------------------------------------------------
# Fused PAIR sandwich: TWO adjacent-ancilla H·D·H blocks in ONE pass.
#
# QCMRF emits one sandwich per clique on consecutive ancilla qubits, and
# the mu/nu profiles of clique k never condition on clique k±1's ancilla,
# so neighbouring sandwiches commute and compose as a position-dependent
# (Rx ⊗ Rx) on the ancilla pair. One pass moves the 4 planes once instead
# of twice: at n=28 the QCMRF chain drops 18 -> 12 passes. The block
# layout is _row_pair_call's (chunk_g, 4, stride, LANE) with axis 1
# spanning (bit a+1, bit a).
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=1024)
def _build_hdh_pair_kernel(mu_terms: tuple, nu1_terms: tuple,
                           nu2_terms: tuple, chunk_g: int, sblk: int,
                           stride_rows: int, has_mu: bool):
    """Pair-sandwich kernel body: nu1 on the LOW ancilla (block axis-1
    bit 0), nu2 on the HIGH ancilla (bit 1), one shared mu profile.
    Angles arrive in SMEM as host-precomputed rotation pairs (see
    _build_hdh_kernel's layout note): [cos/sin of mu_b, nu1_b, nu2_b;
    (cos a-1, sin a) per mu, nu1, nu2 term; raw bases + angles tail]."""

    n_mu, n1 = len(mu_terms), len(nu1_terms)
    n2 = len(nu2_terms)
    positions = sorted(
        {p for conds in (mu_terms + nu1_terms + nu2_terms)
         for p, _ in conds}
    )
    shape = (chunk_g, sblk, LANE)

    def kernel(ang_ref, re_ref, im_ref, ore_ref, oim_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        gi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        si = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        li = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        # basis index of the (a_hi=0, a_lo=0) element (profiles never
        # condition on either ancilla)
        x = (((i * chunk_g + gi) * 4 * stride_rows)
             + (j * sblk + si)) * LANE + li
        bit = {p: ((x >> p) & 1).astype(jnp.float32) for p in positions}

        def term_mask(conds):
            mask = None
            for pos, want in conds:
                b = bit[pos] if want else (1.0 - bit[pos])
                mask = b if mask is None else mask * b
            return mask

        raw = 6 + 2 * (n_mu + n1 + n2)
        mblocks, _ = _moebius_layout(
            (mu_terms, nu1_terms, nu2_terms),
            raw + 3 + n_mu + n1 + n2)

        def rotor(terms, base_cs, pair_off):
            c = jnp.full(shape, 1.0) * ang_ref[base_cs]
            s = jnp.full(shape, 1.0) * ang_ref[base_cs + 1]
            for t, conds in enumerate(terms):  # static unroll
                mask = term_mask(conds)
                ca1 = ang_ref[pair_off + 2 * t]
                sa = ang_ref[pair_off + 2 * t + 1]
                u = c * ca1 - s * sa
                v = s * ca1 + c * sa
                if mask is None:
                    c = c + u
                    s = s + v
                else:
                    c = c + mask * u
                    s = s + mask * v
            return c, s

        def profile(terms, base_idx, off):
            ang = jnp.zeros(shape, jnp.float32) + ang_ref[base_idx]
            for t, conds in enumerate(terms):  # static unroll
                mask = term_mask(conds)
                ang = ang + ang_ref[off + t] * (
                    mask if mask is not None else 1.0
                )
            return ang

        def cos_sin(terms, base_cs, pair_off, raw_base, raw_off, mblock):
            sup, moff = mblock
            if sup is not None:
                return _moebius_cs_eval(bit, sup, ang_ref, moff, shape)
            if len(terms) <= _MAX_ROTOR_TERMS:
                return rotor(terms, base_cs, pair_off)
            ang = profile(terms, raw_base, raw_off)
            return jnp.cos(ang), jnp.sin(ang)

        c1, s1 = cos_sin(nu1_terms, 2, 6 + 2 * n_mu,
                         raw + 1, raw + 3 + n_mu, mblocks[1])
        c2, s2 = cos_sin(nu2_terms, 4, 6 + 2 * (n_mu + n1),
                         raw + 2, raw + 3 + n_mu + n1, mblocks[2])
        # (e^{-i nu2 X_hi} ⊗ e^{-i nu1 X_lo}) on axis-1 index
        # jj = bit_hi*2 + bit_lo; coefficient classes: real u = c1 c2 and
        # -w = -s1 s2, imaginary -i p = -i c2 s1 and -i q = -i c1 s2
        u = c1 * c2
        w = s1 * s2
        p = c2 * s1
        q = c1 * s2
        vr = [re_ref[:, k] for k in range(4)]
        vi = [im_ref[:, k] for k in range(4)]
        if has_mu:
            cm, sm = cos_sin(mu_terms, 0, 6, raw, raw + 3, mblocks[0])
        # out_k = +u (real) on the same index, -w (real) on the double
        # flip, -i p on the lo flip, -i q on the hi flip; a real coef r
        # maps (vr, vi) -> (r vr, r vi), a -i m coef -> (m vi, -m vr).
        # Tuples are (u_idx, w_idx, p_idx, q_idx) per output row.
        outs = ((0, 3, 1, 2), (1, 2, 0, 3), (2, 1, 3, 0), (3, 0, 2, 1))
        for k in range(4):
            ui, wi, pi, qi = outs[k]
            orr = u * vr[ui] - w * vr[wi] + p * vi[pi] + q * vi[qi]
            oii = u * vi[ui] - w * vi[wi] - p * vr[pi] - q * vr[qi]
            if has_mu:
                ore_ref[:, k] = cm * orr - sm * oii
                oim_ref[:, k] = cm * oii + sm * orr
            else:
                ore_ref[:, k] = orr
                oim_ref[:, k] = oii

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _hdh_pair_call(mu_terms: tuple, nu1_terms: tuple, nu2_terms: tuple,
                   anc_lo: int, has_mu: bool, ang, re, im):
    rows = re.shape[0]
    stride_rows = 1 << (anc_lo - 7)
    g = rows // (4 * stride_rows)
    sblk = min(stride_rows, 256)
    # four in/out sub-planes live per block plus the rotor temporaries:
    # half _row_pair_call's budget (same headroom reasoning as _hdh_call)
    chunk_g = max(1, min(g, 512 // (4 * sblk)))
    re4 = re.reshape(g, 4, stride_rows, LANE)
    im4 = im.reshape(g, 4, stride_rows, LANE)
    kernel = _build_hdh_pair_kernel(mu_terms, nu1_terms, nu2_terms,
                                    chunk_g, sblk, stride_rows, has_mu)
    bspec = pl.BlockSpec((chunk_g, 4, sblk, LANE),
                         lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(re4.shape, jnp.float32),
            jax.ShapeDtypeStruct(re4.shape, jnp.float32),
        ),
        grid=(g // chunk_g, stride_rows // sblk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), bspec, bspec],
        out_specs=(bspec, bspec),
        input_output_aliases={1: 0, 2: 1},  # in-place planes
        interpret=_interpret(),
    )(ang, re4, im4)
    return (out[0].reshape(rows, LANE), out[1].reshape(rows, LANE))


def apply_hdh_sandwich_pair(re, im, anc_lo: int,
                            nu1_terms, nu1_angles, nu1_base,
                            nu2_terms, nu2_angles, nu2_base,
                            mu_terms=(), mu_angles=(), mu_base=0.0):
    """Apply H(a)·D1·H(a) and H(a+1)·D2·H(a+1) in ONE pass, a = anc_lo.

    ``nu1`` is the low ancilla's half-difference profile, ``nu2`` the
    high one's; ``mu`` is the COMBINED common-phase profile of both
    sandwiches. No term may condition on either ancilla; requires
    ``anc_lo >= 7`` and ``anc_lo + 1`` as the partner (row qubits).
    """
    canon = lambda ts: tuple(
        tuple((int(p), int(w)) for p, w in conds) for conds in ts
    )
    mu_terms = canon(mu_terms)
    nu1_terms = canon(nu1_terms)
    nu2_terms = canon(nu2_terms)
    bases = jnp.asarray([mu_base, nu1_base, nu2_base], jnp.float32)
    terms_a = jnp.asarray(
        list(mu_angles) + list(nu1_angles) + list(nu2_angles), jnp.float32
    ).reshape(-1)
    pairs = jnp.stack(
        [jnp.cos(terms_a) - 1.0, jnp.sin(terms_a)], axis=-1
    ).reshape(-1) if terms_a.size else terms_a
    base_cs = jnp.stack(
        [jnp.cos(bases), jnp.sin(bases)], axis=-1
    ).reshape(-1)  # [cos/sin mu_b, cos/sin nu1_b, cos/sin nu2_b]
    parts = [base_cs, pairs, bases, terms_a]
    for p_terms, p_angles, p_base in (
            (mu_terms, mu_angles, mu_base),
            (nu1_terms, nu1_angles, nu1_base),
            (nu2_terms, nu2_angles, nu2_base)):
        if _cs_support(p_terms) is not None:
            parts.append(_cs_coeff_block(p_terms, p_angles, p_base))
    ang = jnp.concatenate(parts)
    if isinstance(mu_base, (int, float)):
        has_mu = bool(mu_terms) or float(mu_base) != 0.0
    else:
        has_mu = True  # traced base (sharded device-bit angles)
    return _hdh_pair_call(mu_terms, nu1_terms, nu2_terms, int(anc_lo),
                          has_mu, ang, re, im)


# --------------------------------------------------------------------------
# Fused MULTI sandwich: k adjacent-ancilla H·D·H blocks in ONE pass.
#
# Same commutation argument as the pair kernel (no clique's profile
# mentions another clique's ancilla), applied k-1 more times: k
# consecutive-ancilla sandwiches compose as Rx^{(x)k} with position-
# dependent angles. Rather than expanding the 2^k x 2^k coefficient
# products, the kernel applies the k rotations SEQUENTIALLY in-register
# over the 2^k-way ancilla axis — compute grows LINEARLY in k while the
# planes move ONCE. Measured on-chip the full pass is HBM-bound at any
# k <= 6 (~530 GB/s effective at n=28; a pure copy through the same
# geometry costs the same — probe 2026-08-18), so the pass count is the
# whole cost model and k should be as large as VMEM allows:
# _MAX_SANDWICH_K caps the 2^k sub-planes per block (block stays ~2048
# rows = 1 MB/plane) and the unrolled butterfly body size (Mosaic
# remote-compile grows with body x grid; k=6 => 1536 statements).
#
# The ``comp`` mode fuses the uniform H-wall init INTO the pass: the
# uniform state's k ancilla bits are 0 (ancillas are never folded), so
# the pass's input lives in sub-plane jj=0 and the output has the
# closed form out[jj] = amp(x) * (-i)^popcount(jj) * prod_b (s_b if
# jj_b else c_b) (column 0 of the Rx tensor power) — a WRITE-ONLY pass,
# measured ~1.7x faster than a full pass.
# --------------------------------------------------------------------------

#: max ancillas fused per sandwich pass (2^k sub-planes per VMEM block;
#: see the section comment). k=7 keeps blocks at 2048 rows with 16-row
#: sub-slices; measured on-chip (2026-08-18 width-by-k sweep) k=7 is
#: fastest or tied at every width 20-28 (n=28 chain: 2 passes, 14.5 ms
#: vs 20.9 at k=6 and 33.8 at k=3) and its ~3600-statement butterfly
#: body still remote-compiles in ~2 s.
_MAX_SANDWICH_K = 7


@functools.lru_cache(maxsize=1024)
def _build_hdh_multi_kernel(mu_terms: tuple, nu_terms_k: tuple,
                            chunk_g: int, sblk: int, stride_rows: int,
                            has_mu: bool, comp):
    """k-sandwich kernel body: ``nu_terms_k[t]`` is the profile of
    ancilla ``anc_lo + t`` (block axis-1 bit t), one shared mu profile.
    ``comp`` is None for the read-write form; an int complement bit mask
    selects the write-only uniform-init form (the uniform state is
    nonzero where ``x & comp == 0``). Angles arrive in SMEM as
    host-precomputed rotation pairs: [cos/sin of mu_b, nu1_b..nuk_b
    (2*(1+k) floats); (cos a-1, sin a) per mu then per nu term; raw
    bases (1+k) + raw angles tail; multilinear cos/sin blocks (see
    _cs_support); uniform amplitude (comp mode only)]."""

    k = len(nu_terms_k)
    nsub = 1 << k
    n_mu = len(mu_terms)
    n_nu = [len(t) for t in nu_terms_k]
    positions = sorted(
        {p for conds in (mu_terms + sum(nu_terms_k, ()))
         for p, _ in conds}
    )
    shape = (chunk_g, sblk, LANE)
    nb = 1 + k
    raw = 2 * nb + 2 * (n_mu + sum(n_nu))
    mblocks, amp_idx = _moebius_layout(
        (mu_terms,) + nu_terms_k, raw + nb + n_mu + sum(n_nu))

    def kernel(ang_ref, *refs):
        if comp is None:
            re_ref, im_ref, ore_ref, oim_ref = refs
        else:
            ore_ref, oim_ref = refs
        i = pl.program_id(0)
        j = pl.program_id(1)
        gi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        si = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        li = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        # basis index of the all-ancillas-0 element (profiles never
        # condition on any of the k ancillas)
        x = (((i * chunk_g + gi) * nsub * stride_rows)
             + (j * sblk + si)) * LANE + li
        bit = {p: ((x >> p) & 1).astype(jnp.float32) for p in positions}

        def term_mask(conds):
            mask = None
            for pos, want in conds:
                b = bit[pos] if want else (1.0 - bit[pos])
                mask = b if mask is None else mask * b
            return mask

        def rotor(terms, base_cs, pair_off):
            c = jnp.full(shape, 1.0) * ang_ref[base_cs]
            s = jnp.full(shape, 1.0) * ang_ref[base_cs + 1]
            for t, conds in enumerate(terms):  # static unroll
                mask = term_mask(conds)
                ca1 = ang_ref[pair_off + 2 * t]
                sa = ang_ref[pair_off + 2 * t + 1]
                u = c * ca1 - s * sa
                v = s * ca1 + c * sa
                if mask is None:
                    c = c + u
                    s = s + v
                else:
                    c = c + mask * u
                    s = s + mask * v
            return c, s

        def profile(terms, base_idx, off):
            ang = jnp.zeros(shape, jnp.float32) + ang_ref[base_idx]
            for t, conds in enumerate(terms):  # static unroll
                mask = term_mask(conds)
                ang = ang + ang_ref[off + t] * (
                    mask if mask is not None else 1.0
                )
            return ang

        def cos_sin(terms, base_cs, pair_off, raw_base, raw_off, mblock):
            sup, moff = mblock
            if sup is not None:
                return _moebius_cs_eval(bit, sup, ang_ref, moff, shape)
            if len(terms) <= _MAX_ROTOR_TERMS:
                return rotor(terms, base_cs, pair_off)
            ang = profile(terms, raw_base, raw_off)
            return jnp.cos(ang), jnp.sin(ang)

        cs = []
        pair_off = 2 * nb + 2 * n_mu
        raw_off = raw + nb + n_mu
        for t in range(k):
            cs.append(cos_sin(nu_terms_k[t], 2 + 2 * t, pair_off,
                              raw + 1 + t, raw_off, mblocks[1 + t]))
            pair_off += 2 * n_nu[t]
            raw_off += n_nu[t]

        if has_mu:  # static specialization: QCMRF profiles have mu == 0
            cm, sm = cos_sin(mu_terms, 0, 2 * nb, raw, raw + nb,
                             mblocks[0])

        if comp is None:
            vr = [re_ref[:, jj] for jj in range(nsub)]
            vi = [im_ref[:, jj] for jj in range(nsub)]
            # sequential e^{-i nu_b X} on each ancilla bit of the
            # 2^k-way axis (the rotations act on disjoint bits and
            # commute)
            for b in range(k):
                c, s = cs[b]
                for jj in range(nsub):
                    if jj & (1 << b):
                        continue
                    p0, p1 = jj, jj | (1 << b)
                    r0, i0 = vr[p0], vi[p0]
                    r1, i1 = vr[p1], vi[p1]
                    vr[p0] = c * r0 + s * i1
                    vi[p0] = c * i0 - s * r1
                    vr[p1] = s * i0 + c * r1
                    vi[p1] = c * i1 - s * r0
            vals = list(zip(vr, vi))
        else:
            # write-only uniform-init form: input is the uniform state
            # (sub-plane jj=0 only); prods[jj] = amp * prod_b (s_b if
            # bit b of jj else c_b), built level by level so each
            # product is one multiply
            amp = (jnp.where((x & comp) == 0, 1.0, 0.0)
                   * ang_ref[amp_idx])
            prods = [amp]
            for b in range(k):
                cb, sb = cs[b]
                prods = [p * cb for p in prods] + [p * sb for p in prods]
            zero = jnp.zeros(shape, jnp.float32)
            vals = []
            for jj in range(nsub):
                m = bin(jj).count("1") % 4  # (-i)^popcount phase class
                pr = prods[jj]
                rv = pr if m == 0 else (-pr if m == 2 else zero)
                iv = -pr if m == 1 else (pr if m == 3 else zero)
                vals.append((rv, iv))

        if has_mu:
            for jj, (rv, iv) in enumerate(vals):
                ore_ref[:, jj] = cm * rv - sm * iv
                oim_ref[:, jj] = cm * iv + sm * rv
        else:
            for jj, (rv, iv) in enumerate(vals):
                ore_ref[:, jj] = rv
                oim_ref[:, jj] = iv

    return kernel


def _multi_geometry(rows: int, anc_lo: int, k: int):
    """Block geometry shared by both multi forms: 2^k sub-planes per
    block, block held at ~2048 rows (1 MB/plane — the quad kernel's
    proven VMEM budget)."""
    nsub = 1 << k
    stride_rows = 1 << (anc_lo - 7)
    g = rows // (nsub * stride_rows)
    sblk = min(stride_rows, max(1, 2048 // nsub))
    chunk_g = max(1, min(g, 1024 // (nsub * sblk)))
    return nsub, stride_rows, g, sblk, chunk_g


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _hdh_multi_call(mu_terms: tuple, nu_terms_k: tuple, anc_lo: int,
                    has_mu: bool, ang, re, im):
    rows = re.shape[0]
    k = len(nu_terms_k)
    nsub, stride_rows, g, sblk, chunk_g = _multi_geometry(rows, anc_lo, k)
    re_k = re.reshape(g, nsub, stride_rows, LANE)
    im_k = im.reshape(g, nsub, stride_rows, LANE)
    kernel = _build_hdh_multi_kernel(mu_terms, nu_terms_k, chunk_g, sblk,
                                     stride_rows, has_mu, None)
    bspec = pl.BlockSpec((chunk_g, nsub, sblk, LANE),
                         lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(re_k.shape, jnp.float32),
            jax.ShapeDtypeStruct(re_k.shape, jnp.float32),
        ),
        grid=(g // chunk_g, stride_rows // sblk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), bspec, bspec],
        out_specs=(bspec, bspec),
        input_output_aliases={1: 0, 2: 1},  # in-place planes
        interpret=_interpret(),
    )(ang, re_k, im_k)
    return (out[0].reshape(rows, LANE), out[1].reshape(rows, LANE))


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _hdh_multi_uniform_call(mu_terms: tuple, nu_terms_k: tuple,
                            anc_lo: int, has_mu: bool, comp: int,
                            num_qubits: int, ang):
    rows = (1 << num_qubits) // 128
    k = len(nu_terms_k)
    nsub, stride_rows, g, sblk, chunk_g = _multi_geometry(rows, anc_lo, k)
    kernel = _build_hdh_multi_kernel(mu_terms, nu_terms_k, chunk_g, sblk,
                                     stride_rows, has_mu, comp)
    shape_k = (g, nsub, stride_rows, LANE)
    bspec = pl.BlockSpec((chunk_g, nsub, sblk, LANE),
                         lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(shape_k, jnp.float32),
            jax.ShapeDtypeStruct(shape_k, jnp.float32),
        ),
        grid=(g // chunk_g, stride_rows // sblk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(bspec, bspec),
        interpret=_interpret(),
    )(ang)
    return (out[0].reshape(rows, LANE), out[1].reshape(rows, LANE))


def _multi_smem_vector(k, nu_terms_k, nu_angles_k, nu_bases_k, mu_terms,
                       mu_angles, mu_base, amp=None):
    """Host-side SMEM angle vector shared by both multi forms (layout in
    _build_hdh_multi_kernel's docstring)."""
    bases = jnp.asarray([mu_base] + list(nu_bases_k), jnp.float32)
    terms_a = jnp.asarray(
        list(mu_angles) + [a for al in nu_angles_k for a in al],
        jnp.float32,
    ).reshape(-1)
    pairs = jnp.stack(
        [jnp.cos(terms_a) - 1.0, jnp.sin(terms_a)], axis=-1
    ).reshape(-1) if terms_a.size else terms_a
    base_cs = jnp.stack(
        [jnp.cos(bases), jnp.sin(bases)], axis=-1
    ).reshape(-1)
    parts = [base_cs, pairs, bases, terms_a]
    profiles = [(mu_terms, mu_angles, mu_base)] + [
        (nu_terms_k[t], nu_angles_k[t], nu_bases_k[t]) for t in range(k)
    ]
    for p_terms, p_angles, p_base in profiles:
        if _cs_support(p_terms) is not None:
            parts.append(_cs_coeff_block(p_terms, p_angles, p_base))
    if amp is not None:
        parts.append(jnp.asarray(amp, jnp.float32).reshape(1))
    return jnp.concatenate(parts)


def _canon_terms(ts):
    return tuple(
        tuple((int(p), int(w)) for p, w in conds) for conds in ts
    )


def apply_hdh_sandwich_multi(re, im, anc_lo: int, nu_terms_k,
                             nu_angles_k, nu_bases_k, mu_terms=(),
                             mu_angles=(), mu_base=0.0):
    """Apply k H(a+t)·Dt·H(a+t) blocks (t = 0..k-1, a = anc_lo) in ONE
    pass.

    ``nu_terms_k[t]`` / ``nu_angles_k[t]`` / ``nu_bases_k[t]`` describe
    ancilla ``anc_lo + t``'s half-difference profile; ``mu`` is the
    COMBINED common-phase profile of all k sandwiches. No term may
    condition on any of the k ancillas; requires ``anc_lo >= 7`` (row
    qubits throughout) and ``k <= _MAX_SANDWICH_K``.
    """
    mu_terms = _canon_terms(mu_terms)
    nu_terms_k = tuple(_canon_terms(ts) for ts in nu_terms_k)
    k = len(nu_terms_k)
    assert 1 <= k <= _MAX_SANDWICH_K
    ang = _multi_smem_vector(k, nu_terms_k, nu_angles_k, nu_bases_k,
                             mu_terms, mu_angles, mu_base)
    if isinstance(mu_base, (int, float)):
        has_mu = bool(mu_terms) or float(mu_base) != 0.0
    else:
        has_mu = True  # traced base (sharded device-bit angles)
    return _hdh_multi_call(mu_terms, nu_terms_k, int(anc_lo), has_mu,
                           ang, re, im)


def apply_hdh_sandwich_multi_uniform(num_qubits: int, folded,
                                     anc_lo: int, nu_terms_k,
                                     nu_angles_k, nu_bases_k,
                                     mu_terms=(), mu_angles=(),
                                     mu_base=0.0, carrier=1.0):
    """Write-only pass producing k sandwiches applied to the uniform
    H-wall state (``sim.tpu.fold_uniform_prefix`` fold followed by
    ``apply_hdh_sandwich_multi``), without materializing the uniform
    planes. ``folded`` must NOT contain any of the k ancillas
    (``fold_uniform_prefix`` never folds them); ``carrier`` is an
    optional traced scalar equal to 1.0 at runtime (benchmark-chain
    data dependence, see ``sim.tpu.uniform_planes``)."""
    mu_terms = _canon_terms(mu_terms)
    nu_terms_k = tuple(_canon_terms(ts) for ts in nu_terms_k)
    k = len(nu_terms_k)
    assert 1 <= k <= _MAX_SANDWICH_K
    assert not any(anc_lo <= q < anc_lo + k for q in folded)
    comp = ((1 << num_qubits) - 1) ^ sum(1 << q for q in folded)
    amp = (jnp.asarray(carrier, jnp.float32)
           * np.float32(2.0 ** (-0.5 * len(folded))))
    ang = _multi_smem_vector(k, nu_terms_k, nu_angles_k, nu_bases_k,
                             mu_terms, mu_angles, mu_base, amp=amp)
    if isinstance(mu_base, (int, float)):
        has_mu = bool(mu_terms) or float(mu_base) != 0.0
    else:
        has_mu = True
    return _hdh_multi_uniform_call(mu_terms, nu_terms_k, int(anc_lo),
                                   has_mu, comp, int(num_qubits), ang)


def apply_hdh_sandwich_quad(re, im, anc_lo: int, nu_terms4, nu_angles4,
                            nu_bases4, mu_terms=(), mu_angles=(),
                            mu_base=0.0):
    """Four adjacent-ancilla sandwiches in one pass (multi with k=4;
    kept as the k=4 entry point for the single-chip engine's
    ``sandwich4`` ops and tests — the sharded engine calls
    :func:`apply_hdh_sandwich_multi` directly)."""
    return apply_hdh_sandwich_multi(re, im, anc_lo, nu_terms4,
                                    nu_angles4, nu_bases4, mu_terms,
                                    mu_angles, mu_base)


def apply_hdh_sandwich_quad_uniform(num_qubits: int, folded, anc_lo: int,
                                    nu_terms4, nu_angles4, nu_bases4,
                                    mu_terms=(), mu_angles=(),
                                    mu_base=0.0, carrier=1.0):
    """Write-only uniform-init quad (multi-uniform with k=4)."""
    return apply_hdh_sandwich_multi_uniform(
        num_qubits, folded, anc_lo, nu_terms4, nu_angles4, nu_bases4,
        mu_terms, mu_angles, mu_base, carrier)


# --------------------------------------------------------------------------
# Fused QCMRF post-selected amplitude kernel: amp[x] = 2^{-n/2} e^{lp(x)/2}
# --------------------------------------------------------------------------


def postselected_amplitudes(mrf: MRF) -> jax.Array:
    """Amplitudes of the all-ancilla-zero branch over all 2**n states —
    the circuit's post-selected wavefunction in one fused kernel
    (SURVEY.md Appendix A item 5: each clique contributes
    cos(2*gamma) = e^{beta*theta/2}); the exp/scale is fused into the
    log-potential kernel epilogue."""
    if mrf.n < _MIN_KERNEL_N:
        lp = mrf.beta * mrf.all_log_potentials()
        return jnp.exp(0.5 * lp) * (2.0 ** (-0.5 * mrf.n))
    coef = _moebius_coefficients(mrf)
    beta = jnp.reshape(jnp.asarray(mrf.beta, jnp.float32), (1,))
    return _logpot_call(mrf.cliques, mrf.n, True, coef, beta)
