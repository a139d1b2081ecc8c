"""Classical samplers over MRFs (exact / Gibbs chain / perturb-and-MAP).

TPU-native replacement for ``kiopto_native``'s sampling API
(``px.sample(b)`` and ``px.sample(b, pam=True)``, reference
/root/reference/eval.py:95-113). All samplers are jit-compiled, use
``jax.random`` keys, and express the Markov chain with ``lax.scan`` —
no Python-level loops over samples.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from qcmrf_tpu.models.mrf import MRF


@functools.partial(jax.jit, static_argnums=(2,))
def sample_exact(key: jax.Array, mrf: MRF, num_samples: int) -> jax.Array:
    """IID exact samples (state ids) from the Gibbs distribution.

    Uses the full ``2**n`` logits table — the exact analog of the
    reference's post-selected quantum sampling target.
    """
    logits = mrf.beta * mrf.all_log_potentials()
    return jax.random.categorical(key, logits, shape=(num_samples,)).astype(
        jnp.int32
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def sample_gibbs(
    key: jax.Array,
    mrf: MRF,
    num_samples: int,
    thin: int = 10,
    burn: int = 10,
) -> jax.Array:
    """Single-site systematic-scan Gibbs chain, returning thinned state ids.

    Mirrors the reference's classical baseline ``--mode gibbs``
    (eval.py:95-104: a long chain thinned by 10). One "step" is a full
    sweep over all ``n`` variables; the chain runs
    ``burn + num_samples * thin`` sweeps under ``lax.scan`` and every
    ``thin``-th post-burn-in state is emitted.
    """
    n = mrf.n
    positions = jnp.arange(n - 1, -1, -1, dtype=jnp.int32)  # bit pos of var v

    def sweep(carry, key_sweep):
        x = carry
        keys = jax.random.split(key_sweep, n)

        def site(v, x):
            pos = positions[v]
            x0 = x & ~(1 << pos)
            x1 = x | (1 << pos)
            d = mrf.beta * (mrf.log_potential(x1) - mrf.log_potential(x0))
            p1 = jax.nn.sigmoid(d)
            b = jax.random.bernoulli(keys[v], p1)
            return jnp.where(b, x1, x0)

        x = jax.lax.fori_loop(0, n, site, x)
        return x, x

    total = burn + num_samples * thin
    key_init, key_chain = jax.random.split(key)
    x0 = jax.random.randint(key_init, (), 0, mrf.num_states, dtype=jnp.int32)
    _, xs = jax.lax.scan(sweep, x0, jax.random.split(key_chain, total))
    return xs[burn::thin][:num_samples]


@functools.partial(jax.jit, static_argnums=(2,))
def sample_pam(key: jax.Array, mrf: MRF, num_samples: int) -> jax.Array:
    """Low-order perturb-and-MAP samples (state ids).

    Mirrors the reference's ``--mode pam`` baseline
    (``px.sample(b, pam=True)``, eval.py:106-113): perturb every
    clique-state weight with IID Gumbel noise and return the MAP state of
    the perturbed model. Low-order perturbation makes this an
    *approximate* (upper-bound) sampler, like the classical PAM baseline.
    """
    # (2**n, K) active-weight index table, shared across samples.
    idx = mrf.suff_stat_flat_indices(
        jnp.arange(mrf.num_states, dtype=jnp.int32)
    )

    def one(k):
        g = jax.random.gumbel(k, (mrf.dimension,), dtype=mrf.theta.dtype)
        perturbed = mrf.beta * mrf.theta + g
        scores = perturbed[idx].sum(axis=-1)  # (2**n,)
        return jnp.argmax(scores).astype(jnp.int32)

    return jax.vmap(one)(jax.random.split(key, num_samples))


@jax.jit
def map_state(mrf: MRF) -> jax.Array:
    """Exact MAP state id (argmax of the Gibbs distribution)."""
    return jnp.argmax(mrf.all_log_potentials()).astype(jnp.int32)
