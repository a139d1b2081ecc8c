"""Beyond-reference scaling: n=24 grid MRFs on the 8-device mesh
(BASELINE.json config 5; the reference caps at 10 qubits)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qcmrf_tpu.models.mrf import grid_mrf
from qcmrf_tpu.parallel import sharded


@pytest.mark.slow
def test_n24_sharded_estimation():
    mrf = grid_mrf(4, 6)  # n=24, K=38
    rng = np.random.RandomState(0)
    mrf = mrf.with_theta(
        jnp.asarray(-np.abs(rng.randn(mrf.dimension)).astype(np.float32)
                    * 0.1)
    )
    mesh = sharded.make_mesh(8)
    lnZ = float(sharded.sharded_log_partition(mrf, mesh))
    assert np.isfinite(lnZ)
    # shot-based estimate of lnZ via the post-selection success rate
    x, acc = sharded.sharded_sample_postselected(
        jax.random.PRNGKey(0), mrf, mesh, 1 << 18
    )
    delta = float(jnp.mean(acc))
    lnZ_hat = np.log(delta) + mrf.n * np.log(2.0)
    assert abs(lnZ_hat - lnZ) < 0.05
    # accepted samples concentrate on higher-potential states than
    # rejected ones (Gibbs reweighting sanity)
    lp = mrf.log_potential(x)
    acc_np = np.asarray(acc)
    assert float(jnp.mean(lp[acc_np])) > float(jnp.mean(lp[~acc_np]))


def test_scaling_runner_cli():
    from qcmrf_tpu.runners.scaling import main

    out = main(["--n", "24", "--devices", "8", "--estimations", "1",
                "--shots", str(1 << 16), "--json"])
    assert out["n"] == 24 and out["devices"] == 8
    assert out["lnZ_abs_err"] < 0.1
