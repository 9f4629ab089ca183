"""Multi-chip sharding equivalence on the virtual 8-device CPU mesh:
sharded results must match the single-device functional cores."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from erl_gaussian_process_tpu.models.batch_gp import bank_fit
from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
    spgp_init,
    spgp_update,
)
from erl_gaussian_process_tpu.parallel import (
    make_mesh,
    sharded_bank_fit,
    sharded_spgp_update,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_sharded_bank_fit_matches_local():
    rng = np.random.default_rng(0)
    B, n = 16, 12
    x = jnp.asarray(rng.uniform(0, 1, (B, n, 1)))
    y = jnp.asarray(rng.uniform(-1, 1, (B, n, 1)))
    var = jnp.full((B, n), 1e-3)
    mask = jnp.asarray(rng.uniform(size=(B, n)) < 0.8)
    mesh = make_mesh(8)
    sharded = sharded_bank_fit(mesh, x, y, var, mask, 0.3, kernel="rbf")
    local = bank_fit(x, y, var, mask, 0.3, kernel="rbf")
    np.testing.assert_allclose(sharded.L, local.L, atol=1e-12)
    np.testing.assert_allclose(sharded.alpha, local.alpha, atol=1e-12)
    np.testing.assert_array_equal(sharded.trained, local.trained)


def test_sharded_spgp_update_matches_local():
    rng = np.random.default_rng(1)
    c = np.linspace(-1, 1, 5)
    pv, qv = np.meshgrid(c, c, indexing="ij")
    pseudo = jnp.asarray(np.stack([pv.ravel(), qv.ravel()], axis=-1))
    state = spgp_init(pseudo, 0.4, kernel="matern32")
    n = 8 * 25
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    y = jnp.asarray(rng.uniform(-1, 1, (n, 1)))
    var = jnp.full((n,), 1e-3)
    mask = jnp.asarray(rng.uniform(size=(n,)) < 0.9)
    mesh = make_mesh(8)
    sharded = sharded_spgp_update(mesh, state, x, y, var, mask, 0.4,
                                  kernel="matern32")
    local = spgp_update(state, x, y, var, mask, 0.4, kernel="matern32")
    np.testing.assert_allclose(sharded.qm, local.qm, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(sharded.alpha, local.alpha, rtol=1e-10,
                               atol=1e-10)


def test_sharded_spgp_predict_matches_single_device():
    """Query-sharded predict == unsharded predict (no collectives)."""
    import jax.numpy as jnp
    from erl_gaussian_process_tpu.models.sparse_pseudo_input_gp import (
        spgp_init, spgp_prepare, spgp_predict, spgp_update,
    )
    from erl_gaussian_process_tpu.parallel import (
        make_mesh, sharded_spgp_predict,
    )

    rng = np.random.default_rng(0)
    pseudo = jnp.asarray(rng.uniform(-1, 1, (32, 2)))
    st = spgp_init(pseudo, 0.4, kernel="matern32")
    n = 64
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    y = jnp.asarray(rng.uniform(-1, 1, (n, 1)))
    st = spgp_update(st, x, y, jnp.full((n,), 1e-3), jnp.ones(n, bool),
                     0.4, kernel="matern32")
    L_qm, a = spgp_prepare(st)
    xq = jnp.asarray(rng.uniform(-1, 1, (8 * 5, 2)))

    mesh = make_mesh(8)
    mean_s, var_s = sharded_spgp_predict(mesh, st, L_qm, a, xq, 0.4,
                                         kernel="matern32")
    mean_r, _, var_r = spgp_predict(st, L_qm, a, xq, 0.4, kernel="matern32")
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_r),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_r),
                               rtol=1e-10, atol=1e-12)
