"""Pallas TPU kernels for the hot ops (the TPU-native analogue of the
reference's native kernel engine, erl_covariance — SURVEY.md §2.2).

Auto-dispatch: the jnp reference implementations in ``kernels/stationary.py``
call into these when running on TPU with float32 and large-enough shapes;
set ``ERL_GP_NO_PALLAS=1`` to force the pure-jnp path everywhere.
"""

from erl_gaussian_process_tpu.ops.pallas_gram import (
    pallas_cross_gram,
    pallas_gram_enabled,
)

__all__ = ["pallas_cross_gram", "pallas_gram_enabled"]
