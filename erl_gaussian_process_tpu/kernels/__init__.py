"""Covariance kernels (the TPU-native equivalent of the external
``erl_covariance`` package the reference links against; API surface
reconstructed from call sites, see SURVEY.md §2.2).

All kernels are unit-variance (``k(x, x) = 1``) — downstream variance
formulas rely on this (reference: src/vanilla_gp.cpp:121 uses
``var = 1 - ||L^{-1} k*||^2``). Observation noise enters the gram diagonal
inside the train-gram builders, matching the reference contract where noise
lives inside ``ComputeKtrain`` (src/vanilla_gp.cpp:487).
"""

from erl_gaussian_process_tpu.kernels.base import (
    KernelSetting,
    get_kernel,
    is_mixture_setting,
    kernel_names,
    mixture_params,
    register_kernel,
    resolve_kernel_name,
    resolve_kernel_setting,
    validate_kernel_setting,
)
from erl_gaussian_process_tpu.kernels.stationary import (
    cross_gram,
    kernel_fn,
    pairwise_dist,
    pairwise_sqdist,
    register_scale_mixture,
    train_gram,
)
from erl_gaussian_process_tpu.kernels.gradient import (
    cross_gram_with_gradient,
    gradient_prior_variance,
    train_gram_with_gradient,
)
from erl_gaussian_process_tpu.kernels.reduced_rank import (
    ReducedRankBasis,
    ReducedRankSetting,
    parse_reduced_rank_name,
    spectral_density,
)

__all__ = [
    "KernelSetting",
    "get_kernel",
    "is_mixture_setting",
    "kernel_names",
    "mixture_params",
    "register_kernel",
    "register_scale_mixture",
    "resolve_kernel_name",
    "resolve_kernel_setting",
    "validate_kernel_setting",
    "cross_gram",
    "kernel_fn",
    "pairwise_dist",
    "pairwise_sqdist",
    "train_gram",
    "cross_gram_with_gradient",
    "gradient_prior_variance",
    "train_gram_with_gradient",
    "ReducedRankBasis",
    "ReducedRankSetting",
    "parse_reduced_rank_name",
    "spectral_density",
]
