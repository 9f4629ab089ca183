"""Kernel registry and settings.

Replaces the reference's string-keyed covariance factory
(``Covariance::CreateCovariance(kernel_type, setting)``,
reference: src/vanilla_gp.cpp:820) with a plain name→family registry.
Reference C++ type names (e.g. ``erl::covariance::Matern32<float, 2>``) are
accepted and normalized so reference YAML configs load unchanged
(reference: config/spgp_occupancy_map_2d.yaml:2).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Dict, List

import numpy as np

_REGISTRY: Dict[str, Dict[str, Callable]] = {}

# erl::covariance::RadialBiasFunction<double, 1> -> radial_bias_function
_CPP_NAME_RE = re.compile(r"^erl::covariance::(\w+)\s*<.*>$")
_CAMEL_RE = re.compile(r"(?<!^)(?=[A-Z])")

_ALIASES = {
    "radial_bias_function": "rbf",
    "squared_exponential": "rbf",
    "ornstein_uhlenbeck": "ou",
    "exponential": "ou",
    "matern32": "matern32",
}


@dataclasses.dataclass
class KernelSetting:
    """Mirror of ``covariance::Covariance<Dtype>::Setting``
    (fields observable in reference: config/spgp_occupancy_map_2d.yaml:4-7).

    ``x_dim = -1`` means "any dimension" (reference: src/noisy_input_gp.cpp:709).
    ``scale_mix``/``weights`` exist for scale-mixture kernels in the reference
    YAML schema; kept for config round-trip compatibility.
    """

    x_dim: int = -1
    scale: float = 1.0
    scale_mix: float = 1.0
    weights: List[float] = dataclasses.field(default_factory=list)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "KernelSetting":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in (d or {}).items() if k in known})


def validate_kernel_setting(ks, context: str = "") -> None:
    """Config honesty: ``scale_mix``/``weights`` select scale-mixture
    kernels in the reference's erl_covariance — there is no compute path
    for them here, so a config that sets them non-neutral would silently
    produce different posteriors than the reference. Reject loudly
    (reference-neutral values are scale_mix=1, weights=[], the values in
    every reference config: /root/reference/config/*.yaml:7-8)."""
    mix = getattr(ks, "scale_mix", 1.0)
    w = getattr(ks, "weights", None)
    w = [] if w is None else list(np.asarray(w).ravel()) if not isinstance(
        w, (list, tuple)) else list(w)
    if float(mix) != 1.0 or len(w) > 0:
        raise NotImplementedError(
            f"{context or 'kernel'}: scale_mix={mix!r} / weights={list(w)!r} "
            "request a scale-mixture kernel, which this rebuild does not "
            "implement — use scale_mix: 1 and weights: [] (the values in "
            "all reference configs), or open the deviation list in "
            "docs/parity.md")


def resolve_kernel_name(name: str) -> str:
    """Normalize a kernel name: accepts registry keys, aliases, and reference
    C++ type names like ``erl::covariance::OrnsteinUhlenbeck1d`` or
    ``erl::covariance::Matern32<float, 2>``."""
    raw = name.strip()
    direct = _ALIASES.get(raw.lower(), raw.lower())
    if direct in _REGISTRY:
        return direct
    m = _CPP_NAME_RE.match(raw)
    if m:
        raw = m.group(1)
    elif raw.startswith("erl::covariance::"):
        raw = raw[len("erl::covariance::"):]
    direct = _ALIASES.get(raw.lower(), raw.lower())
    if direct in _REGISTRY:
        return direct
    # strip trailing dtype/dim suffixes: RadialBiasFunction1d, OrnsteinUhlenbeck2d
    raw = re.sub(r"\d+[df]?$", "", raw)
    snake = _CAMEL_RE.sub("_", raw).lower().strip("_")
    snake = _ALIASES.get(snake, snake)
    if snake in _REGISTRY:
        return snake
    if raw.lower() in _REGISTRY:
        return raw.lower()
    raise KeyError(
        f"unknown kernel {name!r} (normalized {snake!r}); known: {sorted(_REGISTRY)}"
    )


def register_kernel(name: str, **fns: Callable) -> None:
    _REGISTRY[name] = fns


def get_kernel(name: str) -> Dict[str, Callable]:
    return _REGISTRY[resolve_kernel_name(name)]


def kernel_names() -> List[str]:
    return sorted(_REGISTRY)
