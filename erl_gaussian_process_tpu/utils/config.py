"""Polymorphic YAML config system.

TPU-native equivalent of the reference's ``common::Yamlable<T>`` /
``YamlableBase::Create<T>(type_string)`` machinery (reference:
src/vanilla_gp.cpp:29, src/init.cpp:27-36, and the
``FromYamlFile/AsYamlFile`` round-trip used in
test/gtest/test_spgp_occupancy_map_2d.cpp:263-267): every model ``Setting``
is a plain dataclass with ``to_dict``/``from_dict``; this module adds

- a name -> setting-class registry (``register_setting`` / ``create_setting``)
  keyed by both short names (``"spgp_occupancy_map"``) and the reference's
  C++ type strings (``"erl::gaussian_process::SpGpOccupancyMap<float, 2>::Setting"``)
  so reference YAML files that carry type tags load unchanged;
- ``from_yaml_file/str`` and ``as_yaml_file/str`` helpers usable with any
  registered setting class.

The registrations themselves live in :mod:`erl_gaussian_process_tpu.init`
(the equivalent of the reference's ``Init()``, src/init.cpp:13-44), which the
package ``__init__`` runs at import time.
"""

from __future__ import annotations

import io
import re
from typing import Dict, Type

import yaml

_SETTING_REGISTRY: Dict[str, Type] = {}

# erl::gaussian_process::VanillaGaussianProcess<double>::Setting -> vanilla...
_CPP_SETTING_RE = re.compile(
    r"^erl::\w+::(\w+)\s*(?:<[^>]*>)?\s*(?:::Setting)?$")
# split camelCase but keep acronym runs together: VanillaGPSetting ->
# vanilla_gp_setting, SpGpOccupancyMap -> sp_gp_occupancy_map
_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")


def _normalize(name: str) -> str:
    raw = name.strip()
    m = _CPP_SETTING_RE.match(raw)
    if m:
        raw = m.group(1)
    snake = _CAMEL_RE.sub("_", raw).lower().strip("_")
    # Sp_Gp -> sp_gp artifacts: collapse duplicate underscores
    return re.sub(r"_+", "_", snake)


def register_setting(cls: Type, *names: str) -> Type:
    """Register a setting dataclass under its snake-case class name plus any
    extra aliases (including reference C++ type strings)."""
    keys = {_normalize(cls.__name__)}
    keys.update(_normalize(n) for n in names)
    for k in keys:
        _SETTING_REGISTRY[k] = cls
    return cls


def create_setting(type_string: str, data: dict | None = None):
    """``YamlableBase::Create<T>(type_string)`` equivalent: build a registered
    setting (optionally populated from ``data``)."""
    key = _normalize(type_string)
    if key not in _SETTING_REGISTRY:
        raise KeyError(
            f"unknown setting type {type_string!r} (normalized {key!r}); "
            f"known: {sorted(_SETTING_REGISTRY)}")
    cls = _SETTING_REGISTRY[key]
    return cls.from_dict(data) if data is not None else cls()


def setting_names():
    return sorted(_SETTING_REGISTRY)


def from_yaml_str(cls: Type, text: str):
    return cls.from_dict(yaml.safe_load(text))


def from_yaml_file(cls: Type, path: str):
    with open(path) as f:
        return cls.from_dict(yaml.safe_load(f))


def as_yaml_str(setting) -> str:
    buf = io.StringIO()
    yaml.safe_dump(setting.to_dict(), buf, sort_keys=False)
    return buf.getvalue()


def as_yaml_file(setting, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(setting.to_dict(), f, sort_keys=False)
