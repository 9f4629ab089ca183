"""Invertible scalar transforms for distance-space regression
(reference: Mapping, include/erl_gaussian_process/mapping.hpp,
src/mapping.cpp:114-163). ``inverse_sqrt`` is the default for sensor GPs
(lidar_gp_2d.hpp:57-62).

Map/inv pairs are jnp-traceable so they fuse into jitted pipelines.
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp


class MappingType(str, enum.Enum):
    IDENTITY = "kIdentity"
    INVERSE = "kInverse"
    INVERSE_SQRT = "kInverseSqrt"
    EXP = "kExp"
    LOG = "kLog"
    TANH = "kTanh"
    SIGMOID = "kSigmoid"

    @classmethod
    def parse(cls, v):
        if isinstance(v, cls):
            return v
        s = str(v)
        for m in cls:
            if s in (m.value, m.name, m.name.lower()):
                return m
        raise ValueError(f"unknown mapping type {v!r}")


@dataclasses.dataclass
class MappingSetting:
    type: MappingType = MappingType.IDENTITY
    scale: float = 1.0

    def to_dict(self):
        return {"type": self.type.value, "scale": self.scale}

    @classmethod
    def from_dict(cls, d):
        d = dict(d or {})
        return cls(type=MappingType.parse(d.get("type", "kIdentity")),
                   scale=float(d.get("scale", 1.0)))


class Mapping:
    Setting = MappingSetting
    Type = MappingType

    def __init__(self, setting: MappingSetting | None = None):
        self.setting = setting or MappingSetting()
        t, s = self.setting.type, self.setting.scale
        if t == MappingType.IDENTITY:
            self.map = lambda x: x
            self.inv = lambda y: y
        elif t == MappingType.INVERSE:
            self.map = lambda x: 1.0 / x
            self.inv = self.map
        elif t == MappingType.INVERSE_SQRT:
            self.map = lambda x: 1.0 / jnp.sqrt(x)
            self.inv = lambda y: 1.0 / (y * y)
        elif t == MappingType.EXP:
            self.map = lambda x: jnp.exp(-s * x)
            self.inv = lambda y: -jnp.log(y) / s
        elif t == MappingType.LOG:
            self.map = lambda x: jnp.log(s * x)
            self.inv = lambda y: jnp.exp(y) / s
        elif t == MappingType.TANH:
            self.map = lambda x: jnp.tanh(s * x)
            self.inv = lambda y: jnp.arctanh(y) / s
        elif t == MappingType.SIGMOID:
            self.map = lambda x: 1.0 / (1.0 + jnp.exp(-s * x))
            self.inv = lambda y: jnp.log(y / (1.0 - y)) / s
        else:
            raise ValueError(f"mapping type {t} is not supported")

    def inv_masked(self, y, valid):
        """``inv()`` over valid lanes only. Invalid lanes (masked garbage —
        unresolved partitions, variance-gated predictions) never reach the
        inverse, so a zero mean cannot raise a divide-by-zero RuntimeWarning
        (e.g. ``1/(y*y)`` for inverse_sqrt); they yield ``+inf``, the same
        unusable sentinel the raw inverse produced for a zero input. The
        placeholder 0.5 is in every mapping type's invertible domain."""
        import numpy as np
        y = np.asarray(y)
        valid = np.asarray(valid, bool)
        safe = np.where(valid, y, y.dtype.type(0.5))
        out = np.asarray(self.inv(safe))
        return np.where(valid, out, out.dtype.type(np.inf))

    @classmethod
    def create(cls, setting=None):
        return cls(setting)
