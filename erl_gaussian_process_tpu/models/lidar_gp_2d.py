"""One 2D lidar scan → a bank of small 1-D local GPs over overlapping angle
partitions (reference: LidarGaussianProcess2D,
include/erl_gaussian_process/lidar_gp_2d.hpp, src/lidar_gp_2d.cpp).

TPU-native redesign: the reference trains each partition GP in an OpenMP loop
(src/lidar_gp_2d.cpp:366-392); here every scan is ONE ``bank_fit`` call — a
padded (B, group_size) batch with a single batched Cholesky on the MXU.
Query routing (SearchPartition, :398-411) is a vectorized interval test plus
a gathered per-query 1-point predict (models/batch_gp.bank_predict_assigned).

Reduced-rank kernels thread through the whole class (a ``reduced_rank_*``
``gp.kernel_type``): the bank fit solves per-partition basis information
systems over a shared Hilbert basis (models/batch_gp.bank_fit_rr) and the
routed predict applies the +||.||^2 variance sign contract — mirroring the
reference's m_reduced_rank_kernel_ on the TestResult
(lidar_gp_2d.cpp:58,148-151).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from erl_gaussian_process_tpu.geometry.lidar_frame_2d import (
    LidarFrame2D,
    LidarFrame2DSetting,
)
from erl_gaussian_process_tpu.kernels import resolve_kernel_name
from erl_gaussian_process_tpu.models.batch_gp import (
    BankState,
    bank_fit,
    bank_predict_assigned,
)
from erl_gaussian_process_tpu.models.mapping import Mapping, MappingSetting, MappingType
from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting
from erl_gaussian_process_tpu.utils.serialization import (
    eq_state,
    load_pytree,
    save_pytree,
)


def partition_on_angles(n: int, group_size: int, overlap_size: int,
                        margin: int, symmetric: bool, coords: np.ndarray):
    """Angle-partition index/coord tables; exact port of the reference math
    (PartitionOnAngles, src/lidar_gp_2d.cpp:239-300). Returns a list of
    (index_left, index_right, coord_left, coord_right)."""
    gs = group_size
    step = group_size - overlap_size
    num_groups = max(1, n // step) + 1
    gs2 = (n - (num_groups - 2) * step) // 2
    half = overlap_size // 2
    parts = []
    if symmetric:
        parts.append((0, gs2 + half, coords[margin], coords[gs2]))
        for i in range(num_groups - 2):
            il = i * step + gs2 - half
            ir = il + gs
            parts.append((il, ir, coords[il + half], coords[ir - half]))
        parts.append((n - gs2 - half, n, coords[n - 1 - gs2],
                      coords[n - 1 - margin]))
        return parts
    for i in range(num_groups - 2):
        il = i * step
        ir = il + gs
        parts.append((il, ir, coords[il], coords[ir - half]))
    il = (num_groups - 2) * step
    ir = il + (n - il + overlap_size) // 2
    parts.append((il, ir, coords[il], coords[ir - half]))
    il = il + (n - il - overlap_size) // 2
    ir = n
    parts.append((il, ir, coords[il], coords[ir - 1]))
    return parts


def partition_on_hit_rays(hit_ray_indices: np.ndarray, n_hit: int,
                          group_size: int, overlap_size: int,
                          coords: np.ndarray):
    """Port of PartitionOnHitRays (src/lidar_gp_2d.cpp:302-348)."""
    step = group_size - overlap_size
    num_groups = max(1, n_hit // step) + 1
    h = hit_ray_indices
    parts = []
    for i in range(num_groups - 2):
        il, ir = i * step, i * step + group_size
        il, ir = int(h[il]), int(h[ir])
        parts.append((il, ir, coords[il], coords[ir]))
    il = (num_groups - 2) * step
    ir = il + (n_hit - il + overlap_size) // 2
    il2, ir2 = int(h[il]), int(h[ir])
    parts.append((il2, ir2, coords[il2], coords[ir2]))
    il = il + (n_hit - il - overlap_size) // 2
    il3 = int(h[il])
    ir3 = int(h[n_hit - 1]) + 1
    # the reference reads angles[index_right] with index_right possibly ==
    # num_rays when the LAST ray is a hit (lidar_gp_2d.cpp:345-346 —
    # unchecked Eigen indexing, silent UB in release); clamp the right
    # COORD to the last angle, keeping the exclusive index bound
    cr3 = coords[min(ir3, coords.shape[0] - 1)]
    parts.append((il3, ir3, coords[il3], cr3))
    return parts


@partial(jax.jit, static_argnames=("kernel", "discon_on", "map_type",
                                   "map_scale", "use_pallas"))
def _scan_train_fused(ranges, angles, idx, inb, vmin, vmax, thr, srv, dv,
                      scale, *, kernel: str, discon_on: bool, map_type,
                      map_scale: float, use_pallas: bool):
    """ONE dispatch per scan: hit/continuity masks + distance mapping +
    partition gather + batched bank fit, all fused in a single jit.

    The host-assembled path (``_assemble_bank_arrays`` + ``bank_fit``)
    ships four (B, width) arrays per scan — four separate host->device
    transfers whose round-trip latency dominates the 5.8 ms online number
    on the remote-TPU tunnel. Here the ONLY per-scan transfer is the raw
    (num_rays,) range vector; the angle grid and the partition index
    table are static device constants cached on the class.

    Bitwise contract with the host path: ``idx[b] = [il..il+width)`` with
    ``inb`` marking real slots; a stable argsort on ``~hit`` compacts hit
    rays to the front in ray order — exactly the
    ``np.arange(il, ir)[hit[il:ir]]`` gather of _assemble_bank_arrays —
    so the resulting BankState (x/mask/L/alpha) matches the reference
    Train semantics (src/lidar_gp_2d.cpp:366-392) slot for slot."""
    from erl_gaussian_process_tpu.models.batch_gp import bank_fit_core

    xs, ys, vs, ms = _gather_scan(ranges, angles, idx, inb, vmin, vmax, thr,
                                  srv, dv, discon_on=discon_on,
                                  map_type=map_type, map_scale=map_scale)
    return bank_fit_core(xs, ys, vs, ms, scale, kernel=kernel,
                         use_pallas=use_pallas)


def _gather_scan(ranges, angles, idx, inb, vmin, vmax, thr, srv, dv, *,
                 discon_on: bool, map_type, map_scale: float):
    """The traced gather half of the fused scan train (shared by the plain
    and reduced-rank variants): hit/continuity masks + mapping + compacting
    partition gather. Returns (xs (B,w,1), ys (B,w,1), vs (B,w), ms (B,w))."""
    finite = jnp.isfinite(ranges)
    hit = finite & (ranges >= vmin) & (ranges <= vmax)
    n = ranges.shape[0]
    if n > 1:
        # continuity: range jump to EITHER neighbor within threshold
        # (geometry/lidar_frame_2d.py update_ranges, same arithmetic)
        jump = jnp.abs(jnp.diff(jnp.where(finite, ranges, 0.0)))
        big = jump > thr
        left = jnp.zeros(n, bool).at[:-1].set(big)
        right = jnp.zeros(n, bool).at[1:].set(big)
        cont = ~(left | right)
    else:
        cont = jnp.ones(n, bool)
    mapped = Mapping(MappingSetting(type=map_type, scale=map_scale)).map(
        ranges)

    h = hit[idx] & inb                                   # (B, width)
    order = jnp.argsort(~h, axis=1, stable=True)         # hit-first, ray order
    sel = jnp.take_along_axis(idx, order, axis=1)
    ms = jnp.take_along_axis(h, order, axis=1)
    xs = jnp.where(ms, angles[sel], 0)[..., None]
    ys = jnp.where(ms, mapped[sel], 0)[..., None]
    v = jnp.where(cont[sel], srv, dv) if discon_on else srv
    vs = jnp.where(ms, v, 0)
    return xs, ys, vs, ms


@partial(jax.jit, static_argnames=("kernel", "discon_on", "map_type",
                                   "map_scale", "use_pallas"))
def _scan_train_batch_fused(ranges_batch, angles, idx, inb, vmin, vmax, thr,
                            srv, dv, scale, *, kernel: str, discon_on: bool,
                            map_type, map_scale: float, use_pallas: bool):
    """Offline trajectory replay: S scans' partition banks in ONE dispatch.
    The gather vmaps over the scan axis and the S*B members run one
    batched bank fit — the whole logged trajectory becomes a single
    MXU-shaped program, a throughput mode the reference's per-scan OpenMP
    loop has no analogue for. Returns a BankState with S*B members,
    scan-major (member s*B + b is scan s's partition b)."""
    from erl_gaussian_process_tpu.models.batch_gp import bank_fit_core

    def g(r):
        return _gather_scan(r, angles, idx, inb, vmin, vmax, thr, srv, dv,
                            discon_on=discon_on, map_type=map_type,
                            map_scale=map_scale)

    xs, ys, vs, ms = jax.vmap(g)(ranges_batch)
    S, B, w = ms.shape
    return bank_fit_core(xs.reshape(S * B, w, 1), ys.reshape(S * B, w, 1),
                         vs.reshape(S * B, w), ms.reshape(S * B, w), scale,
                         kernel=kernel, use_pallas=use_pallas)


@partial(jax.jit, static_argnames=("discon_on", "map_type", "map_scale"))
def _scan_train_fused_rr(ranges, angles, idx, inb, vmin, vmax, thr, srv, dv,
                         freq, sqrt_s, origin, half, inv_sqrt_vol, *,
                         discon_on: bool, map_type, map_scale: float):
    """Reduced-rank variant of the one-dispatch scan train: the shared
    gather feeds the per-partition Hilbert-basis information systems
    (models/batch_gp._bank_fit_rr_jit's math) in the same jit — one
    (num_rays,) transfer per scan for RR-configured lidar GPs too."""
    from erl_gaussian_process_tpu.models.batch_gp import bank_fit_rr_core

    xs, ys, vs, ms = _gather_scan(ranges, angles, idx, inb, vmin, vmax, thr,
                                  srv, dv, discon_on=discon_on,
                                  map_type=map_type, map_scale=map_scale)
    return bank_fit_rr_core(xs, ys, vs, ms, freq, sqrt_s, origin, half,
                            inv_sqrt_vol)


@dataclasses.dataclass
class LidarGP2DSetting:
    """Mirror of LidarGaussianProcess2D::Setting (lidar_gp_2d.hpp:30-71)."""

    partition_on_hit_rays: bool = False
    symmetric_partitions: bool = False
    group_size: int = 26
    overlap_size: int = 6
    margin: int = 1
    init_variance: float = 1e6
    sensor_range_var: float = 0.01
    discontinuity_var: float = 10.0
    max_valid_range_var: float = 0.1
    occ_test_temperature: float = 30.0
    sensor_frame: LidarFrame2DSetting = dataclasses.field(
        default_factory=LidarFrame2DSetting)
    gp: VanillaGPSetting = dataclasses.field(
        default_factory=lambda: VanillaGPSetting(kernel_type="ou"))
    mapping: MappingSetting = dataclasses.field(
        default_factory=lambda: MappingSetting(type=MappingType.INVERSE_SQRT))

    def to_dict(self):
        d = dataclasses.asdict(self)
        d["mapping"] = self.mapping.to_dict()
        return d

    @classmethod
    def from_dict(cls, d):
        d = dict(d or {})
        if "sensor_frame" in d:
            d["sensor_frame"] = LidarFrame2DSetting.from_dict(d["sensor_frame"])
        if "gp" in d:
            d["gp"] = VanillaGPSetting.from_dict(d["gp"])
        if "mapping" in d:
            d["mapping"] = MappingSetting.from_dict(d["mapping"])
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class LidarGP2DTestResult:
    """Routed query result (reference TestResult, src/lidar_gp_2d.cpp:48-167):
    mean/variance per query angle, with validity flags for unresolved
    queries."""

    def __init__(self, gp: "LidarGaussianProcess2D", angles: np.ndarray,
                 angles_are_local: bool, un_map: bool):
        self._gp = gp
        a = np.asarray(angles, gp.dtype).reshape(-1)
        if not angles_are_local:
            a = gp.sensor_frame.angles_world_to_frame(a)
        idx = gp.search_partition(a)
        mean, var, valid = bank_predict_assigned(
            gp.bank, a[:, None], idx,
            gp.dtype.type(gp._scale), kernel=gp._kernel,
            reduced_rank=gp.reduced_rank_kernel, basis=gp._basis)
        self._mean = np.asarray(mean[:, 0])
        self._var = np.asarray(var)
        self._valid = np.asarray(valid)
        self._un_map = un_map

    @property
    def num_test(self):
        return self._mean.shape[0]

    def get_mean(self, parallel: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (mean, valid). Mapped back through inv() when un_map."""
        del parallel
        f = self._mean
        if self._un_map:
            f = Mapping(self._gp.setting.mapping).inv_masked(f, self._valid)
        return f, self._valid.copy()

    def get_variance(self, parallel: bool = True):
        del parallel
        var = np.where(self._valid, self._var,
                       self._gp.setting.init_variance)
        return var, self._valid.copy()


class LidarGaussianProcess2D:
    Setting = LidarGP2DSetting
    TestResult = LidarGP2DTestResult

    def __init__(self, setting: Optional[LidarGP2DSetting] = None,
                 dtype=np.float64, mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` — each scan's partition
        bank is fitted with the bank axis sharded over the mesh
        (parallel/mesh.sharded_bank_fit; members are independent, so no
        collectives). Reduced-rank banks stay single-chip (their
        per-partition basis systems are tiny)."""
        self.setting = setting or LidarGP2DSetting()
        self.dtype = np.dtype(dtype)
        self.mesh = mesh
        self.sensor_frame = LidarFrame2D(self.setting.sensor_frame,
                                         dtype=dtype)
        self.mapping = Mapping(self.setting.mapping)
        self._setup_kernel()
        self._trained = False
        self.bank: Optional[BankState] = None
        self.mapped_distances = None
        self._scan_fit_cache = None
        angles = self.sensor_frame.angles_in_frame
        n = angles.shape[0]
        self.partitions = []
        if n > self.setting.overlap_size and not self.setting.partition_on_hit_rays:
            self.partitions = partition_on_angles(
                n, self.setting.group_size, self.setting.overlap_size,
                self.setting.margin, self.setting.symmetric_partitions, angles)
        self._part_bounds = self._bounds_array()

    def _setup_kernel(self):
        """Resolve the partition-GP kernel; a reduced-rank kernel_type on
        the gp setting threads the RR flag through the whole class — bank
        fit, routed predict, and the variance sign contract (the
        reference's m_reduced_rank_kernel_ on the TestResult,
        src/lidar_gp_2d.cpp:58,148-151)."""
        from erl_gaussian_process_tpu.kernels import (
            resolve_kernel_setting,
            validate_kernel_setting,
        )
        from erl_gaussian_process_tpu.kernels.reduced_rank import (
            ReducedRankBasis,
            ReducedRankSetting,
            parse_reduced_rank_name,
        )
        self._scale = float(self.setting.gp.kernel.scale)
        self._basis = None
        rr_base = parse_reduced_rank_name(self.setting.gp.kernel_type)
        if rr_base is not None:
            validate_kernel_setting(self.setting.gp.kernel,
                                    "LidarGaussianProcess2D.gp")
            ks = self.setting.gp.kernel
            if not isinstance(ks, ReducedRankSetting):
                ks = ReducedRankSetting.from_dict(ks.to_dict())
                self.setting.gp.kernel = ks
            if rr_base:
                ks.base_kernel = rr_base
            # per-field defaulting (mirrors RangeSensorGaussianProcess3D):
            # the boundary gets the frame-derived box whenever the user
            # left it unset (None default, or the wrong length), regardless
            # of num_basis — a shorthand config setting only num_basis must
            # not keep a 1-rad Hilbert box on a ±2.36-rad scan, where rays
            # past the box edge clip to phi≈0/var≈0 and silently pass the
            # validity gate. An EXPLICIT boundary (even [1.0]) survives.
            if ks.boundary is None or len(ks.boundary) != 1:
                # default basis box: angular domain + ~3*scale margin
                # (the Hilbert box must extend past the data by a few
                # length scales or the truncation biases the posterior)
                sf = self.setting.sensor_frame
                halfspan = max(abs(sf.angle_min), abs(sf.angle_max))
                ks.boundary = [float(halfspan + 3.0 * ks.scale)]
            self._basis = ReducedRankBasis(ks, dtype=self.dtype)
            self._kernel = ks.base_kernel
        else:
            self._kernel = resolve_kernel_setting(
                self.setting.gp.kernel_type, self.setting.gp.kernel,
                "LidarGaussianProcess2D.gp")
        self.reduced_rank_kernel = self._basis is not None

    def using_reduced_rank_kernel(self) -> bool:
        return self.reduced_rank_kernel

    def _bounds_array(self):
        if not self.partitions:
            return np.zeros((0, 2), self.dtype)
        return np.asarray([[cl, cr] for (_, _, cl, cr) in self.partitions],
                          self.dtype)

    @property
    def is_trained(self):
        return self._trained

    @property
    def angle_partitions(self):
        return list(self.partitions)

    def _assemble_bank_arrays(self):
        """Per-partition padded training arrays from the stored scan
        (the gather half of reference Train, src/lidar_gp_2d.cpp:366-392)."""
        angles = self.sensor_frame.angles_in_frame
        hit = self.sensor_frame.hit_mask
        cont = self.sensor_frame.continuity_mask
        discon_on = self.setting.sensor_frame.discontinuity_detection
        B = len(self.partitions)
        width = max(ir - il for (il, ir, _, _) in self.partitions)
        xs = np.zeros((B, width, 1), self.dtype)
        ys = np.zeros((B, width, 1), self.dtype)
        vs = np.zeros((B, width), self.dtype)
        ms = np.zeros((B, width), bool)
        for b, (il, ir, _, _) in enumerate(self.partitions):
            sel = np.arange(il, ir)[hit[il:ir]]
            cnt = sel.shape[0]
            xs[b, :cnt, 0] = angles[sel]
            ys[b, :cnt, 0] = self.mapped_distances[sel]
            if discon_on:
                vs[b, :cnt] = np.where(cont[sel],
                                       self.setting.sensor_range_var,
                                       self.setting.discontinuity_var)
            else:
                vs[b, :cnt] = self.setting.sensor_range_var
            ms[b, :cnt] = True
        return xs, ys, vs, ms

    @property
    def gps(self):
        """Per-partition GP views as real VanillaGaussianProcess objects
        (reference `gps` property, pyerl_gaussian_process.pyi:126): each
        carries its partition's train set and the bank row's factor, so
        test()/get_variance work on it standalone. Introspection path —
        the hot routed predict is bank_predict_assigned, not this."""
        from erl_gaussian_process_tpu.models.vanilla_gp import (
            VanillaGaussianProcess,
            VanillaGPState,
            VanillaTrainSet,
        )
        if not self._trained or self.bank is None:
            return []
        xs, ys, vs, ms = self._assemble_bank_arrays()
        L = np.asarray(self.bank.L)
        alpha = np.asarray(self.bank.alpha)
        trained = np.asarray(self.bank.trained)
        out = []
        for b in range(len(self.partitions)):
            g = VanillaGaussianProcess(self.setting.gp, dtype=self.dtype)
            n_b = int(ms[b].sum())
            g._train_set = VanillaTrainSet(xs[b], ys[b], vs[b], n_b)
            g.state = VanillaGPState(
                x=jnp.asarray(xs[b]), mask=jnp.asarray(ms[b]),
                L=jnp.asarray(L[b]), alpha=jnp.asarray(alpha[b]))
            g._trained = bool(trained[b])
            g._n = n_b
            g._x_dim, g._y_dim = 1, 1
            out.append(g)
        return out

    def reset(self):
        """Drop the trained state (reference Reset,
        pyerl_gaussian_process.pyi:135); the sensor frame/settings
        survive, partitions are rebuilt on the next train()."""
        self._trained = False
        self.bank = None
        self.mapped_distances = None
        self._scan_fit_cache = None

    def partition_on_angles(self):
        """(Re)build the angle-partition table from the current frame
        geometry (reference method, pyerl_gaussian_process.pyi:136)."""
        angles = self.sensor_frame.angles_in_frame
        self.partitions = partition_on_angles(
            angles.shape[0], self.setting.group_size,
            self.setting.overlap_size, self.setting.margin,
            self.setting.symmetric_partitions, angles)
        self._part_bounds = self._bounds_array()
        self._scan_fit_cache = None

    def partition_on_hit_rays(self):
        """(Re)build the hit-ray partition table from the current scan
        (reference method, pyerl_gaussian_process.pyi:137)."""
        self.partitions = partition_on_hit_rays(
            self.sensor_frame.hit_ray_indices,
            self.sensor_frame.num_hit_rays,
            self.setting.group_size, self.setting.overlap_size,
            self.sensor_frame.angles_in_frame)
        self._part_bounds = self._bounds_array()
        self._scan_fit_cache = None

    def _build_scan_fit_cache(self) -> dict:
        """GEOMETRY-only device constants for the fused scan train:
        partition index table, angle grid, and the (width-determined)
        Pallas dispatch flag. Rebuilt whenever the partition table changes.
        Setting scalars are deliberately NOT cached — the host-assembled
        path read them live each scan, and a user mutating e.g.
        ``setting.sensor_range_var`` between scans must keep seeing the
        mutation take effect."""
        from erl_gaussian_process_tpu.ops.pallas_bank import (
            pallas_bank_applies,
        )

        c = self._scan_fit_cache
        if c is None:
            B = len(self.partitions)
            width = max(ir - il for (il, ir, _, _) in self.partitions)
            idx = np.zeros((B, width), np.int32)
            inb = np.zeros((B, width), bool)
            for b, (il, ir, _, _) in enumerate(self.partitions):
                w = ir - il
                idx[b, :w] = np.arange(il, ir, dtype=np.int32)
                inb[b, :w] = True
            c = {
                "angles": jnp.asarray(self.sensor_frame.angles_in_frame),
                "idx": jnp.asarray(idx), "inb": jnp.asarray(inb),
                "use_pallas": pallas_bank_applies(self.dtype, width, 1),
            }
            self._scan_fit_cache = c
        return c

    def _train_bank_fused(self) -> BankState:
        """One-dispatch scan train via _scan_train_fused (plain kernels) or
        _scan_train_fused_rr (reduced-rank basis); the per-scan transfer is
        the raw range vector only."""
        c = self._build_scan_fit_cache()
        sf, s = self.setting.sensor_frame, self.setting
        dt = self.dtype.type
        scalars = (dt(sf.valid_range_min), dt(sf.valid_range_max),
                   dt(sf.discontinuity_threshold), dt(s.sensor_range_var),
                   dt(s.discontinuity_var))
        if self._basis is not None:
            b = self._basis
            return _scan_train_fused_rr(
                jnp.asarray(self.sensor_frame.ranges), c["angles"], c["idx"],
                c["inb"], *scalars,
                b._freq, b._sqrt_s, b._origin, b._half, b._inv_sqrt_vol,
                discon_on=s.sensor_frame.discontinuity_detection,
                map_type=s.mapping.type, map_scale=s.mapping.scale)
        return _scan_train_fused(
            jnp.asarray(self.sensor_frame.ranges), c["angles"], c["idx"],
            c["inb"], *scalars,
            self.dtype.type(self._scale), kernel=self._kernel,
            discon_on=s.sensor_frame.discontinuity_detection,
            map_type=s.mapping.type, map_scale=s.mapping.scale,
            use_pallas=c["use_pallas"])

    def train_scan_batch(self, ranges_batch) -> BankState:
        """Offline trajectory replay: train S scans' partition banks in
        ONE dispatch (vmapped gather + one S*B-member batched bank fit) —
        the TPU-throughput mode for processing logged trajectories
        (data/*/train.dat-style replays); the reference can only loop its
        per-scan Train. Requires the static angle-partition table (no
        hit-ray mode / mesh; plain kernels).

        ranges_batch (S, num_rays). Returns a BankState with S*B members,
        scan-major. Use :meth:`use_scan_bank` to point this instance's
        routed predict at one scan's slice, or slice it yourself
        (members ``[s*B:(s+1)*B]``). Does NOT mutate this instance's
        trained state."""
        if (self.setting.partition_on_hit_rays or self._basis is not None
                or self.mesh is not None):
            raise NotImplementedError(
                "train_scan_batch needs the static angle-partition table "
                "with a plain kernel on a single chip")
        rb = np.asarray(ranges_batch, self.dtype)
        if rb.ndim != 2 or rb.shape[1] != self.setting.sensor_frame.num_rays:
            raise ValueError(
                f"ranges_batch must be (S, {self.setting.sensor_frame.num_rays}),"
                f" got {rb.shape}")
        c = self._build_scan_fit_cache()
        sf, s = self.setting.sensor_frame, self.setting
        dt = self.dtype.type
        return _scan_train_batch_fused(
            jnp.asarray(rb), c["angles"], c["idx"], c["inb"],
            dt(sf.valid_range_min), dt(sf.valid_range_max),
            dt(sf.discontinuity_threshold), dt(s.sensor_range_var),
            dt(s.discontinuity_var), dt(self._scale), kernel=self._kernel,
            discon_on=sf.discontinuity_detection, map_type=s.mapping.type,
            map_scale=s.mapping.scale, use_pallas=c["use_pallas"])

    def use_scan_bank(self, stacked: BankState, scan_index: int) -> None:
        """Point this instance's routed predict (test/compute_occ) at one
        scan's slice of a :meth:`train_scan_batch` result. The caller must
        also store that scan via :meth:`train`-style frame state if world
        transforms are needed; frame-coord queries work immediately."""
        B = len(self.partitions)
        sl = slice(scan_index * B, (scan_index + 1) * B)
        self.bank = BankState(
            x=stacked.x[sl], mask=stacked.mask[sl], L=stacked.L[sl],
            alpha=stacked.alpha[sl], trained=stacked.trained[sl],
            L_inv=None if stacked.L_inv is None else stacked.L_inv[sl])
        self._trained = True

    def train(self, rotation, translation, ranges) -> bool:
        """Store the scan, map distances, build the padded partition bank,
        and fit it in one batched call (reference Train,
        src/lidar_gp_2d.cpp:350-396)."""
        self._trained = False
        self.sensor_frame.update_ranges(rotation, translation, ranges)
        if not self.sensor_frame.is_valid():
            return False
        r = self.sensor_frame.ranges
        self.mapped_distances = np.asarray(
            Mapping(self.setting.mapping).map(r), self.dtype)

        if self.setting.partition_on_hit_rays:
            if self.sensor_frame.num_hit_rays == 0:
                return False
            # through the method, not inline: it also invalidates the
            # fused-train cache, so a later switch back to angle
            # partitioning can never fuse against a stale index table
            self.partition_on_hit_rays()

        if not self.partitions:
            # empty partition list (e.g. a scan with too few rays for the
            # group geometry): False + warning, not an exception —
            # reference Train() returns false on untrainable input
            # (src/vanilla_gp.cpp:481-484)
            import logging
            logging.getLogger("erl_gaussian_process_tpu").warning(
                "LidarGaussianProcess2D.train: no partitions for this "
                "scan — nothing to train")
            return False

        if self.mesh is None and not self.setting.partition_on_hit_rays:
            # one-dispatch fused path (plain or reduced-rank): mask +
            # mapping + gather + bank fit in a single jit, one (num_rays,)
            # transfer per scan. Only for the static angle-partition
            # table — hit-ray partitions are data-dependent (rebuilt above
            # each scan), so their index table can't be a cached device
            # constant and the width can change per scan (jit churn).
            self.bank = self._train_bank_fused()
            self._trained = True
            return True

        xs, ys, vs, ms = self._assemble_bank_arrays()
        if self._basis is not None:
            from erl_gaussian_process_tpu.models.batch_gp import bank_fit_rr
            self.bank = bank_fit_rr(
                jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs),
                jnp.asarray(ms), self._basis)
        elif self.mesh is not None:
            from erl_gaussian_process_tpu.parallel.mesh import sharded_bank_fit
            self.bank = sharded_bank_fit(
                self.mesh, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs),
                jnp.asarray(ms), self.dtype.type(self._scale),
                kernel=self._kernel)
        else:
            self.bank = bank_fit(
                jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs),
                jnp.asarray(ms), self.dtype.type(self._scale),
                kernel=self._kernel)
        self._trained = True
        return True

    # -- frame transforms (reference .pyi surface: global_to_local_so2 etc.,
    # python/erl_gaussian_process/pyerl_gaussian_process.pyi:131-134) -------
    def global_to_local_so2(self, dir_global):
        """World direction(s) (n, 2) -> sensor frame (R^T d)."""
        return self.sensor_frame.dir_world_to_frame(dir_global)

    def local_to_global_so2(self, dir_local):
        return np.asarray(dir_local, self.dtype) @ self.sensor_frame.rotation.T

    def global_to_local_se2(self, xy_global):
        p = np.asarray(xy_global, self.dtype) - self.sensor_frame.translation
        return p @ self.sensor_frame.rotation

    def local_to_global_se2(self, xy_local):
        return (np.asarray(xy_local, self.dtype)
                @ self.sensor_frame.rotation.T
                + self.sensor_frame.translation)

    def search_partition(self, angles_local: np.ndarray) -> np.ndarray:
        """First partition whose [coord_left, coord_right] contains each
        angle; -1 when none (vectorized SearchPartition,
        src/lidar_gp_2d.cpp:398-411)."""
        a = np.asarray(angles_local)[:, None]               # (m, 1)
        lo = self._part_bounds[None, :, 0]
        hi = self._part_bounds[None, :, 1]
        ok = (a >= lo) & (a <= hi) & np.isfinite(a)
        idx = np.argmax(ok, axis=1).astype(np.int32)
        idx[~ok.any(axis=1)] = -1
        return idx

    def test(self, angles, angles_are_local: bool, un_map: bool
             ) -> Optional[LidarGP2DTestResult]:
        if not self._trained:
            return None
        return LidarGP2DTestResult(self, angles, angles_are_local, un_map)

    def compute_occ(self, pos_local: np.ndarray):
        """Occupancy test — vectorized version of the reference's
        per-point ComputeOcc (src/lidar_gp_2d.cpp:428-459):
        occ = 2 / (1 + exp(dist·T·(r̂ - map(dist)))) - 1, gated on variance.

        A single point (2,) returns the reference binding's dict
        {success, dist_pos, range_pred, occ} of scalars
        (bind_lidar_gp_2d.cpp:97-108); a batch (n, 2) returns the
        vectorized tuple (valid (n,), dist (n,), range_pred (n,), occ (n,)).
        """
        single = np.asarray(pos_local).ndim == 1
        p = np.atleast_2d(np.asarray(pos_local, self.dtype))
        dist = np.linalg.norm(p, axis=-1)
        ang = np.arctan2(p[:, 1], p[:, 0])
        idx = self.search_partition(ang)
        mean, var, valid = bank_predict_assigned(
            self.bank, ang[:, None], idx,
            self.dtype.type(self._scale), kernel=self._kernel,
            reduced_rank=self.reduced_rank_kernel, basis=self._basis)
        mean = np.asarray(mean[:, 0])
        var = np.asarray(var)
        valid = np.asarray(valid) & (var <= self.setting.max_valid_range_var)
        a = dist * self.setting.occ_test_temperature
        mapped = np.asarray(self.mapping.map(dist))
        # 2/(1+e^z)-1 == -tanh(z/2): saturates instead of overflowing exp
        occ = -np.tanh(0.5 * a * (mean - mapped))
        range_pred = self.mapping.inv_masked(mean, valid)
        if single:
            return {"success": bool(valid[0]), "dist_pos": float(dist[0]),
                    "range_pred": float(range_pred[0]),
                    "occ": float(occ[0])}
        return valid, dist, range_pred, occ

    def get_memory_usage(self) -> int:
        """Bytes held by model arrays (reference GetMemoryUsage
        introspection, SURVEY.md §5.5)."""
        from erl_gaussian_process_tpu.utils.timing import memory_usage
        return memory_usage(self.bank)

    # -- checkpoint ---------------------------------------------------------
    def state_dict(self):
        return {
            "setting": self.setting.to_dict(),
            "trained": self._trained,
            "partitions": np.asarray(
                [[il, ir, cl, cr] for (il, ir, cl, cr) in self.partitions]),
            "sensor_frame": self.sensor_frame.state_dict(),
            "mapped_distances": self.mapped_distances,
            # L_inv is deliberately NOT serialized: it is a fused-fit
            # by-product (an extra (B, n, n) array, ~50% bigger
            # checkpoints) and bank_predict falls back to the triangular
            # solve when it is None — keeping the checkpoint format
            # identical across TPU-fused and XLA fits.
            "bank": None if self.bank is None else {
                k: v for k, v in self.bank._asdict().items()
                if k != "L_inv"},
        }

    def load_state_dict(self, d):
        self.setting = LidarGP2DSetting.from_dict(d["setting"])
        self._setup_kernel()
        self.mapping = Mapping(self.setting.mapping)
        self._trained = bool(d["trained"])
        # the loaded checkpoint's partition table/frame geometry replace
        # this instance's — the fused-train cache must not survive them
        self._scan_fit_cache = None
        self.partitions = [
            (int(il), int(ir), float(cl), float(cr))
            for il, ir, cl, cr in np.asarray(d["partitions"])]
        self._part_bounds = self._bounds_array()
        self.sensor_frame = LidarFrame2D(self.setting.sensor_frame,
                                         dtype=self.dtype)
        self.sensor_frame.load_state_dict(d["sensor_frame"])
        self.mapped_distances = d["mapped_distances"]
        b = d["bank"]
        known = set(BankState._fields)
        self.bank = None if b is None else BankState(
            **{k: (None if v is None else jnp.asarray(v))
               for k, v in b.items() if k in known})

    def save(self, path):
        save_pytree(path, self.state_dict())

    def load(self, path):
        self.load_state_dict(load_pytree(path))

    def __eq__(self, other):
        if not isinstance(other, LidarGaussianProcess2D):
            return NotImplemented
        return eq_state(self.state_dict(), other.state_dict())
