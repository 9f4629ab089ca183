"""3D range-sensor GP: a 2D grid of local 2-input GPs over
(azimuth-row × elevation-col) partitions of a 3D sensor frame
(reference: RangeSensorGaussianProcess3D,
include/erl_gaussian_process/range_sensor_gp_3d.hpp,
src/range_sensor_gp_3d.cpp).

TPU-native redesign: the reference's ``collapse(2)`` OpenMP grid loop
(src/range_sensor_gp_3d.cpp:334-360) becomes one flattened ``bank_fit`` over
all row×col partitions; query routing is a vectorized two-axis interval
search feeding ``bank_predict_assigned``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from erl_gaussian_process_tpu.geometry.frames_3d import (
    create_range_sensor_frame_3d,
    LidarFrame3DSetting,
)
from erl_gaussian_process_tpu.kernels import resolve_kernel_name
from erl_gaussian_process_tpu.models.batch_gp import (
    BankState,
    bank_predict_assigned,
)
from erl_gaussian_process_tpu.models.mapping import Mapping, MappingSetting, MappingType
from erl_gaussian_process_tpu.models.vanilla_gp import VanillaGPSetting
from erl_gaussian_process_tpu.utils.serialization import eq_state


def _grid_partitions(coords: np.ndarray, group_size: int, overlap: int,
                     margin: int):
    """Symmetric 1-axis partitioning used for both row and col axes
    (port of the reference ctor math, src/range_sensor_gp_3d.cpp:199-259)."""
    n = coords.shape[0]
    step = group_size - overlap
    half = overlap // 2
    num_groups = max(1, n // step) + 1
    gs2 = (n - (num_groups - 2) * step) // 2
    parts = [(0, gs2 + half, coords[margin], coords[gs2])]
    for i in range(num_groups - 2):
        il = i * step + gs2 - half
        ir = il + group_size
        parts.append((il, ir, coords[il + half], coords[ir - half]))
    parts.append((n - gs2 - half, n, coords[n - 1 - gs2],
                  coords[n - 1 - margin]))
    return parts


@partial(jax.jit, static_argnames=("kernel", "map_type", "map_scale",
                                   "use_pallas"))
def _scan_train_fused(ranges, fc_flat, idx, inb, vmin, vmax, srv, min_count,
                      scale, *, kernel: str, map_type, map_scale: float,
                      use_pallas: bool):
    """ONE dispatch per 3D scan: hit mask + distance mapping + grid-partition
    gather + flattened bank fit fused in a single jit (the 3D twin of
    lidar_gp_2d._scan_train_fused). The only per-scan transfer is the raw
    (n_az, n_el) range image — the host-assembled path ships four padded
    (B, width) arrays (~5x the bytes at the reference's 271x91 scan, plus
    three extra transfer round-trips).

    Bitwise contract with _assemble_bank_arrays: ``idx[b]`` enumerates the
    (row, col) sub-block's FLAT grid indices in row-major order, and the
    stable argsort on ``~hit`` compacts hit entries to the front in that
    order — exactly numpy's boolean-mask flattening. Groups with at most
    ``min_count`` hits are masked out whole (reference Train skip,
    src/range_sensor_gp_3d.cpp:334-360); per-slot variance is the constant
    sensor_range_var, as in the host path."""
    from erl_gaussian_process_tpu.models.batch_gp import bank_fit_core

    xs, ys, vs, ms = _gather_scan_3d(ranges, fc_flat, idx, inb, vmin, vmax,
                                     srv, min_count, map_type=map_type,
                                     map_scale=map_scale)
    return bank_fit_core(xs, ys, vs, ms, scale, kernel=kernel,
                         use_pallas=use_pallas)


def _gather_scan_3d(ranges, fc_flat, idx, inb, vmin, vmax, srv, min_count,
                    *, map_type, map_scale: float):
    """The traced gather half of the fused 3D scan train (shared by the
    plain and reduced-rank variants)."""
    r = ranges.ravel()
    hit = jnp.isfinite(r) & (r >= vmin) & (r <= vmax)
    mapped = Mapping(MappingSetting(type=map_type, scale=map_scale)).map(r)

    h = hit[idx] & inb                                   # (B, width)
    order = jnp.argsort(~h, axis=1, stable=True)
    sel = jnp.take_along_axis(idx, order, axis=1)
    ms = jnp.take_along_axis(h, order, axis=1)
    ms = ms & (jnp.sum(h, axis=1) > min_count)[:, None]
    xs = jnp.where(ms[..., None], fc_flat[sel], 0)
    ys = jnp.where(ms, mapped[sel], 0)[..., None]
    vs = jnp.full(ms.shape, srv, xs.dtype)
    return xs, ys, vs, ms


@partial(jax.jit, static_argnames=("kernel", "map_type", "map_scale",
                                   "use_pallas"))
def _scan_train_batch_fused(ranges_batch, fc_flat, idx, inb, vmin, vmax,
                            srv, min_count, scale, *, kernel: str, map_type,
                            map_scale: float, use_pallas: bool):
    """Offline trajectory replay: S range images' partition banks in ONE
    dispatch (vmapped gather + one S*B-member batched bank fit) — the 3D
    twin of lidar_gp_2d._scan_train_batch_fused. Returns a BankState with
    S*B members, scan-major."""
    from erl_gaussian_process_tpu.models.batch_gp import bank_fit_core

    def g(r):
        return _gather_scan_3d(r, fc_flat, idx, inb, vmin, vmax, srv,
                               min_count, map_type=map_type,
                               map_scale=map_scale)

    xs, ys, vs, ms = jax.vmap(g)(ranges_batch)
    S, B, w = ms.shape
    return bank_fit_core(xs.reshape(S * B, w, 2), ys.reshape(S * B, w, 1),
                         vs.reshape(S * B, w), ms.reshape(S * B, w), scale,
                         kernel=kernel, use_pallas=use_pallas)


@partial(jax.jit, static_argnames=("map_type", "map_scale"))
def _scan_train_fused_rr(ranges, fc_flat, idx, inb, vmin, vmax, srv,
                         min_count, freq, sqrt_s, origin, half,
                         inv_sqrt_vol, *, map_type, map_scale: float):
    """Reduced-rank variant: the shared 3D gather feeds the per-partition
    Hilbert-basis information systems in the same jit — one range-image
    transfer per scan for RR-configured 3D sensor GPs too."""
    from erl_gaussian_process_tpu.models.batch_gp import bank_fit_rr_core

    xs, ys, vs, ms = _gather_scan_3d(ranges, fc_flat, idx, inb, vmin, vmax,
                                     srv, min_count, map_type=map_type,
                                     map_scale=map_scale)
    return bank_fit_rr_core(xs, ys, vs, ms, freq, sqrt_s, origin, half,
                            inv_sqrt_vol)


@dataclasses.dataclass
class RangeSensorGP3DSetting:
    """Mirror of RangeSensorGaussianProcess3D::Setting (fields from YAML codec
    and test setup, src/range_sensor_gp_3d.cpp:7-50,
    test_range_sensor_gp_3d.cpp:39-56)."""

    row_group_size: int = 12
    row_overlap_size: int = 4
    row_margin: int = 0
    col_group_size: int = 12
    col_overlap_size: int = 4
    col_margin: int = 0
    min_num_samples_per_group: int = 10
    init_variance: float = 1e6
    sensor_range_var: float = 0.01
    max_valid_range_var: float = 0.1
    occ_test_temperature: float = 30.0
    sensor_frame_type: str = "lidar"
    sensor_frame: dict | object = dataclasses.field(
        default_factory=LidarFrame3DSetting)
    gp: VanillaGPSetting = dataclasses.field(
        default_factory=lambda: VanillaGPSetting(kernel_type="ou"))
    mapping: MappingSetting = dataclasses.field(
        default_factory=lambda: MappingSetting(type=MappingType.INVERSE_SQRT))

    def to_dict(self):
        d = dataclasses.asdict(self)
        if hasattr(self.sensor_frame, "to_dict"):
            d["sensor_frame"] = self.sensor_frame.to_dict()
        d["mapping"] = self.mapping.to_dict()
        return d

    @classmethod
    def from_dict(cls, d):
        d = dict(d or {})
        if "gp" in d:
            d["gp"] = VanillaGPSetting.from_dict(d["gp"])
        if "mapping" in d:
            d["mapping"] = MappingSetting.from_dict(d["mapping"])
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


class RangeSensorGP3DTestResult:
    def __init__(self, gp: "RangeSensorGaussianProcess3D",
                 directions: np.ndarray, directions_are_local: bool,
                 un_map: bool):
        d = np.asarray(directions, gp.dtype)
        if d.ndim == 1:
            d = d[None, :]
        if d.shape[0] == 3 and d.shape[1] != 3:
            d = d.T  # accept reference (3, m) layout
        if not directions_are_local:
            d = gp.sensor_frame.dir_world_to_frame(d)
        coords, ok = gp.sensor_frame.compute_frame_coords(d)
        ok = ok & gp.sensor_frame.coords_in_frame(coords)
        idx = gp.search_partition(coords)
        idx = np.where(ok, idx, -1).astype(np.int32)
        mean, var, valid = bank_predict_assigned(
            gp.bank, coords, idx,
            gp.dtype.type(gp._scale), kernel=gp._kernel,
            reduced_rank=gp.reduced_rank_kernel, basis=gp._basis)
        self._gp = gp
        self._mean = np.asarray(mean[:, 0])
        self._var = np.asarray(var)
        self._valid = np.asarray(valid)
        self._un_map = un_map

    @property
    def num_test(self):
        return self._mean.shape[0]

    def get_mean(self, parallel: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        del parallel
        f = self._mean
        if self._un_map:
            f = Mapping(self._gp.setting.mapping).inv_masked(f, self._valid)
        return f, self._valid.copy()

    def get_variance(self, parallel: bool = True):
        del parallel
        var = np.where(self._valid, self._var, self._gp.setting.init_variance)
        return var, self._valid.copy()


class RangeSensorGaussianProcess3D:
    Setting = RangeSensorGP3DSetting
    TestResult = RangeSensorGP3DTestResult

    def __init__(self, setting: Optional[RangeSensorGP3DSetting] = None,
                 dtype=np.float64, mesh=None):
        """``mesh``: optional ``jax.sharding.Mesh`` — the flattened
        row×col partition bank is fitted with the bank axis sharded over
        the mesh (parallel/mesh.sharded_bank_fit). Reduced-rank banks stay
        single-chip (tiny per-partition basis systems)."""
        self.setting = setting or RangeSensorGP3DSetting()
        self.mesh = mesh
        assert self.setting.row_overlap_size % 2 == 0
        assert self.setting.col_overlap_size % 2 == 0
        self.dtype = np.dtype(dtype)
        self.sensor_frame = create_range_sensor_frame_3d(
            self.setting.sensor_frame_type, self.setting.sensor_frame,
            dtype=dtype)
        self.mapping = Mapping(self.setting.mapping)
        self._setup_kernel()
        fc = self.sensor_frame.frame_coords()
        self.row_partitions = _grid_partitions(
            fc[:, 0, 0], self.setting.row_group_size,
            self.setting.row_overlap_size, self.setting.row_margin)
        self.col_partitions = _grid_partitions(
            fc[0, :, 1], self.setting.col_group_size,
            self.setting.col_overlap_size, self.setting.col_margin)
        self._row_bounds = np.asarray(
            [[cl, cr] for (_, _, cl, cr) in self.row_partitions], self.dtype)
        self._col_bounds = np.asarray(
            [[cl, cr] for (_, _, cl, cr) in self.col_partitions], self.dtype)
        self._trained = False
        self.bank: Optional[BankState] = None
        self.mapped_distances = None
        self._scan_fit_cache = None

    def _setup_kernel(self):
        """Resolve the partition-GP kernel; reduced-rank kernel types
        thread the RR flag through bank fit / routed predict / variance
        sign, mirroring the reference's m_reduced_rank_kernel_ on this
        class's TestResult (src/range_sensor_gp_3d.cpp:71,160)."""
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
                                    "RangeSensorGaussianProcess3D.gp")
            ks = self.setting.gp.kernel
            if not isinstance(ks, ReducedRankSetting):
                ks = ReducedRankSetting.from_dict(ks.to_dict())
                self.setting.gp.kernel = ks
            if rr_base:
                ks.base_kernel = rr_base
            # per-field defaulting: only fields the user left unset (None
            # default, or the wrong length for 2D frame coords) get the
            # frame-derived box — an explicit boundary/coord_origin (even
            # [1.0, 1.0]) must survive a shorthand num_basis=[24]
            if len(ks.num_basis) != 2:
                nb = ks.num_basis[0] if ks.num_basis else 16
                ks.num_basis = [nb, nb]
            if ks.boundary is None or len(ks.boundary) != 2:
                # default basis box: (az, el) frame-coord domain + ~3*scale
                # margin per dim (Hilbert box truncation bias otherwise)
                fc = self.sensor_frame.frame_coords()
                ks.boundary = [
                    float(np.abs(fc[..., k]).max() + 3.0 * ks.scale)
                    for k in range(2)]
            if len(ks.coord_origin) != 2 or list(ks.coord_origin) == [0.0]:
                ks.coord_origin = [0.0, 0.0]
            self._basis = ReducedRankBasis(ks, dtype=self.dtype)
            self._kernel = ks.base_kernel
        else:
            self._kernel = resolve_kernel_setting(
                self.setting.gp.kernel_type, self.setting.gp.kernel,
                "RangeSensorGaussianProcess3D.gp")
        self.reduced_rank_kernel = self._basis is not None

    def using_reduced_rank_kernel(self) -> bool:
        return self.reduced_rank_kernel

    @property
    def is_trained(self):
        return self._trained

    @property
    def num_partitions(self):
        return len(self.row_partitions), len(self.col_partitions)

    @property
    def range_sensor_frame(self):
        """Reference `range_sensor_frame` property
        (pyerl_gaussian_process.pyi:283)."""
        return self.sensor_frame

    @property
    def gps(self):
        """Row-major grid of per-partition GP views as real
        VanillaGaussianProcess objects (reference `gps` property,
        pyerl_gaussian_process.pyi:277, list[list]). Introspection path —
        the hot routed predict is bank_predict_assigned."""
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
        R, C = self.num_partitions
        grid = []
        for i in range(R):
            row = []
            for j in range(C):
                b = i * C + j
                g = VanillaGaussianProcess(self.setting.gp,
                                           dtype=self.dtype)
                n_b = int(ms[b].sum())
                g._train_set = VanillaTrainSet(xs[b], ys[b], vs[b], n_b)
                g.state = VanillaGPState(
                    x=jnp.asarray(xs[b]), mask=jnp.asarray(ms[b]),
                    L=jnp.asarray(L[b]), alpha=jnp.asarray(alpha[b]))
                g._trained = bool(trained[b])
                g._n = n_b
                g._x_dim, g._y_dim = 2, 1
                row.append(g)
            grid.append(row)
        return grid

    def reset(self):
        """Drop the trained state (reference Reset,
        pyerl_gaussian_process.pyi:291); frame/settings/partition tables
        survive."""
        self._trained = False
        self.bank = None
        self.mapped_distances = None

    # -- frame transforms (reference .pyi surface,
    # pyerl_gaussian_process.pyi:286-290) ----------------------------------
    def global_to_local_so3(self, dir_global):
        """World direction(s) (n, 3) -> sensor frame (R^T d per row)."""
        return self.sensor_frame.dir_world_to_frame(dir_global)

    def local_to_global_so3(self, dir_local):
        return (np.asarray(dir_local, self.dtype)
                @ self.sensor_frame.rotation.T)

    def global_to_local_se3(self, xyz_global):
        p = (np.asarray(xyz_global, self.dtype)
             - self.sensor_frame.translation)
        return p @ self.sensor_frame.rotation

    def local_to_global_se3(self, xyz_local):
        return (np.asarray(xyz_local, self.dtype)
                @ self.sensor_frame.rotation.T
                + self.sensor_frame.translation)

    def compute_frame_coords(self, dirs_local):
        """(azimuth, elevation)-style frame coords for local directions
        (delegates to the frame; reference pyi:290)."""
        coords, _ = self.sensor_frame.compute_frame_coords(dirs_local)
        return coords

    def store_data(self, rotation, translation, ranges) -> bool:
        """Store a scan (pose + ranges + mapped distances) WITHOUT
        training (reference StoreData, pyerl_gaussian_process.pyi:292;
        Train = StoreData + fit)."""
        self.sensor_frame.update_ranges(rotation, translation, ranges)
        if not self.sensor_frame.is_valid():
            return False
        self.mapped_distances = np.asarray(
            Mapping(self.setting.mapping).map(self.sensor_frame.ranges),
            self.dtype)
        return True

    def _assemble_bank_arrays(self):
        """Per-(row,col)-partition padded training arrays from the stored
        scan (the gather half of reference Train,
        src/range_sensor_gp_3d.cpp:334-360)."""
        fc = self.sensor_frame.frame_coords()
        hit = self.sensor_frame.hit_mask
        R, C = self.num_partitions
        width = (max(ir - il for (il, ir, _, _) in self.row_partitions)
                 * max(ir - il for (il, ir, _, _) in self.col_partitions))
        B = R * C
        xs = np.zeros((B, width, 2), self.dtype)
        ys = np.zeros((B, width, 1), self.dtype)
        vs = np.full((B, width), self.setting.sensor_range_var, self.dtype)
        ms = np.zeros((B, width), bool)
        for i, (ril, rir, _, _) in enumerate(self.row_partitions):
            for j, (cil, cir, _, _) in enumerate(self.col_partitions):
                b = i * C + j
                sub_hit = hit[ril:rir, cil:cir]
                cnt = int(sub_hit.sum())
                if cnt <= self.setting.min_num_samples_per_group:
                    continue
                sub_fc = fc[ril:rir, cil:cir][sub_hit]
                sub_y = self.mapped_distances[ril:rir, cil:cir][sub_hit]
                xs[b, :cnt] = sub_fc
                ys[b, :cnt, 0] = sub_y
                ms[b, :cnt] = True
        return xs, ys, vs, ms

    def _build_scan_fit_cache(self) -> dict:
        """GEOMETRY-only device constants for the fused scan train:
        flat-index partition table + frame coords (the partition grid
        never changes after the ctor) and the (width-determined) Pallas
        dispatch flag. Setting scalars are NOT cached — the host path read
        them live each scan, and mutations between scans must keep taking
        effect."""
        from erl_gaussian_process_tpu.ops.pallas_bank import (
            pallas_bank_applies,
        )

        c = self._scan_fit_cache
        if c is None:
            fc = self.sensor_frame.frame_coords()
            H, W = fc.shape[0], fc.shape[1]
            R, C = self.num_partitions
            rw = max(ir - il for (il, ir, _, _) in self.row_partitions)
            cw = max(ir - il for (il, ir, _, _) in self.col_partitions)
            width = rw * cw
            B = R * C
            idx = np.zeros((B, width), np.int32)
            inb = np.zeros((B, width), bool)
            for i, (ril, rir, _, _) in enumerate(self.row_partitions):
                for j, (cil, cir, _, _) in enumerate(self.col_partitions):
                    b = i * C + j
                    rr, cc = np.meshgrid(np.arange(ril, rir),
                                         np.arange(cil, cir), indexing="ij")
                    flat = (rr * W + cc).ravel()  # row-major, as numpy's
                    idx[b, :flat.size] = flat     # boolean-mask flattening
                    inb[b, :flat.size] = True
            c = {
                "fc_flat": jnp.asarray(fc.reshape(-1, 2)),
                "idx": jnp.asarray(idx), "inb": jnp.asarray(inb),
                "use_pallas": pallas_bank_applies(self.dtype, width, 2),
            }
            self._scan_fit_cache = c
        return c

    def _train_bank_fused(self) -> BankState:
        """One-dispatch scan train via _scan_train_fused (plain kernels) or
        _scan_train_fused_rr (reduced-rank basis); the per-scan transfer is
        the raw range image only."""
        c = self._build_scan_fit_cache()
        sf, s = self.sensor_frame.setting, self.setting
        dt = self.dtype.type
        scalars = (dt(sf.valid_range_min), dt(sf.valid_range_max),
                   dt(s.sensor_range_var),
                   jnp.int32(s.min_num_samples_per_group))
        if self._basis is not None:
            b = self._basis
            return _scan_train_fused_rr(
                jnp.asarray(self.sensor_frame.ranges), c["fc_flat"],
                c["idx"], c["inb"], *scalars,
                b._freq, b._sqrt_s, b._origin, b._half,
                b._inv_sqrt_vol, map_type=s.mapping.type,
                map_scale=s.mapping.scale)
        return _scan_train_fused(
            jnp.asarray(self.sensor_frame.ranges), c["fc_flat"], c["idx"],
            c["inb"], *scalars,
            self.dtype.type(self._scale), kernel=self._kernel,
            map_type=s.mapping.type, map_scale=s.mapping.scale,
            use_pallas=c["use_pallas"])

    def train_scan_batch(self, ranges_batch) -> BankState:
        """Offline trajectory replay: train S range images' partition
        banks in ONE dispatch (the 3D twin of
        LidarGaussianProcess2D.train_scan_batch). Requires plain kernels
        on a single chip. ranges_batch (S, n_az, n_el) — or (S, H, W) for
        a depth frame. Returns a BankState with S*B members, scan-major;
        use :meth:`use_scan_bank` to route queries at one scan's slice.
        Does NOT mutate this instance's trained state."""
        if self._basis is not None or self.mesh is not None:
            raise NotImplementedError(
                "train_scan_batch needs plain kernels on a single chip")
        rb = np.asarray(ranges_batch, self.dtype)
        fc = self.sensor_frame.frame_coords()
        if rb.ndim != 3 or rb.shape[1:] != fc.shape[:2]:
            raise ValueError(
                f"ranges_batch must be (S, {fc.shape[0]}, {fc.shape[1]}), "
                f"got {rb.shape}")
        c = self._build_scan_fit_cache()
        sf, s = self.sensor_frame.setting, self.setting
        dt = self.dtype.type
        return _scan_train_batch_fused(
            jnp.asarray(rb), c["fc_flat"], c["idx"], c["inb"],
            dt(sf.valid_range_min), dt(sf.valid_range_max),
            dt(s.sensor_range_var), jnp.int32(s.min_num_samples_per_group),
            self.dtype.type(self._scale), kernel=self._kernel,
            map_type=s.mapping.type, map_scale=s.mapping.scale,
            use_pallas=c["use_pallas"])

    def use_scan_bank(self, stacked: BankState, scan_index: int) -> None:
        """Point this instance's routed predict at one scan's slice of a
        :meth:`train_scan_batch` result."""
        R, C = self.num_partitions
        B = R * C
        sl = slice(scan_index * B, (scan_index + 1) * B)
        self.bank = BankState(
            x=stacked.x[sl], mask=stacked.mask[sl], L=stacked.L[sl],
            alpha=stacked.alpha[sl], trained=stacked.trained[sl],
            L_inv=None if stacked.L_inv is None else stacked.L_inv[sl])
        self._trained = True

    def train(self, rotation, translation, ranges) -> bool:
        """One scan → one flattened padded bank fit
        (reference Train, src/range_sensor_gp_3d.cpp:321-364)."""
        self._trained = False
        if not self.store_data(rotation, translation, ranges):
            return False
        if self.mesh is None:
            # one-dispatch fused path (plain or reduced-rank) — the
            # partition grid is static (built once from frame geometry in
            # the ctor), so its index table is a cached device constant
            # and the per-scan transfer is the raw range image only
            self.bank = self._train_bank_fused()
            self._trained = True
            return True
        # mesh path: host-assembled arrays feed the bank-sharded fit
        xs, ys, vs, ms = self._assemble_bank_arrays()
        if self._basis is not None:
            from erl_gaussian_process_tpu.models.batch_gp import bank_fit_rr
            self.bank = bank_fit_rr(
                jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs),
                jnp.asarray(ms), self._basis)
        else:
            from erl_gaussian_process_tpu.parallel.mesh import sharded_bank_fit
            self.bank = sharded_bank_fit(
                self.mesh, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(vs),
                jnp.asarray(ms), self.dtype.type(self._scale),
                kernel=self._kernel)
        self._trained = True
        return True

    def search_partition(self, coords: np.ndarray) -> np.ndarray:
        """coords (m, 2) → flat bank index i*C + j; -1 when unresolved.
        Row interval is [left, right), col interval is [left, right]
        (reference SearchPartition, src/range_sensor_gp_3d.cpp:366-393)."""
        rc = coords[:, 0][:, None]
        cc = coords[:, 1][:, None]
        rok = (rc >= self._row_bounds[None, :, 0]) & (rc < self._row_bounds[None, :, 1])
        cok = (cc >= self._col_bounds[None, :, 0]) & (cc <= self._col_bounds[None, :, 1])
        ri = np.argmax(rok, axis=1)
        ci = np.argmax(cok, axis=1)
        ok = rok.any(axis=1) & cok.any(axis=1)
        idx = (ri * len(self.col_partitions) + ci).astype(np.int32)
        idx[~ok] = -1
        return idx

    def test(self, directions, directions_are_local: bool, un_map: bool
             ) -> Optional[RangeSensorGP3DTestResult]:
        if not self._trained:
            return None
        return RangeSensorGP3DTestResult(self, directions,
                                         directions_are_local, un_map)

    def compute_occ(self, pos_local: np.ndarray):
        """Vectorized ComputeOcc (reference src/range_sensor_gp_3d.cpp:409-439).
        pos_local (n, 3) returns (valid, dist, range_pred, occ); a single
        point (3,) returns the reference binding's dict {success,
        dist_pos, range_pred, occ} of scalars
        (bind_range_sensor_gp_3d.cpp:115-126)."""
        single = np.asarray(pos_local).ndim == 1
        p = np.atleast_2d(np.asarray(pos_local, self.dtype))
        dist = np.linalg.norm(p, axis=-1)
        dirs = p / np.where(dist > 0, dist, 1.0)[:, None]
        coords, ok = self.sensor_frame.compute_frame_coords(dirs)
        ok = ok & self.sensor_frame.coords_in_frame(coords)
        idx = np.where(ok, self.search_partition(coords), -1).astype(np.int32)
        mean, var, valid = bank_predict_assigned(
            self.bank, coords, idx,
            self.dtype.type(self._scale), kernel=self._kernel,
            reduced_rank=self.reduced_rank_kernel, basis=self._basis)
        mean = np.asarray(mean[:, 0])
        var = np.asarray(var)
        valid = np.asarray(valid) & (var <= self.setting.max_valid_range_var)
        a = dist * self.setting.occ_test_temperature
        mapped = np.asarray(self.mapping.map(dist))
        # 2/(1+e^z)-1 == -tanh(z/2): saturates instead of overflowing exp
        occ = -np.tanh(0.5 * a * (mean - mapped))
        range_pred = np.asarray(self.mapping.inv(mean))
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

    # -- checkpoint (reference Write/Read; serialization round-trip is part
    # of the reference's test pattern, test_range_sensor_gp_3d.cpp) --------
    def state_dict(self):
        return {
            "setting": self.setting.to_dict(),
            "trained": self._trained,
            "sensor_frame": self.sensor_frame.state_dict(),
            "mapped_distances": self.mapped_distances,
            # L_inv excluded: fused-fit by-product, recomputed fallback-free
            # at predict time (see models/lidar_gp_2d.state_dict)
            "bank": None if self.bank is None else {
                k: v for k, v in self.bank._asdict().items()
                if k != "L_inv"},
        }

    def load_state_dict(self, d):
        self.__init__(RangeSensorGP3DSetting.from_dict(d["setting"]),
                      dtype=self.dtype, mesh=getattr(self, "mesh", None))
        self._trained = bool(d["trained"])
        self.sensor_frame.load_state_dict(d["sensor_frame"])
        self.mapped_distances = d["mapped_distances"]
        b = d["bank"]
        known = set(BankState._fields)
        self.bank = None if b is None else BankState(
            **{k: (None if v is None else jnp.asarray(v))
               for k, v in b.items() if k in known})

    def save(self, path):
        from erl_gaussian_process_tpu.utils.serialization import save_pytree
        save_pytree(path, self.state_dict())

    def load(self, path):
        from erl_gaussian_process_tpu.utils.serialization import load_pytree
        self.load_state_dict(load_pytree(path))

    def __eq__(self, other):
        if not isinstance(other, RangeSensorGaussianProcess3D):
            return NotImplemented
        return eq_state(self.state_dict(), other.state_dict())
