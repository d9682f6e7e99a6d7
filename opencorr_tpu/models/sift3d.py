"""3D SIFT driver (reference API: ``SIFT3D``, oc_sift.h:135).

Orchestrates the device kernels in ops/sift3d.py: builds the Gaussian/DoG
pyramids on device, extracts extrema, batches orientation assignment and
descriptor construction per (octave, layer) group with padded fixed-size
chunks, and matches descriptors with a device matmul + the reference's
many-to-one elimination (monodirectionalMatch, oc_sift.cpp:1251-1418).
"""

from __future__ import annotations

import dataclasses
import math
import os
import sys
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import base
from ..ops import sift3d as ops3d
from ..utils.precision import highest_precision


@dataclasses.dataclass
class Sift3dConfig:
    """Defaults per oc_sift.cpp:142-159."""

    n_octave_layers: int = 3
    n_octave: int = 0  # derived in createGaussianPyramid
    min_dimension: int = 8
    alpha: float = 0.1
    beta: float = 0.9
    gamma: float = 0.4
    sigma_source: float = 1.15
    sigma_base: float = 1.6
    gradient_threshold: float = 1e-10
    truncate_threshold: float = 0.2 * 128 / 768


@dataclasses.dataclass
class _Layer:
    vol: jnp.ndarray
    dims: tuple
    units: tuple
    octave: int
    scale: float
    sigma: float = 0.0
    max_abs: float = 0.0


class SIFT3D:
    """pyramid_backend: "host" builds the Gaussian/DoG pyramids with
    numpy/scipy (numerically identical separable mirror-extension blur);
    "device" uses the jitted whole-volume ops in ops/sift3d.py.  The host
    default avoids one jit compilation per pyramid-layer shape; orientation,
    descriptors and matching always run on device."""

    def __init__(self, kp_chunk_budget_bytes: int = 1 << 30,
                 pyramid_backend: str = "host", match_mode: str = "mono",
                 hist_bf16: bool = False):
        self.pyramid_backend = pyramid_backend
        # "mono": monodirectional with many-to-one elimination (reference
        # default); "bi": strict bidirectional check (oc_sift.cpp:1420-1489)
        self.match_mode = match_mode
        # bf16 histogram-contraction operands (~2x MXU rate): explicit
        # opt-in — the reference's descriptors are f32 (advisor round 4)
        self.hist_bf16 = bool(hist_bf16)
        self.sift_config = Sift3dConfig()
        self.matching_ratio = 0.85  # oc_sift.cpp:153
        self.physical_unit = (1.0, 1.0, 1.0)
        self.ref_img = None
        self.tar_img = None
        self.ref_matched_kp: Optional[np.ndarray] = None  # [K, 3] (x, y, z)
        self.tar_matched_kp: Optional[np.ndarray] = None
        self.kp_chunk_budget = int(kp_chunk_budget_bytes)
        self.verbose = os.environ.get("OPENCORR_SIFT3D_PROGRESS") == "1"

    def _progress(self, msg: str) -> None:
        if self.verbose:
            print(f"[sift3d] {msg}", file=sys.stderr, flush=True)

    def set_sift_config(self, cfg: Sift3dConfig):
        self.sift_config = cfg

    def set_physical_unit(self, ux: float, uy: float, uz: float):
        self.physical_unit = (float(ux), float(uy), float(uz))

    def set_matching_ratio(self, ratio: float):
        self.matching_ratio = float(ratio)

    def set_images(self, ref_img, tar_img):
        self.ref_img = ref_img
        self.tar_img = tar_img

    def prepare(self):
        pass

    def clear(self):
        self.ref_matched_kp = None
        self.tar_matched_kp = None

    # ------------------------------------------------------------------
    def _plan_layers(self, vol_shape) -> List[_Layer]:
        """Layer schedule (dims/units/scale/sigma) of createGaussianPyramid
        (oc_sift.cpp:676-754) without materializing any volume."""
        cfg = self.sift_config
        dz, dy, dx = vol_shape
        dim_min = min(dx, dy, dz)
        cfg.n_octave = max(
            int(math.floor(math.log2(dim_min) - math.log2(cfg.min_dimension))) + 1,
            1)
        lpo = cfg.n_octave_layers + 3
        kappa = 2.0 ** (1.0 / cfg.n_octave_layers)

        layers: List[_Layer] = []
        x_len, y_len, z_len = dx, dy, dz
        ux, uy, uz = self.physical_unit
        scale0 = cfg.sigma_base / kappa
        sigma0 = math.sqrt(max(scale0 * scale0 - cfg.sigma_source**2, 0.0))
        layers.append(_Layer(None, (z_len, y_len, x_len), (ux, uy, uz), 0,
                             scale0, sigma0))
        for i in range(1, cfg.n_octave * lpo):
            octave = i // lpo
            lin = i % lpo
            if lin == 0:
                x_len //= 2
                y_len //= 2
                z_len //= 2
                ux *= 2
                uy *= 2
                uz *= 2
                scale = layers[(octave - 1) * lpo + cfg.n_octave_layers].scale
                sigma = 0.0
            else:
                scale = kappa * layers[i - 1].scale
                # NOTE: indexes the FIRST octave's layer (oc_sift.cpp:728)
                sigma = math.sqrt(kappa * kappa - 1.0) * layers[lin - 1].scale
            layers.append(_Layer(None, (z_len, y_len, x_len), (ux, uy, uz),
                                 octave, scale, sigma))
        return layers

    def _gaussian_pyramid(self, vol: jnp.ndarray) -> List[_Layer]:
        """createGaussianPyramid (oc_sift.cpp:676-754)."""
        cfg = self.sift_config
        layers = self._plan_layers(vol.shape)
        lpo = cfg.n_octave_layers + 3

        if self.pyramid_backend == "host":
            blur = _host_gaussian_blur
            vol0 = np.asarray(vol)
        else:
            blur = ops3d.gaussian_blur
            vol0 = vol
        layers[0].vol = blur(vol0, layers[0].sigma, layers[0].units)
        for i in range(1, len(layers)):
            if i % lpo == 0:
                dz_, dy_, dx_ = layers[i].dims
                layers[i].vol = layers[i - 3].vol[: 2 * dz_ : 2,
                                                  : 2 * dy_ : 2, : 2 * dx_ : 2]
            else:
                layers[i].vol = blur(layers[i - 1].vol, layers[i].sigma,
                                     layers[i].units)
        return layers

    def _dog_pyramid(self, gp: List[_Layer]) -> List[_Layer]:
        cfg = self.sift_config
        lpo_g = cfg.n_octave_layers + 3
        lpo_d = cfg.n_octave_layers + 2
        dogs: List[_Layer] = []
        for m in range(cfg.n_octave):
            for n in range(lpo_d):
                g = gp[m * lpo_g + n]
                if self.pyramid_backend == "host":
                    d = np.asarray(gp[m * lpo_g + n + 1].vol) - np.asarray(g.vol)
                    max_abs = float(np.max(np.abs(d)))
                else:
                    d, max_abs = ops3d.dog_layer(gp[m * lpo_g + n + 1].vol,
                                                 g.vol)
                lay = _Layer(d, g.dims, g.units, m, g.scale)
                lay.max_abs = max_abs
                dogs.append(lay)
        return dogs

    def _extract(self, vol: jnp.ndarray):
        """Full single-volume feature extraction. Returns
        (kp [K, 6] (x, y, z, octave, layer, scale), descriptors [K, 768])."""
        cfg = self.sift_config
        gp = self._gaussian_pyramid(vol)
        dogs = self._dog_pyramid(gp)
        lpo_g = cfg.n_octave_layers + 3
        lpo_d = cfg.n_octave_layers + 2

        kps = []  # (x, y, z, octave, layer)
        for m in range(cfg.n_octave):
            for n in range(1, cfg.n_octave_layers + 1):
                li = m * lpo_d + n
                if self.pyramid_backend == "host":
                    mask = _host_extrema_mask(
                        dogs[li - 1].vol, dogs[li].vol, dogs[li + 1].vol,
                        cfg.alpha * dogs[li].max_abs)
                else:
                    mask = ops3d.extrema_mask(
                        dogs[li - 1].vol, dogs[li].vol, dogs[li + 1].vol,
                        cfg.alpha * dogs[li].max_abs)
                zz, yy, xx = np.nonzero(np.asarray(mask))
                if len(zz):
                    kps.append(np.stack(
                        [xx, yy, zz,
                         np.full_like(xx, m), np.full_like(xx, n)], axis=1))
        if not kps:
            return np.zeros((0, 6), np.float32), np.zeros((0, 768), np.float32)
        kp = np.concatenate(kps, axis=0).astype(np.int32)

        # orientation + descriptors per (octave, layer) group
        out_kp = []
        out_desc = []
        for m in range(cfg.n_octave):
            for n in range(1, cfg.n_octave_layers + 1):
                sel = (kp[:, 3] == m) & (kp[:, 4] == n)
                if not sel.any():
                    continue
                g = gp[m * lpo_g + n]
                grp = kp[sel]
                scale = g.scale
                units = np.array(g.units, np.float32)
                vol_np = np.asarray(g.vol)
                # voxel-space radii are octave-independent (scale and pitch
                # both double per octave); +1 margin for the gradient stencil,
                # rounded up to a bucket of 8 so the kernels compile once per
                # bucket (masks make the extra margin inert).  Windows larger
                # than the layer are clamped: the reference instead clips its
                # scan loops at the image border, which the absolute-coordinate
                # masks reproduce for all but the (rare) region outside the
                # clamped window on small layers.
                r_cap = (min(g.dims) - 1) // 2
                r_orient = min(_bucket8(
                    int(math.ceil(3.0 * 1.5 * scale / g.units[0])) + 1), r_cap)
                sphere = 2.0 * 5.0 * math.sqrt(2.0) * scale
                r_desc = min(
                    _bucket8(int(math.ceil(sphere / g.units[0])) + 1), r_cap)

                rot, ok = _run_chunked(
                    ops3d.assign_orientation, vol_np, grp, r_orient,
                    self.kp_chunk_budget,
                    extra=(jnp.float32(scale), jnp.asarray(units),
                           jnp.float32(cfg.gradient_threshold),
                           jnp.float32(cfg.beta), jnp.float32(cfg.gamma)),
                )
                okn = np.asarray(ok)
                grp = grp[okn]
                rotn = np.asarray(rot)[okn]
                if not len(grp):
                    continue
                desc = _run_chunked(
                    ops3d.construct_descriptor, vol_np, grp, r_desc,
                    self.kp_chunk_budget,
                    extra=(jnp.float32(scale), jnp.asarray(units),
                           jnp.float32(cfg.truncate_threshold)),
                    rot=rotn,
                )
                scale_factor = 2.0 ** m
                coor_img = grp[:, :3].astype(np.float32) * scale_factor
                rec = np.concatenate(
                    [coor_img,
                     grp[:, 3:5].astype(np.float32),
                     np.full((len(grp), 1), scale, np.float32)], axis=1)
                out_kp.append(rec)
                out_desc.append(np.asarray(desc))

        if not out_kp:
            return np.zeros((0, 6), np.float32), np.zeros((0, 768), np.float32)
        return np.concatenate(out_kp, 0), np.concatenate(out_desc, 0)

    # ------------------------------------------------------------------
    def _extract_device(self, vol: jnp.ndarray):
        """Fully-device feature extraction: extrema compaction, orientation,
        descriptors and the final table assembly all stay on the accelerator
        with static per-layer keypoint caps.  Returns DEVICE arrays
        (kp [k_cap, 6], desc [k_cap, 768], ok [k_cap]) — nothing crosses to
        the host here (the host path instead syncs np.nonzero and gathers
        windows per layer — fine for small volumes, prohibitive at CT
        scale)."""
        cfg = self.sift_config
        layers = self._plan_layers(vol.shape)
        lpo_g = cfg.n_octave_layers + 3

        # Octave-streamed: only ONE octave's Gaussian + DoG stack is live in
        # HBM at a time (at CT scale the full pyramid is ~8 GB and queuing
        # every octave's programs asynchronously crashed the v5e worker).
        # block_until_ready per octave is safe — it is not a device->host
        # transfer (CLAUDE.md) — and lets buffers free before the next
        # octave's programs run.
        alpha = jnp.float32(cfg.alpha)
        grad_thr = jnp.float32(cfg.gradient_threshold)
        beta = jnp.float32(cfg.beta)
        gamma = jnp.float32(cfg.gamma)
        trunc = jnp.float32(cfg.truncate_threshold)

        staged = []  # (x, y, z, ok, desc, octave, layer, scale) device entries
        seed = vol
        for m in range(cfg.n_octave):
            base = m * lpo_g
            # an octave's ENTIRE feature path (downsample + blur chain + DoGs
            # + extrema + orientation + descriptors) is ONE program
            # (ops/sift3d.octave_features): the per-stage chain was ~30
            # dispatches per octave, and a degraded tunnel session pays
            # 10-40 ms per dispatch while the device compute for the full
            # Torus extraction is ~0.1 s
            if m == 0:
                sigmas = tuple(layers[base + n].sigma for n in range(lpo_g))
                down = None
            else:
                sigmas = (None,) + tuple(
                    layers[base + n].sigma for n in range(1, lpo_g))
                down = layers[base].dims

            lp = []
            for n in range(1, cfg.n_octave_layers + 1):
                g = layers[base + n]
                voxels = int(np.prod(g.dims))
                k_e = int(np.clip(voxels // 1024, 256, 65536))
                k_e = 1 << (k_e - 1).bit_length()  # pow2: lax.map chunking
                scale = g.scale
                r_cap = (min(g.dims) - 1) // 2
                r_orient = min(_bucket8(
                    int(math.ceil(3.0 * 1.5 * scale / g.units[0])) + 1), r_cap)
                sphere = 2.0 * 5.0 * math.sqrt(2.0) * scale
                r_desc = min(
                    _bucket8(int(math.ceil(sphere / g.units[0])) + 1), r_cap)
                chunk_o = ops3d._pow2_chunk(k_e, 2 * r_orient + 1)
                k_d = max(k_e // 2, 256)
                chunk_d = ops3d._pow2_chunk(k_d, 2 * r_desc + 1)
                lp.append((n, k_e, r_orient, chunk_o, k_d, r_desc, chunk_d,
                           scale))

            seed, outs = ops3d.octave_features(
                seed, alpha, grad_thr, beta, gamma, trunc,
                sigmas=sigmas, unit_xyz=layers[base].units,
                downsample_to=down, layer_params=tuple(lp),
                seed_layer=cfg.n_octave_layers, hist_bf16=self.hist_bf16)
            for (n, *_rest), (xd, yd, zd, okd, desc) in zip(lp, outs):
                staged.append((xd, yd, zd, okd, desc, m, n,
                               layers[base + n].scale))

            # drain this octave before dispatching the next one's program
            # (bounds live HBM across octaves; block != transfer)
            jax.block_until_ready([(s[3], s[4]) for s in
                                   staged[-cfg.n_octave_layers:]])
            self._progress(f"octave {m} done ({layers[base].dims})")

        # merge all layers into one fixed-size device table (NO host syncs:
        # the per-layer np.asarray loop used here previously moved ~2 GB of
        # descriptors through the tunnel in ~100 transfers and crashed the
        # worker at CT scale)
        k_tot = sum(s[3].shape[0] for s in staged)
        k_cap = min(1 << (k_tot - 1).bit_length(), 65536)
        kp, desc, ok = ops3d.assemble_keypoints(
            tuple(s[0] for s in staged), tuple(s[1] for s in staged),
            tuple(s[2] for s in staged), tuple(s[3] for s in staged),
            tuple(s[4] for s in staged),
            tuple(jnp.asarray(np.array(
                [2.0 ** s[5], s[5], s[6], s[7]], np.float32))
                for s in staged),
            k_cap=k_cap)
        return kp, desc, ok

    # ------------------------------------------------------------------
    def compute(self):
        if self.pyramid_backend == "device":
            ref_vol = base._upload_f32(
                getattr(self.ref_img, "mat", self.ref_img))
            tar_vol = base._upload_f32(
                getattr(self.tar_img, "mat", self.tar_img))
            kp1d, desc1d, ok1d = self._extract_device(ref_vol)
            kp2d, desc2d, ok2d = self._extract_device(tar_vol)
            # 2-NN search on device; only [K, 2] distance/index tables, the
            # [K, 6] keypoint records and the validity masks cross the tunnel
            # (the many-to-one / mutual elimination is a tiny sequential
            # host pass, matching the reference's std::map walk)
            d12, i12 = ops3d.match_top2(
                desc1d, desc2d, ok2d, chunk=min(2048, desc1d.shape[0]))
            if self.match_mode == "bi":
                d21, i21 = ops3d.match_top2(
                    desc2d, desc1d, ok1d, chunk=min(2048, desc2d.shape[0]))
            kp1, ok1 = np.asarray(kp1d), np.asarray(ok1d)
            kp2, ok2 = np.asarray(kp2d), np.asarray(ok2d)
            self.ref_kp_count = int(ok1.sum())
            self.tar_kp_count = int(ok2.sum())
            ratio = self.matching_ratio
            if self.match_mode == "bi":
                mk1, mk2 = _bi_eliminate(
                    kp1, ok1, kp2, ok2, np.asarray(d12), np.asarray(i12),
                    np.asarray(d21), np.asarray(i21), ratio)
            else:
                mk1, mk2 = _mono_eliminate(
                    kp1, ok1, kp2, int(ok2.sum()), np.asarray(d12),
                    np.asarray(i12), ratio)
            self.ref_matched_kp = mk1
            self.tar_matched_kp = mk2
            return
        if self.pyramid_backend == "host":
            ref_vol = np.asarray(getattr(self.ref_img, "mat", self.ref_img),
                                 np.float32)
            tar_vol = np.asarray(getattr(self.tar_img, "mat", self.tar_img),
                                 np.float32)
        else:
            ref_vol = jnp.asarray(getattr(self.ref_img, "mat", self.ref_img),
                                  jnp.float32)
            tar_vol = jnp.asarray(getattr(self.tar_img, "mat", self.tar_img),
                                  jnp.float32)
        ref_kp, ref_desc = self._extract(ref_vol)
        tar_kp, tar_desc = self._extract(tar_vol)
        self.ref_kp_count = len(ref_kp)
        self.tar_kp_count = len(tar_kp)

        if self.match_mode == "bi":
            mk1, mk2 = _bidirectional_match(
                ref_kp, ref_desc, tar_kp, tar_desc, self.matching_ratio)
        else:
            mk1, mk2 = _monodirectional_match(
                ref_kp, ref_desc, tar_kp, tar_desc, self.matching_ratio)
        self.ref_matched_kp = mk1
        self.tar_matched_kp = mk2


def _host_gaussian_blur(vol: np.ndarray, sigma: float, unit_xyz) -> np.ndarray:
    """Host twin of ops3d.gaussian_blur: separable mirror-extension blur with
    the reference's kernel construction (oc_sift.cpp:365-548).  scipy's
    'mirror' mode reproduces mirrorLow/mirrorHigh exactly."""
    from scipy.ndimage import convolve1d

    unit_max = max(unit_xyz)
    if sigma > 0:
        kernel_radius = max(int(math.ceil(3.0 * sigma)), 1)
    else:
        sigma = 0.0
        kernel_radius = 1
    out = np.asarray(vol, np.float32)
    for axis, unit in ((2, unit_xyz[0]), (1, unit_xyz[1]), (0, unit_xyz[2])):
        radius = kernel_radius * int(math.floor(unit_max / unit + 0.5))
        taps = np.ones(radius + 1, np.float32)
        for i in range(1, radius + 1):
            x = i / (sigma + np.finfo(np.float32).eps)
            taps[i] = math.exp(-0.5 * x * x)
            taps[0] += taps[i] * 2.0
        taps[0] = 1.0 / taps[0]
        taps[1:] *= taps[0]
        full = np.concatenate([taps[::-1], taps[1:]])
        out = convolve1d(out, full, axis=axis, mode="mirror")
    return out


def _host_extrema_mask(dog_prev, dog_cur, dog_next, alpha_max_abs):
    """Host twin of ops3d.extrema_mask."""
    v = np.asarray(dog_cur)
    p = np.asarray(dog_prev)
    nx = np.asarray(dog_next)
    big = np.abs(v) >= alpha_max_abs
    neigh = [np.roll(v, 1, 0), np.roll(v, -1, 0), np.roll(v, 1, 1),
             np.roll(v, -1, 1), np.roll(v, 1, 2), np.roll(v, -1, 2), p, nx]
    gt = big.copy()
    lt = big.copy()
    for nb in neigh:
        gt &= v > nb
        lt &= v < nb
    mask = gt | lt
    b = 1
    mask[:b] = False
    mask[-b:] = False
    mask[:, :b] = False
    mask[:, -b:] = False
    mask[:, :, :b] = False
    mask[:, :, -b:] = False
    return mask


def _bucket8(r: int) -> int:
    return ((r + 7) // 8) * 8


def _run_chunked(kernel, vol_np, grp, r, budget, extra, rot=None):
    """Run an orientation/descriptor kernel over padded keypoint chunks.

    Windows are gathered on the host so the kernel's jit signature depends
    only on (chunk, window) sizes — one compile per radius bucket instead of
    one per pyramid-layer volume shape."""
    s = 2 * r + 1
    per_kp = s ** 3 * 4 * 40  # rough live-buffer estimate per keypoint
    chunk = max(8, min(2048, budget // per_kp))
    dz, dy, dx = vol_np.shape
    dims = jnp.asarray(np.array([dx, dy, dz], np.int32))
    n = len(grp)
    outs = []
    for lo in range(0, n, chunk):
        sub = grp[lo : lo + chunk]
        pad = chunk - len(sub)
        if pad:
            sub = np.concatenate([sub, np.repeat(sub[-1:], pad, 0)], 0)
        x0 = np.clip(sub[:, 0] - r, 0, dx - s)
        y0 = np.clip(sub[:, 1] - r, 0, dy - s)
        z0 = np.clip(sub[:, 2] - r, 0, dz - s)
        win = np.empty((chunk, s, s, s), np.float32)
        for i in range(chunk):
            win[i] = vol_np[z0[i] : z0[i] + s, y0[i] : y0[i] + s,
                            x0[i] : x0[i] + s]
        args = [jnp.asarray(win), jnp.asarray(x0), jnp.asarray(y0),
                jnp.asarray(z0), jnp.asarray(sub[:, 0]),
                jnp.asarray(sub[:, 1]), jnp.asarray(sub[:, 2]), dims]
        if rot is not None:
            rsub = rot[lo : lo + chunk]
            if pad:
                rsub = np.concatenate([rsub, np.repeat(rsub[-1:], pad, 0)], 0)
            args.append(jnp.asarray(rsub))
        res = kernel(*args, *extra)
        if isinstance(res, tuple):
            outs.append(tuple(np.asarray(x)[: chunk - pad] for x in res))
        else:
            outs.append(np.asarray(res)[: chunk - pad])
    if isinstance(outs[0], tuple):
        return tuple(np.concatenate([o[i] for o in outs], 0)
                     for i in range(len(outs[0])))
    return np.concatenate(outs, 0)


@highest_precision
def _top2_distances(d1, d2):
    import jax

    r = jnp.asarray(d1)
    t = jnp.asarray(d2)
    rr = jnp.sum(r * r, axis=1, keepdims=True)
    tt = jnp.sum(t * t, axis=1)[None, :]
    dist2 = jnp.maximum(rr + tt - 2.0 * (r @ t.T), 0.0)
    neg2, idx2 = jax.lax.top_k(-dist2, 2)
    return np.asarray(-neg2), np.asarray(idx2)


def _monodirectional_match(kp1, desc1, kp2, desc2, ratio):
    """monodirectionalMatch (oc_sift.cpp:1251-1418): 2-NN ratio test, then
    many-to-one elimination with a second ratio test among competing refs."""
    if len(kp1) == 0 or len(kp2) < 2:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
    d2, idx2 = _top2_distances(desc1, desc2)
    return _mono_eliminate(kp1, np.ones(len(kp1), bool), kp2, len(kp2),
                           d2, idx2, ratio)


def _mono_eliminate(kp1, valid1, kp2, n2_valid, d2, idx2, ratio):
    """Host tail of the monodirectional match given precomputed 2-NN tables
    (device or host): ratio test + many-to-one elimination
    (oc_sift.cpp:1251-1418).  ``valid1`` masks padded rows of a fixed-size
    device keypoint table; ``n2_valid`` guards the <2-valid-targets case."""
    if not valid1.any() or n2_valid < 2:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
    ratio2 = ratio * ratio
    keep = valid1 & (d2[:, 0] < ratio2 * d2[:, 1])
    ref_idx = np.nonzero(keep)[0]
    tar_idx = idx2[keep, 0]
    dist = d2[keep, 0]

    # many-to-one elimination: for each target matched by several refs, run the
    # ratio test among those refs' distances; keep the best only if distinct.
    order = np.argsort(tar_idx, kind="stable")
    ref_idx, tar_idx, dist = ref_idx[order], tar_idx[order], dist[order]
    keep_final = np.ones(len(ref_idx), bool)
    start = 0
    while start < len(tar_idx):
        end = start
        while end + 1 < len(tar_idx) and tar_idx[end + 1] == tar_idx[start]:
            end += 1
        if end > start:
            seg = slice(start, end + 1)
            dists = dist[seg]
            o = np.argsort(dists)
            keep_final[seg] = False
            if len(dists) >= 2 and dists[o[0]] < ratio2 * dists[o[1]]:
                keep_final[start + o[0]] = True
        start = end + 1

    ref_idx = ref_idx[keep_final]
    tar_idx = tar_idx[keep_final]
    return kp1[ref_idx, :3].copy(), kp2[tar_idx, :3].copy()


def _bidirectional_match(kp1, desc1, kp2, desc2, ratio):
    """bidirectionalMatch (oc_sift.cpp:1420-1489): keep only pairs that are
    each other's mutual ratio-test best match."""
    if len(kp1) == 0 or len(kp2) < 2 or len(kp1) < 2:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
    d12, i12 = _top2_distances(desc1, desc2)
    d21, i21 = _top2_distances(desc2, desc1)
    return _bi_eliminate(kp1, np.ones(len(kp1), bool),
                         kp2, np.ones(len(kp2), bool),
                         d12, i12, d21, i21, ratio)


def _bi_eliminate(kp1, valid1, kp2, valid2, d12, i12, d21, i21, ratio):
    """Host tail of the bidirectional match given precomputed 2-NN tables."""
    if valid1.sum() < 2 or valid2.sum() < 2:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
    ratio2 = ratio * ratio
    r2t = np.where(valid1 & (d12[:, 0] < ratio2 * d12[:, 1]), i12[:, 0], -1)
    t2r = np.where(valid2 & (d21[:, 0] < ratio2 * d21[:, 1]), i21[:, 0], -1)
    keep = (r2t >= 0) & (t2r[np.clip(r2t, 0, None)] == np.arange(len(kp1)))
    ref_idx = np.nonzero(keep)[0]
    return kp1[ref_idx, :3].copy(), kp2[r2t[ref_idx], :3].copy()
