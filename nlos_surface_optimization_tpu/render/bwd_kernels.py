"""Fused analytic-backward Pallas kernel (the second hot loop).

The reference's gradient pass (transient_and_gradient.cpp:843-1007) costs
as much as its forward; through round 3 this repo ran it as plain XLA
(render/core.py::backward_chunk) — measured 1.23 s of the 2.54 s flagship
iteration.  Stage profiling localized ~95% of that to the PER-RAY TABLE
LOOKUPS of the collapsed tap reduction (core._tap_reductions): two XLA
gathers per ray from the [Lc, Bf+1] tables = ~175M scalar gathers per
iteration, which the TPU executes painfully.

This kernel eliminates the gathers: the lookup A_r = tab[l, q_r] is a
TWO-LEVEL ONE-HOT CONTRACTION over the table's (page, lane) decomposition
q = 128*qhi + qlo:

    Ut[p, r]  = (qhi_r == p)          one-hot pages   [PB, W]   (VPU iota)
    MA        = tabT_l @ Ut           page mix        [128, W]  (MXU)
    B2t[c, r] = (qlo_r == c)          one-hot lanes   [128, W]  (VPU iota)
    A[1, r]   = sum_c B2t * MA        sublane reduce  [1, W]    (VPU)

with tabT_l = the source's table pre-transposed to [128, PB] in XLA.
Everything else — per-ray gradient math (t1/t2/gn/gauss, clamped cosines,
transient_and_gradient.cpp:944-1001) and the per-face reduction (a
constant block-diagonal one-hot on the MXU; lane l belongs to face
l//spt) — runs in the same VMEM pass.  One grid step owns a 512-ray
window x ALL Lc sources (the [16, 128]-block v1 drowned in grid-step
overhead), sources accumulate in the fori carry, the face tile is
written once.

Per-face cross products against opposite edges (linear in the reduced
T2f — see backward_chunk's hoist) and the faces->vertices segment-sum
stay in XLA: they touch [F, 3] data, one-thousandth of the ray tensors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 128       # maximum spt the kernel supports (one face per >=1 lane)
W = 512        # ray lanes per window
# sources per grid slab are sized so (tables + rows) for a slab fit the
# 16 MB scoped-VMEM limit with double buffering: per source the kernel
# holds 2*128*PB table floats + 16*W row floats (PB grows with num_bins —
# B=2048 real captures OOM'd a fixed 32-source slab).
_VMEM_BUDGET = 3_000_000  # bytes per copy (2x for double
#                           buffering + kernel scratch must
#                           stay inside the 16 MB limit)


def _slab_sources(Lc: int, PB: int) -> int:
    per_source = 4 * (2 * 128 * PB + 16 * W)
    return max(1, min(Lc, _VMEM_BUDGET // per_source))


def _bwd_kernel(tab_ref, rows_ref, out_ref, *, spt, Ls, fpw_pad, PB,
                bin_lower, fine_res, Bf, use_gn):
    sl = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (W, fpw_pad), 0)
    colf = jax.lax.broadcasted_iota(jnp.int32, (W, fpw_pad), 1)
    M = (lane // spt == colf).astype(jnp.float32)  # [W, fpw_pad] face onehot

    page = jax.lax.broadcasted_iota(jnp.int32, (PB, W), 0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (128, W), 0)

    def body(l, acc):
        rows = rows_ref[0, 0, l]                    # [16, W]

        def row(r):
            return rows[r:r + 1, :]                 # [1, W]

        dx, dy, dz = row(0), row(1), row(2)
        nx, ny, nz = row(3), row(4), row(5)
        ox, oy, oz = row(6), row(7), row(8)
        h = row(9)
        albw = row(10)                              # albedo*valid*area*(-2/spt)
        inv2a = row(11)
        b1 = row(12)
        b2 = row(13)

        # ---- tap-table lookup as one-hot contraction -------------------
        # same floored-integer bound as core._tap_reductions (q computed
        # from floor, compared as integers), so the two backends agree
        # independently of the rays.valid mask
        qf = jnp.floor((2.0 * h - bin_lower) / fine_res)
        qi = qf.astype(jnp.int32)
        ok = (qi >= 0) & (qi <= Bf) & (jnp.abs(qf) < 2.0e9)
        q = jnp.clip(qi, 0, Bf)                             # [1, W]
        qhi = q // 128
        qlo = q - 128 * qhi

        Ut = (qhi == page).astype(jnp.float32)       # [PB, W]
        B2t = (qlo == sub).astype(jnp.float32)       # [128, W]

        tabA = tab_ref[0, l, 0]                      # [128, PB]
        tabB = tab_ref[0, l, 1]
        MA = jax.lax.dot_general(
            tabA, Ut, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)     # [128, W]
        MB = jax.lax.dot_general(
            tabB, Ut, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        okf = jnp.where(ok, 1.0, 0.0)
        A = jnp.sum(B2t * MA, axis=0, keepdims=True) * okf    # [1, W]
        Bw = jnp.sum(B2t * MB, axis=0, keepdims=True) * okf   # (pre-scaled
        #                                    by 2/sigma^2 in the XLA prep)

        # ---- gradient math (backward_chunk formulas) -------------------
        cos2 = jnp.maximum(ox * dx + oy * dy + oz * dz, 0.0)
        cos3 = jnp.maximum(-(nx * dx + ny * dy + nz * dz), 0.0)
        hs = jnp.maximum(h, 1e-12)
        inv_h2 = 1.0 / (hs * hs)
        cc = cos2 * cos3
        ff = cc * inv_h2
        inten = albw * ff * ff          # carries valid*area*(-2/spt)

        s1 = albw * 2.0 * cc * inv_h2 * inv_h2 / hs
        t1x = s1 * (ox * cos3 - nx * cos2 - 4.0 * dx * cc)
        t1y = s1 * (oy * cos3 - ny * cos2 - 4.0 * dy * cc)
        t1z = s1 * (oz * cos3 - nz * cos2 - 4.0 * dz * cc)

        t2x = nx * inten
        t2y = ny * inten
        t2z = nz * inten
        if use_gn:
            sg = -2.0 * albw * cos3 * cos2 * cos2 * inv_h2 * inv_h2
            gx = sg * dx
            gy = sg * dy
            gz = sg * dz
            dot = gx * nx + gy * ny + gz * nz
            t2x += gx - nx * dot
            t2y += gy - ny * dot
            t2z += gz - nz * dot
        t2x = t2x * inv2a
        t2y = t2y * inv2a
        t2z = t2z * inv2a

        gsc = inten * Bw
        px = t1x * A + dx * gsc
        py = t1y * A + dy * gsc
        pz = t1z * A + dz * gsc
        s2x = t2x * A
        s2y = t2y * A
        s2z = t2z * A

        b3 = 1.0 - b1 - b2
        zero = jnp.zeros_like(px)
        u = jnp.concatenate([
            px * b1, py * b1, pz * b1,
            px * b2, py * b2, pz * b2,
            px * b3, py * b3, pz * b3,
            s2x, s2y, s2z,
            zero, zero, zero, zero,
        ], axis=0)                                  # [16, W]

        return acc + jax.lax.dot_general(
            u, M, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                           # [16, fpw_pad]

    @pl.when(sl == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    acc0 = jnp.zeros((16, fpw_pad), jnp.float32)
    out_ref[0] += jax.lax.fori_loop(0, Ls, body, acc0)


@functools.partial(
    jax.jit,
    static_argnames=("spt", "use_gn", "bin_lower", "fine_res", "Bf",
                     "interpret"))
def backward_face_sums_pallas(tables, rows, spt: int, use_gn: bool,
                              bin_lower: float, fine_res: float, Bf: int,
                              interpret: bool = False):
    """(tables [Lc, 2, 128, PB], rows [nfw, Lc, 16, W]) ->
    per-face partial sums [nfw, 16, fpw_pad].

    tables: the tap-reduction tables (core._tap_tables) page-transposed —
    tables[l, t, c, p] = tab_t[l, 128*p + c] (t=0: A, t=1: Bw pre-scaled
    by 2/sigma^2).  rows: lanes are (face-within-window, sample) ordered
    with fpw = W // spt faces per window; dead lanes must carry
    albedo_w = 0.

    out[bw, 0:3, c]  = sum_rays P*b1   of face bw*fpw + c  (sources sum)
    out[bw, 3:6, c]  = ... P*b2 ; [6:9] P*b3 ; [9:12] S2
    """
    nfw, Lc = rows.shape[0], rows.shape[1]
    PB = tables.shape[3]
    fpw = W // spt
    fpw_pad = -(-fpw // 128) * 128
    Ls = _slab_sources(Lc, PB)
    nsl = -(-Lc // Ls)
    pad_l = nsl * Ls - Lc
    if pad_l:  # zero rows contribute zero (albedo_w row is 0)
        rows = jnp.pad(rows, ((0, 0), (0, pad_l), (0, 0), (0, 0)))
        tables = jnp.pad(tables, ((0, pad_l), (0, 0), (0, 0), (0, 0)))
    rows = rows.reshape(nfw, nsl, Ls, 16, W)
    tables = tables.reshape(nsl, Ls, 2, 128, PB)
    # grid (bw, slab): the output face tile stays VMEM-resident while the
    # source slabs accumulate into it (first-visit zeroing at slab 0)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, spt=spt, Ls=Ls, fpw_pad=fpw_pad,
                          PB=PB, bin_lower=bin_lower, fine_res=fine_res,
                          Bf=Bf, use_gn=use_gn),
        grid=(nfw, nsl),
        in_specs=[
            pl.BlockSpec((1, Ls, 2, 128, PB),
                         lambda bw, sl: (sl, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Ls, 16, W),
                         lambda bw, sl: (bw, sl, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, fpw_pad), lambda bw, sl: (bw, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nfw, 16, fpw_pad), jnp.float32),
        interpret=interpret,
    )(tables, rows)
    return out


def backward_chunk_fused(rays, mesh, lighting_normal, difference,
                         source_offset, cfg, spt: int,
                         interpret: bool = False):
    """Drop-in for core.backward_chunk (Lambertian BRDF, spt <= RB):
    same analytic gradient, per-ray math + tap lookups + face reduction
    fused in Pallas.

    Requires cfg.brdf == 'lambertian'.  The gn (shading-normal) term is
    active exactly when backward_chunk's is (normal == 'vn' and
    testing_flag == 0, transient_and_gradient.cpp:959-964)."""
    from .core import _EPS, _tap_tables

    Lc, F = rays.h.shape[0], rays.h.shape[1]
    dt = jnp.float32

    B = cfg.num_bins
    refine = cfg.bin_refine_resolution
    Bf = B * refine
    fine_res = cfg.distance_resolution / refine
    sigma2 = cfg.sigma * cfg.sigma

    A_tab, Bw_tab = _tap_tables(difference, source_offset, Lc, cfg, dt)
    Bw_tab = Bw_tab * (2.0 / sigma2)
    # page-transpose: [Lc, Bf+1] -> [Lc, 128, PB] with
    # tabT[l, c, p] = tab[l, 128*p + c]
    PB = -(-(Bf + 1) // 128)
    PB = -(-PB // 8) * 8                   # sublane-friendly page count

    def page_t(tab):
        tab = jnp.pad(tab, ((0, 0), (0, PB * 128 - (Bf + 1))))
        return tab.reshape(Lc, PB, 128).swapaxes(1, 2)

    tables = jnp.stack([page_t(A_tab), page_t(Bw_tab)], axis=1)

    albw = (rays.albedo * jnp.where(rays.valid, 1.0, 0.0)
            * rays.area[None, :, None] * (-2.0 / float(spt)))
    inv2a = (1.0 / (2.0 * jnp.maximum(rays.area, _EPS)))[None, :, None]
    onorm = jnp.broadcast_to(lighting_normal[:, None, None, :],
                             rays.dirs.shape)

    fpw = W // spt
    nfw = -(-F // fpw)
    Fp = nfw * fpw
    fpw_pad = -(-fpw // 128) * 128

    def prep(x):
        # [Lc, F, spt] -> [Lc, nfw, fpw*spt] -> lane-padded [Lc, nfw, W]
        x = x.astype(dt)
        x = jnp.pad(x, ((0, 0), (0, Fp - F), (0, 0)))
        x = x.reshape(Lc, nfw, fpw * spt)
        return jnp.pad(x, ((0, 0), (0, 0), (0, W - fpw * spt)))

    zero_r = jnp.zeros((Lc, nfw, W), dt)
    rows = jnp.stack([
        prep(rays.dirs[..., 0]), prep(rays.dirs[..., 1]),
        prep(rays.dirs[..., 2]),
        prep(rays.normal[..., 0]), prep(rays.normal[..., 1]),
        prep(rays.normal[..., 2]),
        prep(onorm[..., 0]), prep(onorm[..., 1]), prep(onorm[..., 2]),
        prep(rays.h), prep(albw),
        prep(jnp.broadcast_to(inv2a, rays.h.shape)),
        prep(rays.bary[..., 0]), prep(rays.bary[..., 1]),
        zero_r, zero_r,
    ], axis=2)                                     # [Lc, nfw, 16, W]
    rows = rows.swapaxes(0, 1)                     # [nfw, Lc, 16, W]

    use_gn = cfg.normal == "vn" and cfg.testing_flag == 0
    out = backward_face_sums_pallas(
        tables, rows, spt, use_gn, float(cfg.bin_lower),
        float(fine_res), Bf, interpret=interpret)

    # [nfw, 16, fpw_pad] -> per-face vectors [F, 12]
    per = out[:, :12, :fpw]                        # [nfw, 12, fpw]
    per = per.transpose(0, 2, 1).reshape(Fp, 12)[:F]
    Pb = (per[:, 0:3], per[:, 3:6], per[:, 6:9])
    T2f = per[:, 9:12].astype(rays.h.dtype)

    v1 = mesh.v[mesh.f[:, 0]]
    v2 = mesh.v[mesh.f[:, 1]]
    v3 = mesh.v[mesh.f[:, 2]]
    edges = (v3 - v2, v1 - v3, v2 - v1)
    per_face = [Pb[k].astype(rays.h.dtype) + jnp.cross(T2f, edges[k])
                for k in range(3)]

    V = mesh.v.shape[0]
    stacked = jnp.stack(per_face, axis=1).reshape(-1, 3)
    ids = mesh.f.reshape(-1)
    return jax.ops.segment_sum(stacked, ids, num_segments=V)
