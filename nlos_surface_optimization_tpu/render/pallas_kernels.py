"""Pallas TPU kernels for the renderer hot path.

segment_occluded_pallas: the visibility query (nearest-hit == sampled-face
re-expressed as segment occlusion, geometry/intersect.py) as a fused
kernel.  The jnp path scans face tiles with lax.scan, whose [R, tile]
Möller–Trumbore intermediates round-trip HBM between fusions; here each
ray block runs MT entirely in VMEM against only its CANDIDATE face tiles.

Design (v2 — sparse candidate lists):

  * Broad phase OUTSIDE the kernel, in plain jnp: each 512-ray block gets
    a bounding capsule (segment between its origin- and endpoint-sphere
    centers), each 128-face tile a bounding sphere; a [nb, nt] capsule-
    sphere test yields, per block, a sorted list of candidate tile ids.
    This is exact: the capsule contains every segment of the block, so a
    sphere miss proves no face of the tile can occlude.  The lists ride
    into the kernel as scalar-prefetch arrays in SMEM.
  * The kernel grid is 1-D over ray blocks.  Each block fori-loops over
    its OWN candidate count (dynamic trip count — sparsity costs neither
    grid steps nor block copies), double-buffering the 8 KB face tiles
    from HBM with manual async DMA.  Blocks whose list overflows the
    L_STORE SMEM slots fall back to scanning all tiles (same loop with
    tile_id = k), so correctness never depends on the list capacity.
  * Tile skipping only works if face tiles are spatially compact: callers
    should Morton-order faces (geometry.accel.morton_argsort) — raster-
    ordered height-field tiles span the whole mesh and every tile becomes
    a candidate for every block (measured: 100% pass rate unordered).
  * Layout: per-(ray, face) planes are [BLOCK_R, TILE_F] with TILE_F=128
    lanes; triangle data arrives PRE-TRANSPOSED as [nt, 16, TILE_F] so
    each component is a native (1, TILE_F) sublane slice — the [F, 9]-
    column variant forces a cross-lane relayout per component that this
    Mosaic toolchain compiles pathologically.
  * The narrow phase is sign-safe (u_num*det >= 0 instead of u >= 0
    after dividing): algebraically identical decisions, no vector divide.

Cites: reference visibility semantics transient_and_gradient.cpp:199-206.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_R = 512
TILE_F = 128

# Candidate-list slots per ray block, stored in SMEM (int32).  A block
# whose candidate count exceeds the list capacity scans all tiles instead
# — exact either way, capacity only trades SMEM for the rare dense block.
# At large tile counts the typical candidate count grows (finer tiles over
# the same corridor), so capacity scales with nt while the SMEM budget
# (blocks-per-call x capacity) stays ~256 KB.
L_STORE = 64
MAX_NB = 1024


def _list_geometry(nt: int):
    """(l_store, max_nb) for a given face-tile count."""
    l_store = min(max(L_STORE, nt // 8), 512)
    max_nb = max(64, (MAX_NB * L_STORE) // l_store)
    return l_store, max_nb


def _occl_kernel(cnt_ref, lst_ref, o_ref, d_ref, t_ref, fid_ref, tri_hbm,
                 out_ref, slots, sems, *, nt, l_store, t_rel, t_min,
                 eps_det):
    b = pl.program_id(0)
    cnt = cnt_ref[b]
    full = cnt > l_store
    n = jnp.where(full, nt, cnt)
    out_ref[:] = jnp.zeros_like(out_ref)

    def tile_id(k):
        safe = jnp.minimum(k, l_store - 1)
        return jnp.where(full, k, lst_ref[b * l_store + safe])

    def tile_copy(k, slot):
        return pltpu.make_async_copy(
            tri_hbm.at[tile_id(k)], slots.at[slot], sems.at[slot]
        )

    o = o_ref[:]          # [R, 3]
    d = d_ref[:]          # [R, 3]
    tsf = t_ref[:]        # [R, 1]
    sfid = fid_ref[:]     # [R, 1] int32
    t_cut = tsf * (1.0 - t_rel)

    def col(m, k):        # [R, 1] ray component
        return m[:, k:k + 1]

    dx, dy, dz = col(d, 0), col(d, 1), col(d, 2)
    ox, oy, oz = col(o, 0), col(o, 1), col(o, 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_F), 1)

    def mt_accumulate(k, slot):
        tile_copy(k, slot).wait()
        tri = slots[slot]     # [16, TILE_F]

        def trow(r):          # [1, TILE_F] triangle component (sublane slice)
            return tri[r:r + 1, :]

        p1x, p1y, p1z = trow(0), trow(1), trow(2)
        e1x, e1y, e1z = trow(3), trow(4), trow(5)
        e2x, e2y, e2z = trow(6), trow(7), trow(8)
        val = trow(9)

        # pvec = cross(d, e2):   [R, TILE_F] planes
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz

        tvx = ox - p1x
        tvy = oy - p1y
        tvz = oz - p1z
        u_num = tvx * pvx + tvy * pvy + tvz * pvz

        # qvec = cross(tvec, e1)
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v_num = dx * qvx + dy * qvy + dz * qvz
        t_num = e2x * qvx + e2y * qvy + e2z * qvz

        # sign-safe tests: x = x_num/det compared against bounds without
        # the divide (sign(det) folds into each inequality)
        s = jnp.where(det >= 0.0, 1.0, -1.0)
        dd = det * s
        un = u_num * s
        vn = v_num * s
        tn = t_num * s

        fid = tile_id(k) * TILE_F + lane
        blocked = (
            (dd > eps_det)
            & (un >= 0.0) & (vn >= 0.0) & (un + vn <= dd)
            & (val > 0.5)
            & (tn > t_min * dd) & (tn < t_cut * dd)
            & (fid != sfid)
        )
        out_ref[:] = out_ref[:] | jnp.any(blocked, axis=1, keepdims=True)

    @pl.when(n > 0)
    def _():
        tile_copy(0, 0).start()

        @pl.when(n > 1)
        def _():
            tile_copy(1, 1).start()

        def body(i, carry):
            k0 = 2 * i
            mt_accumulate(k0, 0)

            @pl.when(k0 + 2 < n)
            def _():
                tile_copy(k0 + 2, 0).start()

            @pl.when(k0 + 1 < n)
            def _():
                mt_accumulate(k0 + 1, 1)

                @pl.when(k0 + 3 < n)
                def _():
                    tile_copy(k0 + 3, 1).start()

            return carry

        jax.lax.fori_loop(0, (n + 1) // 2, body, 0)


def _block_boxes(o, d, t_self, nb):
    """[NB, 12] f32 per ray block: origin-AABB center (3), endpoint-AABB
    center (3), and the component-wise max of the two half-extents (3, the
    swept-hull inflation), padded by 3 zeros.  The convex hull of the two
    boxes is contained in segment(center_o -> center_p) Minkowski-summed
    with box(max half-extents), so a slab miss of the inflated tile box
    proves no segment of the block can touch the tile."""
    p = o + d * t_self[:, None]
    ob = o.reshape(nb, BLOCK_R, 3)
    pb = p.reshape(nb, BLOCK_R, 3)
    # dead rays (t == 0: padding, or zero-contribution rays skipped by
    # core._occl_skip_mask) must not inflate the endpoint box; with no
    # live ray the block degenerates to its origin box (empty sweep)
    mb = (t_self.reshape(nb, BLOCK_R, 1) > 0.0)

    def box(x, m=None):
        if m is None:
            lo = x.min(axis=1)
            hi = x.max(axis=1)
        else:
            lo = jnp.where(m, x, jnp.inf).min(axis=1)
            hi = jnp.where(m, x, -jnp.inf).max(axis=1)
        return 0.5 * (lo + hi), 0.5 * (hi - lo)

    oc, oh = box(ob)
    pc, ph = box(pb, mb)
    none = ~jnp.any(mb, axis=(1, 2))[:, None]
    pc = jnp.where(none, oc, pc)
    ph = jnp.where(none, 0.0, ph)
    half = jnp.maximum(oh, ph)
    return jnp.concatenate([oc, pc, half], axis=1).astype(jnp.float32)


def _tile_boxes(v, f, f_valid, nt):
    """[NT, 6] f32 AABBs (lo|hi) over each face tile's VALID vertices;
    tiles with no valid face get an empty box (lo > hi, never hit).

    Boxes, not spheres: the meshes are mostly height fields, so a tile is
    a thin slab — a bounding sphere inflates its z-extent by the patch
    radius and admits every ray that merely passes NEAR the surface
    (measured: sphere broad phase kept 15/24 tiles, boxes ~a third)."""
    verts = v[f].astype(jnp.float32).reshape(nt, TILE_F, 3, 3)
    val = f_valid.reshape(nt, TILE_F)
    big = 1e30
    w = val[..., None, None]
    lo = jnp.where(w, verts, big).min(axis=(1, 2))
    hi = jnp.where(w, verts, -big).max(axis=(1, 2))
    return jnp.concatenate([lo, hi], axis=1)


def _candidate_lists(meta, boxes, l_store):
    """Broad phase: swept-hull-vs-AABB slab test -> per-block tile lists.

    meta [nb, 12] block boxes (_block_boxes); boxes [nt, 6] tile AABBs.
    Returns (counts [nb] int32, lists [nb, L_STORE] int32).  counts may
    exceed L_STORE (kernel falls back to a full scan for those blocks);
    list entries beyond the count are inert (count guards the loop).
    """
    a = meta[:, 0:3]                                   # [nb, 3] segment start
    b = meta[:, 3:6]                                   # [nb, 3] segment end
    half = meta[:, 6:9]                                # [nb, 3] inflation
    lo = boxes[None, :, 0:3] - (half[:, None, :] + 1e-5)   # [nb, nt, 3]
    hi = boxes[None, :, 3:6] + (half[:, None, :] + 1e-5)

    # slab test of segment a -> b against the inflated box
    ab = (b - a)[:, None, :]                           # [nb, 1, 3]
    inv = jnp.where(jnp.abs(ab) > 1e-30, 1.0 / ab, 0.0)
    t0 = (lo - a[:, None, :]) * inv
    t1 = (hi - a[:, None, :]) * inv
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    # parallel axes: inside <=> a within the slab (inv==0 collapses t to 0)
    par = jnp.abs(ab) <= 1e-30
    inside = (a[:, None, :] >= lo) & (a[:, None, :] <= hi)
    tmin = jnp.where(par, jnp.where(inside, -jnp.inf, jnp.inf), tmin)
    tmax = jnp.where(par, jnp.where(inside, jnp.inf, -jnp.inf), tmax)
    enter = jnp.maximum(jnp.max(tmin, axis=-1), 0.0)
    exit_ = jnp.minimum(jnp.min(tmax, axis=-1), 1.0)
    # all-padding tiles carry an empty box (lo > hi) — never a candidate
    empty = jnp.any(boxes[:, 0:3] > boxes[:, 3:6], axis=1)
    cand = (enter <= exit_) & ~empty[None, :]          # [nb, nt]

    nt = boxes.shape[0]
    counts = jnp.sum(cand, axis=1, dtype=jnp.int32)
    iota_t = jnp.arange(nt, dtype=jnp.int32)[None, :]
    idx = jnp.where(cand, iota_t, nt)
    k = min(nt, l_store)
    order = jax.lax.top_k(-idx, k)[0] * -1             # ascending candidates
    lists = jnp.where(order >= nt, 0, order).astype(jnp.int32)
    if k < l_store:
        lists = jnp.pad(lists, ((0, 0), (0, l_store - k)))
    return counts, lists


def _occl_call(o_p, d_p, t_p, fid_p, tri_t, boxes, nt, t_rel, t_min,
               interpret):
    """One pallas_call over [Rp] padded rays (Rp multiple of BLOCK_R)."""
    Rp = o_p.shape[0]
    nb = Rp // BLOCK_R
    meta = _block_boxes(o_p, d_p, t_p, nb)
    l_store, _ = _list_geometry(nt)
    counts, lists = _candidate_lists(meta, boxes, l_store)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # counts, lists (flat): SMEM
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((BLOCK_R, 3), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 3), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 1), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 1), lambda b, *_: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),         # [nt, 16, TILE_F] HBM
        ],
        out_specs=pl.BlockSpec((BLOCK_R, 1), lambda b, *_: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 16, TILE_F), jnp.float32),  # double-buffered tiles
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_occl_kernel, nt=nt, l_store=l_store,
                          t_rel=t_rel, t_min=t_min, eps_det=1e-12),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, 1), jnp.bool_),
        interpret=interpret,
    )(counts, lists.reshape(-1), o_p, d_p, t_p.reshape(Rp, 1),
      fid_p.reshape(Rp, 1), tri_t)
    return out


@functools.partial(jax.jit,
                   static_argnames=("t_rel", "t_min", "interpret"))
def segment_occluded_pallas(o, d, t_self, self_fid, v, f, f_valid,
                            t_rel=1e-4, t_min=1e-6, interpret=False):
    """Drop-in for geometry.intersect.segment_occluded (same semantics)."""
    R = o.shape[0]
    F = f.shape[0]
    nb_total = pl.cdiv(R, BLOCK_R)
    Fp0 = pl.cdiv(F, TILE_F) * TILE_F
    _, max_nb = _list_geometry(Fp0 // TILE_F)
    ng = pl.cdiv(nb_total, max_nb)
    gnb = pl.cdiv(nb_total, ng)          # blocks per group
    Rp = ng * gnb * BLOCK_R
    Fp = pl.cdiv(F, TILE_F) * TILE_F

    dt = jnp.float32
    p1 = v[f[:, 0]].astype(dt)
    e1 = (v[f[:, 1]] - v[f[:, 0]]).astype(dt)
    e2 = (v[f[:, 2]] - v[f[:, 0]]).astype(dt)
    tri = jnp.concatenate([p1, e1, e2, f_valid.astype(dt)[:, None]], axis=1)
    # [nt, 16, TILE_F]: transposed so the kernel slices components along
    # sublanes; one [16, TILE_F] tile is an 8 KB DMA.
    tri_t = jnp.pad(tri.T, ((0, 6), (0, Fp - F)))
    nt = Fp // TILE_F
    tri_t = tri_t.reshape(16, nt, TILE_F).swapaxes(0, 1)

    o_p = jnp.pad(o.astype(dt), ((0, Rp - R), (0, 0)))
    d_p = jnp.pad(d.astype(dt), ((0, Rp - R), (0, 0)), constant_values=1.0)
    t_p = jnp.pad(t_self.astype(dt), (0, Rp - R))
    fid_p = jnp.pad(self_fid.astype(jnp.int32), (0, Rp - R))

    fv_p = jnp.pad(f_valid, (0, Fp - F))
    f_pad = jnp.pad(f, ((0, Fp - F), (0, 0)))
    boxes = _tile_boxes(v, f_pad, fv_p, nt)

    if ng == 1:
        out = _occl_call(o_p, d_p, t_p, fid_p, tri_t, boxes, nt,
                         t_rel, t_min, interpret)
        return out[:R, 0]

    gR = gnb * BLOCK_R

    def one(args):
        og, dg, tg, fg = args
        return _occl_call(og, dg, tg, fg, tri_t, boxes, nt,
                          t_rel, t_min, interpret)

    out = jax.lax.map(one, (o_p.reshape(ng, gR, 3), d_p.reshape(ng, gR, 3),
                            t_p.reshape(ng, gR), fid_p.reshape(ng, gR)))
    return out.reshape(Rp)[:R]
