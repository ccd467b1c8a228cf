"""Broad-phase visibility culling (two-level cluster acceleration).

The visibility query is O(rays x faces) brute force; at the reference's
250k-face remeshes that dominates everything (SURVEY.md hard part #1).  A
BVH with per-ray traversal is hostile to the TPU's SIMD model, so instead:

  * faces are ordered by the Morton code of their centroids and grouped
    into clusters of CLUSTER_SIZE; each cluster gets a bounding sphere;
  * every segment from a scan point to a sample on a target face lies in
    the capsule (source -> target-cluster center, radius = target-cluster
    radius) — by convexity the cone from a point to a ball stays within
    that radius of the central segment;
  * occluder cluster c can block such a segment only if
    dist(c_center, segment) <= r_target + r_c  (conservative);
  * per (source, target-cluster) the active occluder clusters are gathered
    into a fixed-width list (K = bucketed max active count), and the
    narrow-phase Möller–Trumbore runs only against those clusters' faces.

Work drops from L*F*spt*F to roughly L*F*spt*(K*CLUSTER_SIZE), with K
small for shallow NLOS scenes.  Everything is dense, static-shape jnp:
gathers + masked reductions, no pointer chasing.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CLUSTER_SIZE = 128


class VisibilityAccel(NamedTuple):
    """Static-shape acceleration structure (pytree; K is shape-static).

    perm        [Fp]      face order (Morton by centroid); padding = F dup
    slot_valid  [Fp]      False on padding slots (kills duplicate faces)
    cluster_of  [Fp]      cluster id per PERMUTED face slot
    centers     [C, 3]    cluster bounding-sphere centers
    radii       [C]       cluster bounding-sphere radii
    """

    perm: jax.Array
    slot_valid: jax.Array
    cluster_of: jax.Array
    centers: jax.Array
    radii: jax.Array

    @property
    def num_clusters(self) -> int:
        return self.centers.shape[0]


def _morton3(x: np.ndarray, bits: int = 10) -> np.ndarray:
    """Interleave 3x bits-bit integers -> Morton codes."""
    def part(v):
        v = v.astype(np.uint64)
        v = (v | (v << 32)) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << 16)) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << 8)) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << 4)) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << 2)) & np.uint64(0x1249249249249249)
        return v

    q = np.clip((x * (2 ** bits - 1)).astype(np.int64), 0, 2 ** bits - 1)
    return (part(q[:, 0]) | (part(q[:, 1]) << np.uint64(1))
            | (part(q[:, 2]) << np.uint64(2)))


def build_accel(v: np.ndarray, f: np.ndarray,
                f_valid: np.ndarray = None) -> VisibilityAccel:
    """Host-side construction (numpy; call between jitted steps)."""
    v = np.asarray(v)
    f = np.asarray(f)
    F = f.shape[0]
    if f_valid is None:
        f_valid = np.ones(F, bool)
    cent = (v[f[:, 0]] + v[f[:, 1]] + v[f[:, 2]]) / 3.0
    lo = cent.min(axis=0)
    span = np.maximum(cent.max(axis=0) - lo, 1e-12)
    codes = _morton3((cent - lo) / span)
    # invalid faces sort to the end (their cluster gets zero radius reach
    # only if mixed; simpler: key them to the max code)
    codes = np.where(f_valid, codes, np.uint64(0xFFFFFFFFFFFFFFFF))
    perm = np.argsort(codes, kind="stable")

    C = math.ceil(F / CLUSTER_SIZE)
    Fp = C * CLUSTER_SIZE
    perm_p = np.concatenate([perm, np.full(Fp - F, perm[-1])])
    slot_valid = np.arange(Fp) < F
    cluster_of = np.arange(Fp) // CLUSTER_SIZE

    centers = np.zeros((C, 3))
    radii = np.zeros(C)
    for c in range(C):
        sl = slice(c * CLUSTER_SIZE, (c + 1) * CLUSTER_SIZE)
        idx = perm_p[sl]
        val = f_valid[idx] & slot_valid[sl]
        tri = v[f[idx]].reshape(-1, 3)                    # [128*3, 3]
        w = np.repeat(val, 3)
        pts = tri[w] if w.any() else tri
        ctr = pts.mean(axis=0)
        centers[c] = ctr
        radii[c] = np.linalg.norm(pts - ctr, axis=1).max() if len(pts) else 0.0

    return VisibilityAccel(
        perm=jnp.asarray(perm_p, jnp.int32),
        slot_valid=jnp.asarray(slot_valid),
        cluster_of=jnp.asarray(cluster_of, jnp.int32),
        centers=jnp.asarray(centers, jnp.float32),
        radii=jnp.asarray(radii, jnp.float32),
    )


def _point_segment_dist(p, a, b):
    """Distance from points p [...,3] to segments a->b (broadcast)."""
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-30)
    t = jnp.clip(jnp.sum((p - a) * ab, axis=-1) / denom, 0.0, 1.0)
    proj = a + t[..., None] * ab
    return jnp.linalg.norm(p - proj, axis=-1)


def _active_matrix(accel: VisibilityAccel, src):
    """[Lc, Ct, Co] bool + distances for one source chunk."""
    d = _point_segment_dist(
        accel.centers[None, None, :, :],             # [1,1,Co,3]
        src[:, None, None, :],                       # [Lc,1,1,3]
        accel.centers[None, :, None, :],             # [1,Ct,1,3]
    )                                                # [Lc,Ct,Co]
    active = d <= (accel.radii[None, :, None] + accel.radii[None, None, :])
    return active, d


def active_cluster_lists(accel: VisibilityAccel, lighting, K: int,
                         source_chunk: int = 64):
    """[L, C, K] int32 occluder-cluster ids per (source, target cluster);
    entries == C mean 'none'.  K must be >= the true max active count —
    use `required_K` on the host to pick the bucket.

    Memory is bounded by chunking sources: the [Lc, C, C] distance cube
    never exceeds source_chunk*C^2 (at the reference's 250k-face remeshes,
    C ~ 2000 — the unchunked cube would be tens of GB)."""
    C = accel.num_clusters
    L = lighting.shape[0]
    Lc = min(source_chunk, L)
    nc = math.ceil(L / Lc)
    pad = nc * Lc - L
    lit = jnp.pad(lighting, ((0, pad), (0, 0))) if pad else lighting

    def one(src):
        active, d = _active_matrix(accel, src)
        # order active first (stable by distance), take K
        score = jnp.where(active, d, jnp.inf)
        idx = jnp.argsort(score, axis=-1)[..., :K]   # [Lc,Ct,K]
        took = jnp.take_along_axis(active, idx, axis=-1)
        return (jnp.where(took, idx, C).astype(jnp.int32),
                active.sum(-1).max())

    lists, maxima = jax.lax.map(one, lit.reshape(nc, Lc, 3))
    return lists.reshape(nc * Lc, C, K)[:L], maxima.max()


def required_K(accel: VisibilityAccel, lighting, source_chunk: int = 64) -> int:
    """Host-side: max active occluder clusters over all (source, target)
    pairs, bucketed to a power of two (bounds recompilation).  Counts only
    (no sort), source-chunked — scales to 250k-face meshes."""
    lighting = jnp.asarray(lighting)
    L = lighting.shape[0]
    Lc = min(source_chunk, L)
    nc = math.ceil(L / Lc)
    pad = nc * Lc - L
    lit = jnp.pad(lighting, ((0, pad), (0, 0)), mode="edge") if pad \
        else lighting

    def one(src):
        active, _ = _active_matrix(accel, src)
        return active.sum(-1).max()

    k = int(jax.lax.map(one, lit.reshape(nc, Lc, 3)).max())
    bucket = 1
    while bucket < k:
        bucket *= 2
    return min(bucket, accel.num_clusters)


def morton_order_faces(v: np.ndarray, f: np.ndarray) -> np.ndarray:
    """Faces reordered by centroid Morton code (host-side, between steps).

    Spatially-compact face tiles are what make the Pallas occlusion
    kernel's broad phase effective: raster-ordered height-field tiles
    span the whole mesh and every tile is a candidate for every ray
    block (measured 100% pass rate); Morton-ordered tiles are ~patch-
    shaped and most blocks keep only a handful of candidates.  The
    renderer's MC estimate changes (sampling keys are per face slot) but
    its expectation does not.
    """
    v = np.asarray(v)
    f = np.asarray(f)
    if f.shape[0] < 2:
        return f
    cent = (v[f[:, 0]] + v[f[:, 1]] + v[f[:, 2]]) / 3.0
    lo = cent.min(axis=0)
    span = np.maximum(cent.max(axis=0) - lo, 1e-12)
    codes = _morton3((cent - lo) / span)
    return f[np.argsort(codes, kind="stable")]


def permute_mesh(mesh, accel: VisibilityAccel):
    """Mesh view with the face axis in Morton cluster order (padding slots
    invalidated).  Downstream chunk kernels operate on this view; face-
    indexed outputs come back in permuted order (api un-permutes)."""
    return mesh._replace(
        f=mesh.f[accel.perm],
        f_valid=mesh.f_valid[accel.perm] & accel.slot_valid,
    )


def cluster_triangle_soup(v, f_permuted, f_valid_permuted,
                          num_clusters: int):
    """Per-cluster triangle data [C+1, CLUSTER_SIZE, 10]: p1|e1|e2|valid
    for an ALREADY-PERMUTED face array; the extra last cluster is
    all-invalid (the 'none' id C in cluster lists gathers it)."""
    p1 = v[f_permuted[:, 0]]
    e1 = v[f_permuted[:, 1]] - p1
    e2 = v[f_permuted[:, 2]] - p1
    val = f_valid_permuted.astype(p1.dtype)[:, None]
    soup = jnp.concatenate([p1, e1, e2, val], axis=1)   # [Fp, 10]
    soup = soup.reshape(num_clusters, CLUSTER_SIZE, 10)
    return jnp.concatenate(
        [soup, jnp.zeros((1, CLUSTER_SIZE, 10), soup.dtype)], axis=0
    )


def mt_coefficients(soup):
    """Möller–Trumbore as an MXU matmul: per-face coefficient matrix.

    MT's quantities are bilinear in per-ray and per-face data:
        det   = d · (e2 x e1)
        u_num = (o x d) · e2  -  d · (e2 x p1)
        v_num = -(o x d) · e1 +  d · (e1 x p1)
        t_num = o · (e1 x e2) -  p1 · (e1 x e2)
    so with the per-ray feature vector phi = [d, o x d, o, 1] (10) and a
    per-face 10x4 block, ALL of (det, u_num, v_num, t_num) for a
    (ray-block x face-tile) come from ONE matmul phi @ B — the systolic
    array does the ray casting; only the sign tests stay on the VPU.
    The sign tests avoid the divides: u >= 0 <=> u_num*det >= 0, etc.

    soup: [..., CS, 10] (p1|e1|e2|valid) -> B [..., 10, 4*CS] plus the
    valid plane [..., CS]."""
    p1 = soup[..., 0:3]
    e1 = soup[..., 3:6]
    e2 = soup[..., 6:9]
    val = soup[..., 9]
    n2 = jnp.cross(e2, e1)          # det row block (d)
    m1 = jnp.cross(e2, p1)
    k1 = jnp.cross(e1, p1)
    n12 = -n2                       # e1 x e2
    zeros = jnp.zeros_like(p1)
    zcol = jnp.zeros_like(val)
    # B rows: [d(3), oxd(3), o(3), 1] ; columns 4 per face
    b_det = jnp.concatenate([n2, zeros, zeros, zcol[..., None]], axis=-1)
    b_u = jnp.concatenate([-m1, e2, zeros, zcol[..., None]], axis=-1)
    b_v = jnp.concatenate([k1, -e1, zeros, zcol[..., None]], axis=-1)
    b_t = jnp.concatenate(
        [zeros, zeros, n12, -jnp.sum(p1 * n12, -1, keepdims=True)], axis=-1
    )
    B = jnp.stack([b_det, b_u, b_v, b_t], axis=-2)  # [..., CS, 4, 10]
    CS = soup.shape[-2]
    B = jnp.swapaxes(B.reshape(B.shape[:-3] + (CS * 4, 10)), -1, -2)
    return B, val                                    # [..., 10, CS*4]


def _mt_matmul_blocked(o, d, t_min, t_cut, B, val, slot_base, self_slot,
                       precision):
    """occ contribution [..., S] from one face tile via the matmul MT.

    o,d: [..., S, 3]; B: [..., 10, CS*4]; val/slot_base: [..., CS]."""
    c = jnp.cross(o, d)
    ones = jnp.ones_like(o[..., :1])
    phi = jnp.concatenate([d, c, o, ones], axis=-1)          # [..., S, 10]
    out = jnp.matmul(phi, B, precision=precision)            # [..., S, CS*4]
    CS = val.shape[-1]
    out = out.reshape(out.shape[:-1] + (CS, 4))
    det = out[..., 0]
    u_num = out[..., 1]
    v_num = out[..., 2]
    t_num = out[..., 3]
    # sign-safe tests (no divides): x = x_num/det, det != 0
    ok_det = jnp.abs(det) > 1e-12
    u_ok = u_num * det >= 0.0
    v_ok = v_num * det >= 0.0
    uv_ok = (u_num + v_num - det) * det <= 0.0
    t_lo = (t_num - t_min * det) * det > 0.0
    t_hi = (t_num - t_cut[..., None] * det) * det < 0.0
    blocked = (
        ok_det & u_ok & v_ok & uv_ok & t_lo & t_hi
        & (val[..., None, :] != 0.0)
        & (slot_base[..., None, :] != self_slot[..., None])
    )
    return jnp.any(blocked, axis=-1)


def segment_occluded_culled(o, d, t_self, self_slot, soup, group_lists,
                            num_clusters: int, t_rel=1e-4, t_min=1e-6,
                            group_chunk: int = 64, narrow: str = "mxu"):
    """Occlusion with broad-phase culling.

    Rays come GROUPED: same leading [G_total, S] layout for o/d/t_self
    (S rays per (source, target-cluster) group), with that group's active
    occluder-cluster list group_lists [G_total, K].  self_slot [G_total, S]
    is each ray's global PERMUTED face slot (for self-exclusion).  soup is
    cluster_triangle_soup's output.

    narrow: 'mxu' runs Möller–Trumbore as one systolic-array matmul per
    (group, cluster) (mt_coefficients); 'vpu' is the elementwise cross-
    product formulation (bit-matches geometry.intersect.segment_occluded).
    """
    G_total, S = t_self.shape
    K = group_lists.shape[1]
    n_gc = max(1, math.ceil(G_total / group_chunk))
    pad = n_gc * group_chunk - G_total

    def padg(x, fill=0.0):
        if not pad:
            return x
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    o_p = padg(o)
    d_p = padg(d, 1.0)
    t_p = padg(t_self)
    s_p = padg(self_slot)
    l_p = padg(group_lists, num_clusters)

    if narrow == "mxu":
        B_all, val_all = mt_coefficients(soup)      # [C+1,10,CS*4], [C+1,CS]
        cs_iota = jnp.arange(CLUSTER_SIZE, dtype=jnp.int32)

    def per_chunk(args):
        oc, dc, tc, sc, lc = args    # [G,S,3] [G,S,3] [G,S] [G,S] [G,K]
        t_cut = tc * (1.0 - t_rel)
        occ = tc != tc               # all-False, vma-clean

        for k in range(K):
            cid = lc[:, k]                              # [G]
            slot_base = cid[:, None] * CLUSTER_SIZE + cs_iota[None, :] \
                if narrow == "mxu" else None
            if narrow == "mxu":
                occ = occ | _mt_matmul_blocked(
                    oc, dc, t_min, t_cut, B_all[cid], val_all[cid],
                    slot_base, sc, jax.lax.Precision.HIGHEST,
                )
                continue
            tri = soup[cid]                             # [G, CS, 10]
            p1 = tri[:, :, 0:3][:, None, :, :]          # [G,1,CS,3]
            e1 = tri[:, :, 3:6][:, None, :, :]
            e2 = tri[:, :, 6:9][:, None, :, :]
            tval = tri[:, :, 9][:, None, :]             # [G,1,CS]

            dd = dc[:, :, None, :]                      # [G,S,1,3]
            oo = oc[:, :, None, :]
            pvec = jnp.cross(dd, e2)
            det = jnp.sum(e1 * pvec, axis=-1)           # [G,S,CS]
            inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvec = oo - p1
            u = jnp.sum(tvec * pvec, axis=-1) * inv
            qvec = jnp.cross(tvec, e1)
            w = jnp.sum(dd * qvec, axis=-1) * inv
            t = jnp.sum(e2 * qvec, axis=-1) * inv

            slot = (cid[:, None] * CLUSTER_SIZE
                    + jnp.arange(CLUSTER_SIZE)[None, :])[:, None, :]
            blocked = (
                (jnp.abs(det) > 1e-12)
                & (u >= 0.0) & (w >= 0.0) & (u + w <= 1.0)
                & (tval != 0.0)
                & (t > t_min) & (t < t_cut[:, :, None])
                & (slot != sc[:, :, None])
            )
            occ = occ | jnp.any(blocked, axis=-1)
        return occ

    occ = jax.lax.map(
        per_chunk,
        (
            o_p.reshape(n_gc, group_chunk, S, 3),
            d_p.reshape(n_gc, group_chunk, S, 3),
            t_p.reshape(n_gc, group_chunk, S),
            s_p.reshape(n_gc, group_chunk, S),
            l_p.reshape(n_gc, group_chunk, K),
        ),
    ).reshape(-1, S)[:G_total]
    return occ
