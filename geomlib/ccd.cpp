// geomlib: collision-safe vertex integration via continuous collision
// detection (CCD).
//
// Plays the role of El Topo's el_topo_integrate (reference
// el_topo_api/c_el_topo_api.cpp:75-101): apply a proposed vertex update
// old_v -> new_v to a triangle mesh without letting the surface pass
// through itself.  El Topo does full cloth-style CCD (Bridson et al. 2002 /
// Provot 1995): linearly-moving primitives, vertex-triangle and edge-edge
// first-contact times from the cubic coplanarity condition.  This is the
// same scheme, with repeated-pass displacement scaling instead of impulse
// response: any vertex involved in a first contact at time t* has its
// remaining displacement scaled to 0.9*t*, and passes repeat until no
// contact remains (or max_passes).
//
// Host-side, called between jitted steps.  C ABI, ctypes-friendly.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct V3 {
  double x = 0, y = 0, z = 0;
};
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator*(V3 a, double s) { return {a.x * s, a.y * s, a.z * s}; }
static inline double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline double norm(V3 a) { return std::sqrt(dot(a, a)); }
static inline V3 lerp(V3 a, V3 d, double t) { return a + d * t; }

// ---- cubic coplanarity -----------------------------------------------------
//
// For linearly moving points, the scalar triple product
//   g(t) = dot(cross(u0 + t*u1, v0 + t*v1), w0 + t*w1)
// is cubic in t.  Expand the coefficients directly.
struct Cubic {
  double c0, c1, c2, c3;
  double eval(double t) const { return ((c3 * t + c2) * t + c1) * t + c0; }
};

static Cubic triple_product_cubic(V3 u0, V3 u1, V3 v0, V3 v1, V3 w0, V3 w1) {
  V3 a = cross(u0, v0);
  V3 b = cross(u0, v1) + cross(u1, v0);
  V3 c = cross(u1, v1);
  return {dot(a, w0), dot(a, w1) + dot(b, w0), dot(b, w1) + dot(c, w0),
          dot(c, w1)};
}

// All roots of g in (0, 1], by sign-change bracketing + bisection.  The
// coplanarity function of a small integration step is tame; 16 probes and
// 48 bisection steps resolve t to ~1e-15 of the interval.
static int cubic_roots01(const Cubic& g, double* roots) {
  constexpr int kProbes = 16;
  int n = 0;
  double t0 = 0.0, g0 = g.eval(0.0);
  for (int i = 1; i <= kProbes; ++i) {
    double t1 = double(i) / kProbes;
    double g1 = g.eval(t1);
    if ((g0 < 0.0) != (g1 < 0.0) || g1 == 0.0) {
      double lo = t0, hi = t1;
      for (int it = 0; it < 48; ++it) {
        double mid = 0.5 * (lo + hi);
        if ((g.eval(lo) < 0.0) != (g.eval(mid) < 0.0)) hi = mid;
        else lo = mid;
      }
      roots[n++] = 0.5 * (lo + hi);
      if (n == 3) return n;
    }
    t0 = t1;
    g0 = g1;
  }
  return n;
}

// ---- narrow phase ----------------------------------------------------------

// First time t in (0,1] the moving point p is inside (within eps of) the
// moving triangle (a,b,c); -1 if none.  Positions x(t) = x + t*dx.
static double ccd_point_triangle(V3 p, V3 dp, V3 a, V3 da, V3 b, V3 db, V3 c,
                                 V3 dc, double eps) {
  // coplanarity: ((b-a) x (c-a)) . (p-a) = 0
  Cubic g = triple_product_cubic(b - a, db - da, c - a, dc - da, p - a,
                                 dp - da);
  double roots[3];
  int n = cubic_roots01(g, roots);
  for (int i = 0; i < n; ++i) {
    double t = roots[i];
    if (t <= 0.0 || t > 1.0) continue;
    V3 pt = lerp(p, dp, t), at = lerp(a, da, t), bt = lerp(b, db, t),
       ct = lerp(c, dc, t);
    // barycentric containment with tolerance eps (absolute, in area ratio)
    V3 e1 = bt - at, e2 = ct - at, q = pt - at;
    double d11 = dot(e1, e1), d12 = dot(e1, e2), d22 = dot(e2, e2);
    double det = d11 * d22 - d12 * d12;
    if (det <= 1e-30) continue;
    double q1 = dot(q, e1), q2 = dot(q, e2);
    double u = (d22 * q1 - d12 * q2) / det;
    double v = (d11 * q2 - d12 * q1) / det;
    if (u >= -eps && v >= -eps && u + v <= 1.0 + eps) return t;
  }
  return -1.0;
}

// First time t in (0,1] moving segments (p1,p2) and (p3,p4) intersect;
// -1 if none.
static double ccd_edge_edge(V3 p1, V3 d1, V3 p2, V3 d2, V3 p3, V3 d3, V3 p4,
                            V3 d4, double eps) {
  // coplanarity: ((p2-p1) x (p4-p3)) . (p3-p1) = 0
  Cubic g = triple_product_cubic(p2 - p1, d2 - d1, p4 - p3, d4 - d3, p3 - p1,
                                 d3 - d1);
  double roots[3];
  int n = cubic_roots01(g, roots);
  for (int i = 0; i < n; ++i) {
    double t = roots[i];
    if (t <= 0.0 || t > 1.0) continue;
    V3 a = lerp(p1, d1, t), b = lerp(p2, d2, t), c = lerp(p3, d3, t),
       d = lerp(p4, d4, t);
    // closest-parameter solve on the (coplanar) segment pair
    V3 u = b - a, v = d - c, w = a - c;
    double uu = dot(u, u), uv = dot(u, v), vv = dot(v, v);
    double uw = dot(u, w), vw = dot(v, w);
    double det = uu * vv - uv * uv;
    double s, r;
    if (det <= 1e-30) {  // parallel: project endpoints
      s = 0.0;
      r = vv > 1e-30 ? vw / vv : 0.0;
    } else {
      s = (uv * vw - vv * uw) / det;
      r = (uu * vw - uv * uw) / det;
    }
    s = std::min(1.0, std::max(0.0, s));
    r = std::min(1.0, std::max(0.0, r));
    V3 pa = a + u * s, pb = c + v * r;
    double gap = norm(pa - pb);
    double scale = std::max({1e-12, norm(u), norm(v)});
    if (gap <= eps * scale + 1e-12) return t;
  }
  return -1.0;
}

// ---- broad phase: uniform grid over swept AABBs ------------------------------

struct AABB {
  V3 lo{1e300, 1e300, 1e300}, hi{-1e300, -1e300, -1e300};
  void add(V3 p) {
    lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y); lo.z = std::min(lo.z, p.z);
    hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y); hi.z = std::max(hi.z, p.z);
  }
  bool overlaps(const AABB& o) const {
    return lo.x <= o.hi.x && o.lo.x <= hi.x && lo.y <= o.hi.y &&
           o.lo.y <= hi.y && lo.z <= o.hi.z && o.lo.z <= hi.z;
  }
};

struct Grid {
  double cell;
  V3 origin;
  std::unordered_map<uint64_t, std::vector<int>> cells;

  static uint64_t key(int64_t i, int64_t j, int64_t k) {
    auto h = [](int64_t x) { return uint64_t(x + (1 << 20)); };
    return (h(i) << 42) ^ (h(j) << 21) ^ h(k);
  }
  void insert(const AABB& b, int id) {
    int64_t i0 = int64_t(std::floor((b.lo.x - origin.x) / cell));
    int64_t i1 = int64_t(std::floor((b.hi.x - origin.x) / cell));
    int64_t j0 = int64_t(std::floor((b.lo.y - origin.y) / cell));
    int64_t j1 = int64_t(std::floor((b.hi.y - origin.y) / cell));
    int64_t k0 = int64_t(std::floor((b.lo.z - origin.z) / cell));
    int64_t k1 = int64_t(std::floor((b.hi.z - origin.z) / cell));
    for (int64_t i = i0; i <= i1; ++i)
      for (int64_t j = j0; j <= j1; ++j)
        for (int64_t k = k0; k <= k1; ++k) cells[key(i, j, k)].push_back(id);
  }
  void query(const AABB& b, std::vector<int>& out) const {
    int64_t i0 = int64_t(std::floor((b.lo.x - origin.x) / cell));
    int64_t i1 = int64_t(std::floor((b.hi.x - origin.x) / cell));
    int64_t j0 = int64_t(std::floor((b.lo.y - origin.y) / cell));
    int64_t j1 = int64_t(std::floor((b.hi.y - origin.y) / cell));
    int64_t k0 = int64_t(std::floor((b.lo.z - origin.z) / cell));
    int64_t k1 = int64_t(std::floor((b.hi.z - origin.z) / cell));
    out.clear();
    for (int64_t i = i0; i <= i1; ++i)
      for (int64_t j = j0; j <= j1; ++j)
        for (int64_t k = k0; k <= k1; ++k) {
          auto it = cells.find(key(i, j, k));
          if (it != cells.end())
            out.insert(out.end(), it->second.begin(), it->second.end());
        }
    std::sort(out.begin(), out.end());
    out.erase(std::unique(out.begin(), out.end()), out.end());
  }
};

}  // namespace

namespace {

// Collision-safe integration old_v -> new_v over mesh f.  Writes the
// integrated positions to out_v.  Returns the number of passes that found
// at least one collision (0 = the full step was collision-free).
//
// `rep` (nullable, length nv) maps each vertex to its merge representative:
// primitives whose vertex sets meet UNDER rep are treated as adjacent and
// excluded from contact testing.  An edge collapse moves both endpoints to
// a common target, so the dropped vertex lands exactly ON the kept
// vertex's incident faces at t=1 — a topological coincidence, not a
// collision.  Without the exclusion every collapse on a curved surface
// self-rejects (the mesh can refine but never coarsen).
int integrate_ccd_impl(const double* old_v_in, const double* new_v_in,
                       int64_t nv, const int32_t* f_in, int64_t nf,
                       const int32_t* rep, double* out_v,
                       int32_t max_passes) {
  std::vector<V3> p0(nv), disp(nv);
  for (int64_t i = 0; i < nv; ++i) {
    p0[i] = {old_v_in[3 * i], old_v_in[3 * i + 1], old_v_in[3 * i + 2]};
    V3 p1 = {new_v_in[3 * i], new_v_in[3 * i + 1], new_v_in[3 * i + 2]};
    disp[i] = p1 - p0[i];
  }
  std::vector<std::array<int32_t, 3>> tri(nf);
  for (int64_t i = 0; i < nf; ++i)
    tri[i] = {f_in[3 * i], f_in[3 * i + 1], f_in[3 * i + 2]};

  // unique edges with one incident-face representative for adjacency tests
  std::unordered_map<uint64_t, int> eid;
  std::vector<std::array<int32_t, 2>> edges;
  for (auto& t : tri)
    for (int s = 0; s < 3; ++s) {
      int32_t a = t[s], b = t[(s + 1) % 3];
      uint64_t k = a < b ? (uint64_t(a) << 32) | uint64_t(b)
                         : (uint64_t(b) << 32) | uint64_t(a);
      if (eid.emplace(k, (int)edges.size()).second)
        edges.push_back({std::min(a, b), std::max(a, b)});
    }
  int64_t ne = (int64_t)edges.size();

  // characteristic length: mean edge length
  double mean_edge = 0.0;
  for (auto& e : edges) mean_edge += norm(p0[e[1]] - p0[e[0]]);
  mean_edge = ne ? mean_edge / double(ne) : 1.0;
  if (mean_edge <= 0.0) mean_edge = 1.0;
  const double bary_eps = 1e-8;

  auto R = [&](int32_t x) { return rep ? rep[x] : x; };

  std::vector<double> s(nv, 1.0);  // per-vertex displacement scale
  int collision_passes = 0;

  for (int pass = 0; pass < max_passes; ++pass) {
    // scaled displacement this pass
    std::vector<V3> d(nv);
    double max_disp = 0.0;
    for (int64_t i = 0; i < nv; ++i) {
      d[i] = disp[i] * s[i];
      max_disp = std::max(max_disp, norm(d[i]));
    }
    if (max_disp < 1e-15) break;

    Grid grid;
    grid.cell = std::max(mean_edge, max_disp);
    grid.origin = p0.empty() ? V3{} : p0[0];

    // swept triangle AABBs into the grid
    std::vector<AABB> tbox(nf);
    for (int64_t i = 0; i < nf; ++i) {
      for (int sl = 0; sl < 3; ++sl) {
        int32_t vi = tri[i][sl];
        tbox[i].add(p0[vi]);
        tbox[i].add(p0[vi] + d[vi]);
      }
      grid.insert(tbox[i], (int)i);
    }
    // swept edge AABBs into a second grid
    Grid egrid;
    egrid.cell = grid.cell;
    egrid.origin = grid.origin;
    std::vector<AABB> ebox(ne);
    for (int64_t i = 0; i < ne; ++i) {
      for (int sl = 0; sl < 2; ++sl) {
        int32_t vi = edges[i][sl];
        ebox[i].add(p0[vi]);
        ebox[i].add(p0[vi] + d[vi]);
      }
      egrid.insert(ebox[i], (int)i);
    }

    bool hit_any = false;
    std::vector<double> t_hit(nv, 2.0);  // earliest contact per vertex
    std::vector<int> cand;

    // vertex - triangle
    for (int64_t vi = 0; vi < nv; ++vi) {
      AABB vb;
      vb.add(p0[vi]);
      vb.add(p0[vi] + d[vi]);
      grid.query(vb, cand);
      for (int fi : cand) {
        auto& t = tri[fi];
        if (t[0] == vi || t[1] == vi || t[2] == vi) continue;
        if (rep && (R(t[0]) == R((int32_t)vi) || R(t[1]) == R((int32_t)vi)
                    || R(t[2]) == R((int32_t)vi)))
          continue;
        if (!vb.overlaps(tbox[fi])) continue;
        double tc = ccd_point_triangle(p0[vi], d[vi], p0[t[0]], d[t[0]],
                                       p0[t[1]], d[t[1]], p0[t[2]], d[t[2]],
                                       bary_eps);
        if (tc >= 0.0) {
          hit_any = true;
          t_hit[vi] = std::min(t_hit[vi], tc);
          for (int sl = 0; sl < 3; ++sl)
            t_hit[t[sl]] = std::min(t_hit[t[sl]], tc);
        }
      }
    }

    // edge - edge
    for (int64_t ei = 0; ei < ne; ++ei) {
      egrid.query(ebox[ei], cand);
      int32_t a = edges[ei][0], b = edges[ei][1];
      for (int ej : cand) {
        if (ej <= ei) continue;  // unordered pairs once
        int32_t c = edges[ej][0], dd = edges[ej][1];
        if (a == c || a == dd || b == c || b == dd) continue;
        if (rep && (R(a) == R(c) || R(a) == R(dd) || R(b) == R(c)
                    || R(b) == R(dd)))
          continue;
        if (!ebox[ei].overlaps(ebox[ej])) continue;
        double tc = ccd_edge_edge(p0[a], d[a], p0[b], d[b], p0[c], d[c],
                                  p0[dd], d[dd], bary_eps);
        if (tc >= 0.0) {
          hit_any = true;
          t_hit[a] = std::min(t_hit[a], tc);
          t_hit[b] = std::min(t_hit[b], tc);
          t_hit[c] = std::min(t_hit[c], tc);
          t_hit[dd] = std::min(t_hit[dd], tc);
        }
      }
    }

    if (!hit_any) break;
    ++collision_passes;
    // Stop a proximity margin short of contact (El Topo keeps a minimum
    // separation for the same reason): without the floor, repeated pushes
    // grind the gap to zero and later surgery (collapse midpoints, relax)
    // operates below the collision tolerances.
    const double h_margin = 1e-3 * mean_edge;
    for (int64_t i = 0; i < nv; ++i) {
      if (t_hit[i] > 1.0) continue;
      double nd = norm(d[i]);
      double back = nd > 1e-30 ? h_margin / nd : 0.0;
      double tstop = std::min(0.9 * t_hit[i], t_hit[i] - back);
      s[i] *= std::max(0.0, tstop);
    }
  }

  for (int64_t i = 0; i < nv; ++i) {
    V3 p = p0[i] + disp[i] * s[i];
    out_v[3 * i] = p.x;
    out_v[3 * i + 1] = p.y;
    out_v[3 * i + 2] = p.z;
  }
  return collision_passes;
}

}  // namespace

extern "C" {

int geomlib_integrate_ccd(const double* old_v_in, const double* new_v_in,
                          int64_t nv, const int32_t* f_in, int64_t nf,
                          double* out_v, int32_t max_passes) {
  return integrate_ccd_impl(old_v_in, new_v_in, nv, f_in, nf, nullptr,
                            out_v, max_passes);
}

// Variant with a merge-representative map (see integrate_ccd_impl).
int geomlib_integrate_ccd_rep(const double* old_v_in, const double* new_v_in,
                              int64_t nv, const int32_t* f_in, int64_t nf,
                              const int32_t* rep, double* out_v,
                              int32_t max_passes) {
  return integrate_ccd_impl(old_v_in, new_v_in, nv, f_in, nf, rep, out_v,
                            max_passes);
}

}  // extern "C"
