// geomlib: native mesh surgery for the TPU NLOS framework.
//
// Isotropic remeshing (Botsch-Kobbelt: split / collapse / flip / tangential
// relax, border-protected) — the C++ production implementation of
// nlos_surface_optimization_tpu/geometry/remesh.py, playing the role the
// reference's CGAL PMP::isotropic_remeshing binding plays
// (cgal_api/c_cgal_api.cpp:198-249).  Host-side, called between jitted
// steps; the Python twin defines the semantics and the tests compare
// invariants (edge-length targets, manifoldness, surface distance).
//
// C ABI, ctypes-friendly: caller preallocates outputs (the reference uses
// the same contract, rendering.py:72-93).

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <set>
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

using Tri = std::array<int64_t, 3>;

}  // namespace

// ccd.cpp (same shared object): collision-safe integration old->new.
extern "C" int geomlib_integrate_ccd(const double* old_v_in,
                                     const double* new_v_in, int64_t nv,
                                     const int32_t* f_in, int64_t nf,
                                     double* out_v, int32_t max_passes);
// Variant excluding contacts between primitives merging under `rep`
// (edge collapses: the dropped vertex legitimately lands ON the kept
// vertex's incident faces at t=1).
extern "C" int geomlib_integrate_ccd_rep(const double* old_v_in,
                                         const double* new_v_in, int64_t nv,
                                         const int32_t* f_in, int64_t nf,
                                         const int32_t* rep, double* out_v,
                                         int32_t max_passes);

namespace {

static inline uint64_t ekey(int64_t a, int64_t b) {
  if (a > b) std::swap(a, b);
  return (uint64_t(a) << 32) | uint64_t(b);
}

struct Mesh {
  std::vector<V3> v;
  std::vector<Tri> f;
};

static std::vector<int> border_flags(const Mesh& m) {
  std::unordered_map<uint64_t, int> count;
  count.reserve(m.f.size() * 3);
  for (auto& t : m.f)
    for (int s = 0; s < 3; ++s) count[ekey(t[s], t[(s + 1) % 3])]++;
  std::vector<int> border(m.v.size(), 0);
  for (auto& t : m.f)
    for (int s = 0; s < 3; ++s) {
      int64_t a = t[s], b = t[(s + 1) % 3];
      if (count[ekey(a, b)] == 1) border[a] = border[b] = 1;
    }
  return border;
}

// ---- split -----------------------------------------------------------------

static void split_long_edges(Mesh& m, double high) {
  for (int guard = 0; guard < 50; ++guard) {
    // edge -> (face, slot) uses
    std::unordered_map<uint64_t, std::vector<std::pair<int, int>>> em;
    em.reserve(m.f.size() * 3);
    for (int i = 0; i < (int)m.f.size(); ++i)
      for (int s = 0; s < 3; ++s)
        em[ekey(m.f[i][s], m.f[i][(s + 1) % 3])].push_back({i, s});

    struct LE { double len; int64_t a, b; };
    std::vector<LE> longe;
    for (auto& kv : em) {
      int64_t a = int64_t(kv.first >> 32), b = int64_t(kv.first & 0xffffffffu);
      double L = norm(m.v[a] - m.v[b]);
      if (L > high) longe.push_back({L, a, b});
    }
    if (longe.empty()) return;
    std::sort(longe.begin(), longe.end(),
              [](const LE& x, const LE& y) { return x.len > y.len; });

    std::vector<char> dead(m.f.size(), 0);
    std::vector<Tri> fresh;
    for (auto& e : longe) {
      auto it = em.find(ekey(e.a, e.b));
      bool skip = false;
      for (auto& u : it->second)
        if (dead[u.first]) { skip = true; break; }
      if (skip) continue;
      int64_t mid = (int64_t)m.v.size();
      m.v.push_back((m.v[e.a] + m.v[e.b]) * 0.5);
      for (auto& u : it->second) {
        Tri t = m.f[u.first];
        int64_t ta = t[u.second], tb = t[(u.second + 1) % 3],
                c = t[(u.second + 2) % 3];
        dead[u.first] = 1;
        fresh.push_back({ta, mid, c});
        fresh.push_back({mid, tb, c});
      }
    }
    std::vector<Tri> kept;
    kept.reserve(m.f.size() + fresh.size());
    for (int i = 0; i < (int)m.f.size(); ++i)
      if (!dead[i]) kept.push_back(m.f[i]);
    kept.insert(kept.end(), fresh.begin(), fresh.end());
    m.f = std::move(kept);
  }
}

// ---- collapse --------------------------------------------------------------

struct DSU {
  std::vector<int64_t> p;
  explicit DSU(size_t n) : p(n) { for (size_t i = 0; i < n; ++i) p[i] = i; }
  int64_t find(int64_t x) {
    while (p[x] != x) { p[x] = p[p[x]]; x = p[x]; }
    return x;
  }
};

// ---- collapse collision guard ----------------------------------------------
// El Topo rejects any remesh operation that would introduce a collision or
// proximity violation (its remesher runs the full collision pipeline per
// operation).  Collapses move two vertices to a common position; in a
// (near-)contact region that motion can sweep through the opposing sheet.
// Guard: reject a collapse when either vertex's path to the target crosses
// a non-incident face, or the target lands within a proximity margin of
// one.  Faces are looked up in a uniform grid built once per pass (query
// boxes are inflated by the maximum collapse motion, so earlier accepted
// collapses stay covered).

struct FaceGrid {
  double cell = 1.0;
  V3 origin{};
  std::unordered_map<uint64_t, std::vector<int>> cells;

  static uint64_t key(int64_t x, int64_t y, int64_t z) {
    return (uint64_t(uint32_t(x)) * 73856093u)
         ^ (uint64_t(uint32_t(y)) * 19349663u)
         ^ (uint64_t(uint32_t(z)) * 83492791u);
  }
  void insert(const V3& lo, const V3& hi, int id) {
    int64_t x0 = (int64_t)std::floor((lo.x - origin.x) / cell);
    int64_t y0 = (int64_t)std::floor((lo.y - origin.y) / cell);
    int64_t z0 = (int64_t)std::floor((lo.z - origin.z) / cell);
    int64_t x1 = (int64_t)std::floor((hi.x - origin.x) / cell);
    int64_t y1 = (int64_t)std::floor((hi.y - origin.y) / cell);
    int64_t z1 = (int64_t)std::floor((hi.z - origin.z) / cell);
    for (int64_t x = x0; x <= x1; ++x)
      for (int64_t y = y0; y <= y1; ++y)
        for (int64_t z = z0; z <= z1; ++z)
          cells[key(x, y, z)].push_back(id);
  }
  void query(const V3& lo, const V3& hi, std::vector<int>& out) const {
    out.clear();
    int64_t x0 = (int64_t)std::floor((lo.x - origin.x) / cell);
    int64_t y0 = (int64_t)std::floor((lo.y - origin.y) / cell);
    int64_t z0 = (int64_t)std::floor((lo.z - origin.z) / cell);
    int64_t x1 = (int64_t)std::floor((hi.x - origin.x) / cell);
    int64_t y1 = (int64_t)std::floor((hi.y - origin.y) / cell);
    int64_t z1 = (int64_t)std::floor((hi.z - origin.z) / cell);
    for (int64_t x = x0; x <= x1; ++x)
      for (int64_t y = y0; y <= y1; ++y)
        for (int64_t z = z0; z <= z1; ++z) {
          auto it = cells.find(key(x, y, z));
          if (it == cells.end()) continue;
          out.insert(out.end(), it->second.begin(), it->second.end());
        }
    std::sort(out.begin(), out.end());
    out.erase(std::unique(out.begin(), out.end()), out.end());
  }
};

static bool segment_hits_tri(const V3& o, const V3& q, const V3& a,
                             const V3& b, const V3& c) {
  V3 d = q - o;
  V3 e1 = b - a, e2 = c - a;
  V3 pv = cross(d, e2);
  double det = dot(e1, pv);
  if (std::abs(det) < 1e-18) return false;
  double inv = 1.0 / det;
  V3 tv = o - a;
  double u = dot(tv, pv) * inv;
  if (u < 0 || u > 1) return false;
  V3 qv = cross(tv, e1);
  double v = dot(d, qv) * inv;
  if (v < 0 || u + v > 1) return false;
  double t = dot(e2, qv) * inv;
  return t > 1e-12 && t < 1.0 - 1e-12;
}

// Run full swept CCD (vertex-face + edge-edge, ccd.cpp) for a proposed
// vertex motion on the CURRENT topology and return the safe positions.
static std::vector<V3> ccd_limit(const std::vector<V3>& before,
                                 const std::vector<V3>& proposed,
                                 const std::vector<Tri>& faces,
                                 const std::vector<int32_t>* rep = nullptr) {
  size_t V = before.size();
  std::vector<double> o(3 * V), n(3 * V), out(3 * V);
  for (size_t i = 0; i < V; ++i) {
    o[3 * i] = before[i].x; o[3 * i + 1] = before[i].y;
    o[3 * i + 2] = before[i].z;
    n[3 * i] = proposed[i].x; n[3 * i + 1] = proposed[i].y;
    n[3 * i + 2] = proposed[i].z;
  }
  std::vector<int32_t> ff(3 * faces.size());
  for (size_t i = 0; i < faces.size(); ++i)
    for (int s = 0; s < 3; ++s) ff[3 * i + s] = (int32_t)faces[i][s];
  geomlib_integrate_ccd_rep(o.data(), n.data(), (int64_t)V, ff.data(),
                            (int64_t)faces.size(),
                            rep ? rep->data() : nullptr, out.data(), 8);
  std::vector<V3> res(V);
  for (size_t i = 0; i < V; ++i)
    res[i] = {out[3 * i], out[3 * i + 1], out[3 * i + 2]};
  return res;
}

// Collapse as a batch: pick a vertex-disjoint set of short edges, propose
// the joint motion (both endpoints -> target), run FULL swept CCD on it,
// and only merge the collapses whose endpoints actually reached their
// target.  A collapse drags every incident face, so per-candidate
// path/proximity tests are not enough — only swept vertex-face + edge-edge
// CCD catches a dragged face sweeping through the opposing sheet.  This is
// El Topo's per-operation collision safety (c_el_topo_api.cpp:22-44
// enables its collision pipeline) realized batch-wise; rejected collapses
// leave their vertices untouched.
static double tri_signed_vol(const V3& a, const V3& b, const V3& c);

static void collapse_short_edges(Mesh& m, double low, double high,
                                 const std::vector<int>& protect,
                                 double max_vol = 1e300) {
  size_t V = m.v.size();
  std::vector<std::unordered_set<int64_t>> nbr(V);
  for (auto& t : m.f)
    for (int s = 0; s < 3; ++s) {
      nbr[t[s]].insert(t[(s + 1) % 3]);
      nbr[t[(s + 1) % 3]].insert(t[s]);
    }
  std::vector<std::vector<int>> finc(V);
  for (int i = 0; i < (int)m.f.size(); ++i)
    for (int s = 0; s < 3; ++s) finc[m.f[i][s]].push_back(i);

  struct Cand { double L; int64_t a, b; };
  std::vector<Cand> cands;
  {
    std::set<uint64_t> edges;
    for (auto& t : m.f)
      for (int s = 0; s < 3; ++s) edges.insert(ekey(t[s], t[(s + 1) % 3]));
    for (uint64_t key : edges) {
      int64_t a = int64_t(key >> 32), b = int64_t(key & 0xffffffffu);
      if (protect[a] && protect[b]) continue;
      double L = norm(m.v[a] - m.v[b]);
      if (L < low) cands.push_back({L, a, b});
    }
  }
  std::sort(cands.begin(), cands.end(),
            [](const Cand& x, const Cand& y) { return x.L < y.L; });

  struct Acc { int64_t keep, drop; V3 pos; };
  std::vector<Acc> accepted;
  std::vector<char> used(V, 0);
  for (auto& c : cands) {
    int64_t a = c.a, b = c.b;
    if (used[a] || used[b]) continue;
    int64_t keep, drop;
    V3 pos;
    if (protect[a]) { keep = a; drop = b; pos = m.v[a]; }
    else if (protect[b]) { keep = b; drop = a; pos = m.v[b]; }
    else { keep = a; drop = b; pos = (m.v[a] + m.v[b]) * 0.5; }

    // no post-collapse edge may exceed `high`
    bool bad = false;
    for (auto nb : {a, b}) {
      for (auto x : nbr[nb]) {
        if (x == a || x == b) continue;
        if (norm(pos - m.v[x]) > high) { bad = true; break; }
      }
      if (bad) break;
    }
    if (bad) continue;
    // simplified link condition: <= 2 shared neighbors
    int sharedCount = 0;
    for (auto x : nbr[a])
      if (x != a && x != b && nbr[b].count(x)) ++sharedCount;
    if (sharedCount > 2) continue;

    // local manifoldness after the remap: simulate the merge over the
    // incident faces and reject on any duplicate directed edge or
    // >2-face undirected edge.  (All faces of a post-merge edge (keep,x)
    // are incident to a or b, and other edges keep their multiplicity,
    // so the local set is sufficient.)  The link condition alone misses
    // this when a and b were joined through an earlier zipper merge.
    {
      std::vector<int> loc = finc[a];
      loc.insert(loc.end(), finc[b].begin(), finc[b].end());
      std::sort(loc.begin(), loc.end());
      loc.erase(std::unique(loc.begin(), loc.end()), loc.end());
      std::unordered_set<uint64_t> dirE;
      std::unordered_map<uint64_t, int> undE;
      bool bad2 = false;
      for (int fi : loc) {
        const Tri& t = m.f[fi];
        bool dead = false;
        for (int s = 0; s < 3; ++s) {
          int64_t p = t[s], q = t[(s + 1) % 3];
          if ((p == a && q == b) || (p == b && q == a)) dead = true;
        }
        if (dead) continue;
        Tri r2;
        for (int s = 0; s < 3; ++s)
          r2[s] = (t[s] == a || t[s] == b) ? keep : t[s];
        for (int s = 0; s < 3; ++s) {
          int64_t p = r2[s], q = r2[(s + 1) % 3];
          uint64_t dk = (uint64_t(p) << 32) | uint64_t(uint32_t(q));
          if (!dirE.insert(dk).second) { bad2 = true; break; }
          if (++undE[ekey(p, q)] > 2) { bad2 = true; break; }
        }
        if (bad2) break;
      }
      if (bad2) continue;
    }

    // per-operation volume-change guard (El Topo m_max_volume_change,
    // c_el_topo_api.cpp:30): local signed volume over incident faces
    if (max_vol < 1e299) {
      std::vector<int> loc = finc[a];
      loc.insert(loc.end(), finc[b].begin(), finc[b].end());
      std::sort(loc.begin(), loc.end());
      loc.erase(std::unique(loc.begin(), loc.end()), loc.end());
      auto pafter = [&](int64_t idx) {
        return (idx == a || idx == b) ? pos : m.v[idx];
      };
      double dv = 0;
      for (int fi : loc) {
        const Tri& t = m.f[fi];
        bool dead = false;
        for (int s = 0; s < 3; ++s) {
          int64_t p = t[s], q = t[(s + 1) % 3];
          if ((p == a && q == b) || (p == b && q == a)) dead = true;
        }
        dv -= tri_signed_vol(m.v[t[0]], m.v[t[1]], m.v[t[2]]);
        if (!dead)
          dv += tri_signed_vol(pafter(t[0]), pafter(t[1]), pafter(t[2]));
      }
      if (std::abs(dv) > max_vol) continue;
    }

    used[a] = used[b] = 1;
    accepted.push_back({keep, drop, pos});
  }
  if (accepted.empty()) return;

  // CCD-validate the batch, then iterate: rejected collapses revert to
  // their STATIC original positions, which changes the motion the accepted
  // set must clear — re-test the accepted-only proposal until the accepted
  // set is stable, so no accepted collapse sweeps through geometry a
  // rejected one left behind.
  const double tol = 1e-9 * low + 1e-14;
  std::vector<char> ok(accepted.size(), 1);
  for (int pass = 0; pass < 8; ++pass) {
    std::vector<V3> proposed = m.v;
    std::vector<int32_t> rep(V);
    for (size_t i = 0; i < V; ++i) rep[i] = (int32_t)i;
    for (size_t k = 0; k < accepted.size(); ++k)
      if (ok[k]) {
        proposed[accepted[k].keep] = accepted[k].pos;
        proposed[accepted[k].drop] = accepted[k].pos;
        rep[accepted[k].drop] = (int32_t)accepted[k].keep;
      }
    std::vector<V3> safe = ccd_limit(m.v, proposed, m.f, &rep);
    bool changed = false;
    for (size_t k = 0; k < accepted.size(); ++k) {
      if (!ok[k]) continue;
      if (norm(safe[accepted[k].keep] - accepted[k].pos) > tol
          || norm(safe[accepted[k].drop] - accepted[k].pos) > tol) {
        ok[k] = 0;
        changed = true;
      }
    }
    if (!changed) break;
  }

  // Global post-remap manifoldness: the JOINT remap of the batch can
  // still create duplicate directed edges or >2-face edges that no
  // single candidate's local simulation shows (two disjoint collapses
  // pinching the same quad).  Simulate the whole batch and iteratively
  // reject collapses whose kept vertex touches a violating edge.
  for (int guard = 0; guard < 8; ++guard) {
    DSU d2(V);
    for (size_t k = 0; k < accepted.size(); ++k)
      if (ok[k]) d2.p[accepted[k].drop] = accepted[k].keep;
    std::unordered_map<uint64_t, int> dirE, undE;
    for (auto& t : m.f) {
      Tri r2 = {d2.find(t[0]), d2.find(t[1]), d2.find(t[2])};
      if (r2[0] == r2[1] || r2[1] == r2[2] || r2[0] == r2[2]) continue;
      for (int s = 0; s < 3; ++s) {
        int64_t p = r2[s], q = r2[(s + 1) % 3];
        dirE[(uint64_t(p) << 32) | uint64_t(uint32_t(q))]++;
        undE[ekey(p, q)]++;
      }
    }
    std::unordered_set<int64_t> badv;
    for (auto& kv : dirE)
      if (kv.second > 1) {
        badv.insert(int64_t(kv.first >> 32));
        badv.insert(int64_t(kv.first & 0xffffffffu));
      }
    for (auto& kv : undE)
      if (kv.second > 2) {
        badv.insert(int64_t(kv.first >> 32));
        badv.insert(int64_t(kv.first & 0xffffffffu));
      }
    if (badv.empty()) break;
    bool changed = false;
    for (size_t k = 0; k < accepted.size(); ++k)
      if (ok[k] && badv.count(d2.find(accepted[k].keep))) {
        ok[k] = 0;
        changed = true;
      }
    if (!changed) break;  // violations pre-date this batch: keep going
  }

  DSU dsu(V);
  for (size_t k = 0; k < accepted.size(); ++k) {
    if (!ok[k]) continue;
    m.v[accepted[k].keep] = accepted[k].pos;
    dsu.p[accepted[k].drop] = accepted[k].keep;
  }

  std::vector<Tri> out;
  out.reserve(m.f.size());
  for (auto& t : m.f) {
    Tri r = {dsu.find(t[0]), dsu.find(t[1]), dsu.find(t[2])};
    if (r[0] != r[1] && r[1] != r[2] && r[0] != r[2]) out.push_back(r);
  }
  m.f = std::move(out);
}

// ---- topology changes: edge-edge zipper merge ------------------------------
// El Topo's m_allow_topology_changes path (c_el_topo_api.cpp:22-44 enables
// it with m_merge_proximity_epsilon = edge_length/10 and
// m_max_volume_change = 0.01): when two surface patches approach within
// the proximity epsilon, a pair of opposing edges is zippered — the four
// incident triangles are deleted, the edge endpoints welded pairwise, and
// the two resulting quad holes re-stitched as a tunnel.  Each operation is
// validated for local manifoldness (every undirected edge <= 2 faces,
// consistent orientation) and rejected when its local signed-volume change
// exceeds max_volume_change.

static double tri_signed_vol(const V3& a, const V3& b, const V3& c) {
  return dot(a, cross(b, c)) / 6.0;
}

// Orient candidate triangles so every edge shared with `fixed` faces is
// anti-parallel; returns false on conflict or non-manifold result.
static bool orient_and_validate(const std::vector<Tri>& fixed,
                                std::vector<Tri>& added) {
  // directed edges of fixed faces
  std::unordered_set<uint64_t> dir;
  std::unordered_map<uint64_t, int> undir;
  auto dkey = [](int64_t a, int64_t b) {
    return (uint64_t(a) << 32) | uint64_t(b);
  };
  for (auto& t : fixed)
    for (int s = 0; s < 3; ++s) {
      dir.insert(dkey(t[s], t[(s + 1) % 3]));
      undir[ekey(t[s], t[(s + 1) % 3])]++;
    }
  for (auto& t : added) {
    int fwd_ok = 0, rev_ok = 0;
    for (int s = 0; s < 3; ++s) {
      int64_t p = t[s], q = t[(s + 1) % 3];
      if (dir.count(dkey(p, q))) ++rev_ok;      // same direction exists ->
      if (dir.count(dkey(q, p))) ++fwd_ok;      // must flip; opposite -> keep
    }
    if (fwd_ok && rev_ok) return false;
    if (rev_ok) std::swap(t[1], t[2]);
    for (int s = 0; s < 3; ++s) {
      int64_t p = t[s], q = t[(s + 1) % 3];
      if (dir.count(dkey(p, q))) return false;  // duplicate directed edge
      dir.insert(dkey(p, q));
      if (++undir[ekey(p, q)] > 2) return false;
    }
  }
  for (auto& kv : undir)
    if (kv.second > 2) return false;
  return true;
}

static int merge_close_sheets(Mesh& m, double eps, double max_vol,
                              const std::vector<int>& protect) {
  if (eps <= 0) return 0;
  size_t V = m.v.size();
  std::vector<std::unordered_set<int64_t>> nbr(V);
  for (auto& t : m.f)
    for (int s = 0; s < 3; ++s) {
      nbr[t[s]].insert(t[(s + 1) % 3]);
      nbr[t[(s + 1) % 3]].insert(t[s]);
    }
  // manifold edge -> its two (face, slot) uses
  std::unordered_map<uint64_t, std::vector<std::pair<int, int>>> em;
  em.reserve(m.f.size() * 3);
  for (int i = 0; i < (int)m.f.size(); ++i)
    for (int s = 0; s < 3; ++s)
      em[ekey(m.f[i][s], m.f[i][(s + 1) % 3])].push_back({i, s});

  // spatial grid over edge midpoints
  FaceGrid grid;
  grid.cell = std::max(eps * 4.0, 1e-12);
  grid.origin = m.v.empty() ? V3{} : m.v[0];
  std::vector<uint64_t> ekeys;
  for (auto& kv : em) {
    if (kv.second.size() != 2) continue;
    int64_t a = int64_t(kv.first >> 32), b = int64_t(kv.first & 0xffffffffu);
    V3 mid = (m.v[a] + m.v[b]) * 0.5;
    grid.insert(mid, mid, (int)ekeys.size());
    ekeys.push_back(kv.first);
  }

  std::vector<std::unordered_set<int64_t>> fincident(V);
  for (int i = 0; i < (int)m.f.size(); ++i)
    for (int s = 0; s < 3; ++s) fincident[m.f[i][s]].insert(i);

  std::vector<char> vused(V, 0), fdead(m.f.size(), 0);
  std::vector<int> cand;
  int merges = 0;

  for (size_t ei = 0; ei < ekeys.size(); ++ei) {
    int64_t a = int64_t(ekeys[ei] >> 32), b = int64_t(ekeys[ei] & 0xffffffffu);
    if (vused[a] || vused[b] || protect[a] || protect[b]) continue;
    double elen = norm(m.v[a] - m.v[b]);
    V3 mid = (m.v[a] + m.v[b]) * 0.5;
    V3 pad{eps + elen, eps + elen, eps + elen};
    grid.query(mid - pad, mid + pad, cand);
    for (int cj : cand) {
      if ((size_t)cj <= ei) continue;
      int64_t c = int64_t(ekeys[cj] >> 32), d = int64_t(ekeys[cj] & 0xffffffffu);
      if (vused[a] || vused[b]) break;
      if (vused[c] || vused[d] || protect[c] || protect[d]) continue;
      if (c == a || c == b || d == a || d == b) continue;
      // pairing that minimizes weld distance
      if (norm(m.v[a] - m.v[d]) + norm(m.v[b] - m.v[c])
          < norm(m.v[a] - m.v[c]) + norm(m.v[b] - m.v[d]))
        std::swap(c, d);
      if (norm(m.v[a] - m.v[c]) > eps || norm(m.v[b] - m.v[d]) > eps)
        continue;
      // separate patches: graph distance >= 3 between any endpoints
      bool close = nbr[a].count(c) || nbr[a].count(d) || nbr[b].count(c)
                || nbr[b].count(d);
      if (!close)
        for (auto x : nbr[a])
          if (nbr[c].count(x) || nbr[d].count(x)) { close = true; break; }
      if (!close)
        for (auto x : nbr[b])
          if (nbr[c].count(x) || nbr[d].count(x)) { close = true; break; }
      if (close) continue;

      auto u1 = em.find(ekey(a, b)), u2 = em.find(ekey(c, d));
      if (u1 == em.end() || u2 == em.end()) continue;
      bool dead_hit = false;
      for (auto& u : u1->second) dead_hit |= (bool)fdead[u.first];
      for (auto& u : u2->second) dead_hit |= (bool)fdead[u.first];
      if (dead_hit) continue;
      // third vertices of the four dying triangles
      auto third = [&](std::pair<int, int> u) {
        return m.f[u.first][(u.second + 2) % 3];
      };
      int64_t x1 = third(u1->second[0]), y1 = third(u1->second[1]);
      int64_t x2 = third(u2->second[0]), y2 = third(u2->second[1]);
      if (x1 == x2 || x1 == y2 || y1 == x2 || y1 == y2) continue;
      // thirds must be untouched by earlier merges this pass: their fans
      // are outside this operation's validated neighborhood
      if (vused[x1] || vused[y1] || vused[x2] || vused[y2]) continue;

      // local face set around the operation, post-weld (c->a, d->b)
      std::vector<int> local;
      for (auto vv : {a, b, c, d})
        for (auto fi : fincident[vv]) local.push_back(fi);
      std::sort(local.begin(), local.end());
      local.erase(std::unique(local.begin(), local.end()), local.end());
      int d1 = u1->second[0].first, d2 = u1->second[1].first;
      int d3 = u2->second[0].first, d4 = u2->second[1].first;
      V3 wa = (m.v[a] + m.v[c]) * 0.5, wb = (m.v[b] + m.v[d]) * 0.5;
      auto weld = [&](int64_t idx) {
        return idx == c ? a : (idx == d ? b : idx);
      };
      std::vector<Tri> fixed;
      double vol_before = 0, vol_after = 0;
      auto pos_after = [&](int64_t idx) {
        idx = weld(idx);
        return idx == a ? wa : (idx == b ? wb : m.v[idx]);
      };
      bool degenerate = false;
      for (int fi : local) {
        const Tri& t = m.f[fi];
        vol_before += tri_signed_vol(m.v[t[0]], m.v[t[1]], m.v[t[2]]);
        if (fi == d1 || fi == d2 || fi == d3 || fi == d4) continue;
        Tri w = {weld(t[0]), weld(t[1]), weld(t[2])};
        if (w[0] == w[1] || w[1] == w[2] || w[0] == w[2]) degenerate = true;
        fixed.push_back(w);
        vol_after += tri_signed_vol(pos_after(t[0]), pos_after(t[1]),
                                    pos_after(t[2]));
      }
      if (degenerate) continue;

      // try both hole pairings, both diagonals per hole
      bool done = false;
      for (int pair_flip = 0; pair_flip < 2 && !done; ++pair_flip) {
        int64_t p1 = pair_flip ? y2 : x2;   // partners x1<->p1, y1<->p2
        int64_t p2 = pair_flip ? x2 : y2;
        // a new cross-sheet diagonal must not already exist elsewhere in
        // the mesh (the validation set is local to {a,b,c,d} fans)
        auto edge_in_use = [&](int64_t p, int64_t q) {
          auto it = em.find(ekey(p, q));
          if (it == em.end()) return false;
          for (auto& u : it->second)
            if (!fdead[u.first]) return true;
          return false;
        };
        for (int diag = 0; diag < 4 && !done; ++diag) {
          if ((diag & 1) && edge_in_use(x1, p1)) continue;
          if ((diag & 2) && edge_in_use(y1, p2)) continue;
          std::vector<Tri> added;
          if (diag & 1) {
            added.push_back({x1, a, p1});
            added.push_back({x1, p1, b});
          } else {
            added.push_back({a, p1, x1});
            added.push_back({a, b, p1});
          }
          if (diag & 2) {
            added.push_back({y1, a, p2});
            added.push_back({y1, p2, b});
          } else {
            added.push_back({a, p2, y1});
            added.push_back({a, b, p2});
          }
          std::vector<Tri> added_try = added;
          if (!orient_and_validate(fixed, added_try)) continue;
          double va = vol_after;
          for (auto& t : added_try)
            va += tri_signed_vol(pos_after(t[0]), pos_after(t[1]),
                                 pos_after(t[2]));
          if (std::abs(va - vol_before) > max_vol) continue;
          // commit
          fdead[d1] = fdead[d2] = fdead[d3] = fdead[d4] = 1;
          m.v[a] = wa;
          m.v[b] = wb;
          for (int fi : local) {
            if (fdead[fi]) continue;
            for (auto& idx : m.f[fi]) idx = weld(idx);
          }
          for (auto& t : added_try) {
            for (int s = 0; s < 3; ++s)
              fincident[t[s]].insert((int)m.f.size() + 0);
            m.f.push_back(t);
          }
          vused[a] = vused[b] = vused[c] = vused[d] = 1;
          for (auto x : {x1, y1, x2, y2}) vused[x] = 1;
          ++merges;
          done = true;
        }
      }
      if (done) break;
    }
  }

  if (merges) {
    std::vector<Tri> out;
    out.reserve(m.f.size());
    for (size_t i = 0; i < m.f.size(); ++i)
      if (i >= fdead.size() || !fdead[i]) out.push_back(m.f[i]);
    m.f = std::move(out);
  }
  return merges;
}

// ---- cleanup ---------------------------------------------------------------

static void cleanup_faces(Mesh& m) {
  std::set<std::array<int64_t, 3>> seen;
  std::vector<Tri> out;
  out.reserve(m.f.size());
  for (auto& t : m.f) {
    V3 n = cross(m.v[t[1]] - m.v[t[0]], m.v[t[2]] - m.v[t[0]]);
    if (norm(n) <= 1e-14) continue;
    std::array<int64_t, 3> k = {t[0], t[1], t[2]};
    std::sort(k.begin(), k.end());
    if (!seen.insert(k).second) continue;
    out.push_back(t);
  }
  m.f = std::move(out);
}

static void compact(Mesh& m) {
  std::vector<int64_t> remap(m.v.size(), -1);
  std::vector<V3> nv;
  for (auto& t : m.f)
    for (auto idx : t)
      if (remap[idx] < 0) { remap[idx] = (int64_t)nv.size(); nv.push_back(m.v[idx]); }
  for (auto& t : m.f)
    for (auto& idx : t) idx = remap[idx];
  m.v = std::move(nv);
}

// ---- flip ------------------------------------------------------------------

static void flip_edges(Mesh& m, const std::vector<int>& protect) {
  std::vector<int> valence(m.v.size(), 0);
  for (auto& t : m.f)
    for (int s = 0; s < 3; ++s) valence[t[s]]++;
  auto target = [&](int64_t i) { return protect[i] ? 4 : 6; };

  std::unordered_map<uint64_t, std::vector<std::pair<int, int>>> em;
  for (int i = 0; i < (int)m.f.size(); ++i)
    for (int s = 0; s < 3; ++s)
      em[ekey(m.f[i][s], m.f[i][(s + 1) % 3])].push_back({i, s});

  // collision guard for flips: a flip rebuilds the quad's surface, so the
  // new diagonal can stab other geometry in a contact region; reject a
  // flip whose new diagonal crosses a face not touching the quad
  FaceGrid grid;
  {
    double mean_edge = 0.0;
    int64_t ne = 0;
    for (auto& t : m.f)
      for (int s = 0; s < 3; ++s) {
        mean_edge += norm(m.v[t[s]] - m.v[t[(s + 1) % 3]]);
        ++ne;
      }
    grid.cell = ne ? std::max(mean_edge / double(ne), 1e-12) : 1.0;
    grid.origin = m.v.empty() ? V3{} : m.v[0];
    for (int i = 0; i < (int)m.f.size(); ++i) {
      V3 lo = m.v[m.f[i][0]], hi = lo;
      for (int s = 1; s < 3; ++s) {
        const V3& p = m.v[m.f[i][s]];
        lo = {std::min(lo.x, p.x), std::min(lo.y, p.y), std::min(lo.z, p.z)};
        hi = {std::max(hi.x, p.x), std::max(hi.y, p.y), std::max(hi.z, p.z)};
      }
      grid.insert(lo, hi, i);
    }
  }
  std::vector<int> cand;
  auto diagonal_collides = [&](int64_t a, int64_t b, int64_t c, int64_t d) {
    V3 lo = m.v[c], hi = m.v[c];
    const V3& q = m.v[d];
    lo = {std::min(lo.x, q.x), std::min(lo.y, q.y), std::min(lo.z, q.z)};
    hi = {std::max(hi.x, q.x), std::max(hi.y, q.y), std::max(hi.z, q.z)};
    grid.query(lo, hi, cand);
    for (int fi : cand) {
      const Tri& t = m.f[fi];
      bool touches = false;
      for (int s = 0; s < 3; ++s)
        if (t[s] == a || t[s] == b || t[s] == c || t[s] == d) touches = true;
      if (touches) continue;
      if (segment_hits_tri(m.v[c], m.v[d], m.v[t[0]], m.v[t[1]], m.v[t[2]]))
        return true;
    }
    return false;
  };

  std::unordered_set<int> touched;
  std::unordered_set<uint64_t> new_diag;
  for (auto& kv : em) {
    if (kv.second.size() != 2) continue;
    auto [i1, s1] = kv.second[0];
    auto [i2, s2] = kv.second[1];
    if (touched.count(i1) || touched.count(i2)) continue;
    // direction from face i1 (the ekey is sorted, not oriented)
    int64_t a = m.f[i1][s1], b = m.f[i1][(s1 + 1) % 3];
    int64_t c = m.f[i1][(s1 + 2) % 3], d = m.f[i2][(s2 + 2) % 3];
    if (c == d) continue;
    if (em.count(ekey(c, d)) || new_diag.count(ekey(c, d))) continue;
    auto dev = [&](int val, int64_t i) { double e = val - target(i); return e * e; };
    double before = dev(valence[a], a) + dev(valence[b], b) + dev(valence[c], c) + dev(valence[d], d);
    double after = dev(valence[a] - 1, a) + dev(valence[b] - 1, b) + dev(valence[c] + 1, c) + dev(valence[d] + 1, d);
    if (after >= before) continue;
    V3 n1 = cross(m.v[d] - m.v[c], m.v[a] - m.v[c]);
    V3 n2 = cross(m.v[b] - m.v[c], m.v[d] - m.v[c]);
    if (norm(n1) < 1e-14 || norm(n2) < 1e-14 || dot(n1, n2) <= 0) continue;
    if (diagonal_collides(a, b, c, d)) continue;
    // winding: f1 owned directed edges (b->c, c->a), f2 (a->d, d->b); the
    // flipped pair must keep those outer directions and share the new
    // diagonal anti-parallel: (a,d,c) and (b,c,d)
    m.f[i1] = {a, d, c};
    m.f[i2] = {b, c, d};
    valence[a]--; valence[b]--; valence[c]++; valence[d]++;
    touched.insert(i1);
    touched.insert(i2);
    // register the new diagonal so a second quad with the same opposite
    // corners cannot flip onto it (new_diag guard above); stale em entries
    // for the two faces' outer edges are harmless — `touched` skips them
    new_diag.insert(ekey(c, d));
    // keep the collision grid current: the rebuilt triangles' bounding
    // boxes now include vertex d (resp. c), which the stale entries may
    // not cover; duplicate ids are harmless (query dedupes, vertices are
    // re-read at test time).
    for (int fi : {i1, i2}) {
      V3 lo = m.v[m.f[fi][0]], hi = lo;
      for (int s = 1; s < 3; ++s) {
        const V3& p = m.v[m.f[fi][s]];
        lo = {std::min(lo.x, p.x), std::min(lo.y, p.y), std::min(lo.z, p.z)};
        hi = {std::max(hi.x, p.x), std::max(hi.y, p.y), std::max(hi.z, p.z)};
      }
      grid.insert(lo, hi, fi);
    }
  }
}

// ---- tangential relax ------------------------------------------------------

static void tangential_relax(Mesh& m, const std::vector<int>& protect,
                             double lam) {
  size_t V = m.v.size();
  std::vector<V3> acc(V);
  std::vector<double> cnt(V, 0);
  for (auto& t : m.f)
    for (int s = 0; s < 3; ++s) {
      acc[t[s]] = acc[t[s]] + m.v[t[(s + 1) % 3]];
      cnt[t[s]] += 1;
      acc[t[(s + 1) % 3]] = acc[t[(s + 1) % 3]] + m.v[t[s]];
      cnt[t[(s + 1) % 3]] += 1;
    }
  std::vector<V3> vn(V);
  for (auto& t : m.f) {
    V3 n = cross(m.v[t[1]] - m.v[t[0]], m.v[t[2]] - m.v[t[0]]);
    for (int s = 0; s < 3; ++s) vn[t[s]] = vn[t[s]] + n;
  }
  std::vector<V3> out = m.v;
  for (size_t i = 0; i < V; ++i) {
    if (protect[i] || cnt[i] == 0) continue;
    V3 cen = acc[i] * (1.0 / cnt[i]);
    V3 nrm = vn[i];
    double nn = norm(nrm);
    if (nn > 1e-30) nrm = nrm * (1.0 / nn);
    V3 d = cen - m.v[i];
    d = d - nrm * dot(d, nrm);
    out[i] = m.v[i] + d * lam;
  }
  m.v = std::move(out);
}

static int run_remesh(const double* v_in, int64_t nv,
                      const int32_t* f_in, int64_t nf,
                      double target_edge_length, int iterations,
                      double merge_eps, double max_vol, int protect_border,
                      double* v_out, int64_t cap_v,
                      int32_t* f_out, int64_t cap_f,
                      int64_t* out_nv, int64_t* out_nf,
                      int64_t* out_merges) {
  Mesh m;
  m.v.resize(nv);
  for (int64_t i = 0; i < nv; ++i)
    m.v[i] = {v_in[3 * i], v_in[3 * i + 1], v_in[3 * i + 2]};
  m.f.resize(nf);
  for (int64_t i = 0; i < nf; ++i)
    m.f[i] = {f_in[3 * i], f_in[3 * i + 1], f_in[3 * i + 2]};

  double high = 4.0 / 3.0 * target_edge_length;
  double low = 4.0 / 5.0 * target_edge_length;
  int64_t merges = 0;
  const bool dbg = std::getenv("GEOMLIB_DEBUG") != nullptr;
  auto dup_count = [&](const char* tag) {
    if (!dbg) return;
    std::unordered_map<uint64_t, int> dirE;
    int dups = 0;
    for (auto& t : m.f)
      for (int s = 0; s < 3; ++s) {
        uint64_t k = (uint64_t(t[s]) << 32) | uint64_t(uint32_t(t[(s + 1) % 3]));
        if (++dirE[k] > 1) ++dups;
      }
    std::fprintf(stderr, "[geomlib] %s: dup_directed=%d F=%zu\n", tag, dups,
                 m.f.size());
  };
  for (int it = 0; it < iterations; ++it) {
    auto protect = protect_border ? border_flags(m)
                                  : std::vector<int>(m.v.size(), 0);
    if (merge_eps > 0) {
      merges += merge_close_sheets(m, merge_eps, max_vol, protect);
      cleanup_faces(m);
      dup_count("merge");
    }
    split_long_edges(m, high);
    dup_count("split");
    protect = protect_border ? border_flags(m)
                             : std::vector<int>(m.v.size(), 0);
    collapse_short_edges(m, low, high, protect, max_vol);
    cleanup_faces(m);
    compact(m);
    dup_count("collapse");
    protect = protect_border ? border_flags(m)
                             : std::vector<int>(m.v.size(), 0);
    flip_edges(m, protect);
    dup_count("flip");
    // CCD-guard the relaxation: it moves vertices off the surface and can
    // fold a surface in contact through itself (tests/test_self_collision)
    std::vector<V3> before = m.v;
    tangential_relax(m, protect, 0.5);
    m.v = ccd_limit(before, m.v, m.f);
  }

  if (out_merges) *out_merges = merges;
  *out_nv = (int64_t)m.v.size();
  *out_nf = (int64_t)m.f.size();
  if ((int64_t)m.v.size() > cap_v || (int64_t)m.f.size() > cap_f) return 1;
  for (size_t i = 0; i < m.v.size(); ++i) {
    v_out[3 * i] = m.v[i].x;
    v_out[3 * i + 1] = m.v[i].y;
    v_out[3 * i + 2] = m.v[i].z;
  }
  for (size_t i = 0; i < m.f.size(); ++i) {
    f_out[3 * i] = (int32_t)m.f[i][0];
    f_out[3 * i + 1] = (int32_t)m.f[i][1];
    f_out[3 * i + 2] = (int32_t)m.f[i][2];
  }
  return 0;
}

}  // namespace

extern "C" {

// Returns 0 on success, 1 if out buffers too small (out_nv/out_nf still
// report required sizes).
int geomlib_isotropic_remesh(const double* v_in, int64_t nv,
                             const int32_t* f_in, int64_t nf,
                             double target_edge_length, int iterations,
                             int protect_border,
                             double* v_out, int64_t cap_v,
                             int32_t* f_out, int64_t cap_f,
                             int64_t* out_nv, int64_t* out_nf) {
  return run_remesh(v_in, nv, f_in, nf, target_edge_length, iterations,
                    0.0, 1e300, protect_border, v_out, cap_v, f_out, cap_f,
                    out_nv, out_nf, nullptr);
}

// El Topo static-operations parity (c_el_topo_api.cpp:10-74): remesh WITH
// topology changes — close sheets within merge_eps are zipper-merged —
// and a per-operation volume-change cap (m_max_volume_change).  The
// reference passes merge_eps = edge_length/10 and max_volume_change =
// 0.01.  out_merges reports how many zipper operations were committed.
int geomlib_topo_remesh(const double* v_in, int64_t nv,
                        const int32_t* f_in, int64_t nf,
                        double target_edge_length, int iterations,
                        double merge_eps, double max_volume_change,
                        int protect_border,
                        double* v_out, int64_t cap_v,
                        int32_t* f_out, int64_t cap_f,
                        int64_t* out_nv, int64_t* out_nf,
                        int64_t* out_merges) {
  return run_remesh(v_in, nv, f_in, nf, target_edge_length, iterations,
                    merge_eps, max_volume_change, protect_border,
                    v_out, cap_v, f_out, cap_f, out_nv, out_nf, out_merges);
}

// Face adjacency (cgal_api face_affinity equivalent): out[3*i+s] = face
// across edge (f[i][s], f[i][s+1]), -1 for border/non-manifold.
void geomlib_face_affinity(const int32_t* f_in, int64_t nf, int32_t* out) {
  std::unordered_map<uint64_t, std::vector<std::pair<int, int>>> em;
  em.reserve(nf * 3);
  for (int64_t i = 0; i < nf; ++i)
    for (int s = 0; s < 3; ++s)
      em[ekey(f_in[3 * i + s], f_in[3 * i + (s + 1) % 3])].push_back(
          {(int)i, s});
  for (int64_t i = 0; i < 3 * nf; ++i) out[i] = -1;
  for (auto& kv : em) {
    if (kv.second.size() != 2) continue;
    auto [i1, s1] = kv.second[0];
    auto [i2, s2] = kv.second[1];
    out[3 * i1 + s1] = i2;
    out[3 * i2 + s2] = i1;
  }
}

}  // extern "C"
