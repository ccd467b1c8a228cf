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
                                 const std::vector<Tri>& faces) {
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
  geomlib_integrate_ccd(o.data(), n.data(), (int64_t)V, ff.data(),
                        (int64_t)faces.size(), out.data(), 8);
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
static void collapse_short_edges(Mesh& m, double low, double high,
                                 const std::vector<int>& protect) {
  size_t V = m.v.size();
  std::vector<std::unordered_set<int64_t>> nbr(V);
  for (auto& t : m.f)
    for (int s = 0; s < 3; ++s) {
      nbr[t[s]].insert(t[(s + 1) % 3]);
      nbr[t[(s + 1) % 3]].insert(t[s]);
    }

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
    for (size_t k = 0; k < accepted.size(); ++k)
      if (ok[k]) {
        proposed[accepted[k].keep] = accepted[k].pos;
        proposed[accepted[k].drop] = accepted[k].pos;
      }
    std::vector<V3> safe = ccd_limit(m.v, proposed, m.f);
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
  for (auto& kv : em) {
    if (kv.second.size() != 2) continue;
    auto [i1, s1] = kv.second[0];
    auto [i2, s2] = kv.second[1];
    if (touched.count(i1) || touched.count(i2)) continue;
    int64_t a = int64_t(kv.first >> 32), b = int64_t(kv.first & 0xffffffffu);
    int64_t c = m.f[i1][(s1 + 2) % 3], d = m.f[i2][(s2 + 2) % 3];
    if (c == d) continue;
    if (em.count(ekey(c, d))) continue;
    auto dev = [&](int val, int64_t i) { double e = val - target(i); return e * e; };
    double before = dev(valence[a], a) + dev(valence[b], b) + dev(valence[c], c) + dev(valence[d], d);
    double after = dev(valence[a] - 1, a) + dev(valence[b] - 1, b) + dev(valence[c] + 1, c) + dev(valence[d] + 1, d);
    if (after >= before) continue;
    V3 n1 = cross(m.v[d] - m.v[c], m.v[a] - m.v[c]);
    V3 n2 = cross(m.v[b] - m.v[c], m.v[d] - m.v[c]);
    if (norm(n1) < 1e-14 || norm(n2) < 1e-14 || dot(n1, n2) <= 0) continue;
    if (diagonal_collides(a, b, c, d)) continue;
    m.f[i1] = {c, d, a};
    m.f[i2] = {d, c, b};
    valence[a]--; valence[b]--; valence[c]++; valence[d]++;
    touched.insert(i1);
    touched.insert(i2);
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
  Mesh m;
  m.v.resize(nv);
  for (int64_t i = 0; i < nv; ++i)
    m.v[i] = {v_in[3 * i], v_in[3 * i + 1], v_in[3 * i + 2]};
  m.f.resize(nf);
  for (int64_t i = 0; i < nf; ++i)
    m.f[i] = {f_in[3 * i], f_in[3 * i + 1], f_in[3 * i + 2]};

  double high = 4.0 / 3.0 * target_edge_length;
  double low = 4.0 / 5.0 * target_edge_length;
  for (int it = 0; it < iterations; ++it) {
    split_long_edges(m, high);
    auto protect = protect_border ? border_flags(m)
                                  : std::vector<int>(m.v.size(), 0);
    collapse_short_edges(m, low, high, protect);
    cleanup_faces(m);
    compact(m);
    protect = protect_border ? border_flags(m)
                             : std::vector<int>(m.v.size(), 0);
    flip_edges(m, protect);
    // CCD-guard the relaxation: it moves vertices off the surface and can
    // fold a surface in contact through itself (tests/test_self_collision)
    std::vector<V3> before = m.v;
    tangential_relax(m, protect, 0.5);
    m.v = ccd_limit(before, m.v, m.f);
  }

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
