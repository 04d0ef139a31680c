// Quadric-error-metric mesh decimation (Garland–Heckbert greedy edge
// collapse) — the TPU-framework replacement for the reference's vendored
// qslim/mixkit (decimateMEF, /root/reference/Src/decimateMEF.cpp +
// Tools/qslim; config surface per Tools/qslim/qslim.h:29-46: face_target,
// boundary_weight).  Written from the published algorithm (Garland &
// Heckbert, SIGGRAPH '97), not ported from mixkit.
//
// Greedy collapse is inherently sequential, so it lives in native C++ on the
// host (SURVEY.md §7.8); exposed through a C ABI consumed via ctypes.
//
// Per-vertex attributes (the MEF's non-coordinate components) are carried
// through collapses by error-weighted interpolation of the two endpoints.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Quadric {
  // symmetric 4x4: a2 ab ac ad b2 bc bd c2 cd d2
  double q[10] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0};
  void add_plane(double a, double b, double c, double d, double w) {
    q[0] += w * a * a; q[1] += w * a * b; q[2] += w * a * c; q[3] += w * a * d;
    q[4] += w * b * b; q[5] += w * b * c; q[6] += w * b * d;
    q[7] += w * c * c; q[8] += w * c * d; q[9] += w * d * d;
  }
  void add(const Quadric& o) { for (int i = 0; i < 10; ++i) q[i] += o.q[i]; }
  double eval(const double* v) const {
    double x = v[0], y = v[1], z = v[2];
    return q[0]*x*x + 2*q[1]*x*y + 2*q[2]*x*z + 2*q[3]*x
         + q[4]*y*y + 2*q[5]*y*z + 2*q[6]*y
         + q[7]*z*z + 2*q[8]*z + q[9];
  }
  // solve for minimizing point; false if near-singular
  bool optimum(double* out) const {
    double A[9] = {q[0], q[1], q[2], q[1], q[4], q[5], q[2], q[5], q[7]};
    double b[3] = {-q[3], -q[6], -q[8]};
    // Cramer with pivot check
    double det = A[0]*(A[4]*A[8]-A[5]*A[7]) - A[1]*(A[3]*A[8]-A[5]*A[6])
               + A[2]*(A[3]*A[7]-A[4]*A[6]);
    if (std::fabs(det) < 1e-12) return false;
    double inv = 1.0 / det;
    out[0] = inv * (b[0]*(A[4]*A[8]-A[5]*A[7]) - A[1]*(b[1]*A[8]-A[5]*b[2])
                    + A[2]*(b[1]*A[7]-A[4]*b[2]));
    out[1] = inv * (A[0]*(b[1]*A[8]-A[5]*b[2]) - b[0]*(A[3]*A[8]-A[5]*A[6])
                    + A[2]*(A[3]*b[2]-b[1]*A[6]));
    out[2] = inv * (A[0]*(A[4]*b[2]-b[1]*A[7]) - A[1]*(A[3]*b[2]-b[1]*A[6])
                    + b[0]*(A[3]*A[7]-A[4]*A[6]));
    return true;
  }
};

struct HeapEntry {
  double cost;
  int v0, v1;
  uint64_t stamp;  // validity check: sum of endpoint versions at push time
  bool operator<(const HeapEntry& o) const { return cost > o.cost; }
};

inline uint64_t ekey(int a, int b) {
  if (a > b) std::swap(a, b);
  return (uint64_t(a) << 32) | uint64_t(b);
}

}  // namespace

extern "C" int qem_decimate(
    int n_verts, int n_tris, int n_attr,
    const double* verts,      // [n_verts, 3]
    const double* attrs,      // [n_verts, n_attr] or null
    const int* tris,          // [n_tris, 3]
    int face_target,
    double boundary_weight,
    double* out_verts,        // [n_verts, 3] capacity
    double* out_attrs,        // [n_verts, n_attr] capacity
    int* out_tris,            // [n_tris, 3] capacity
    int* out_counts)          // {n_out_verts, n_out_tris}
{
  std::vector<double> V(verts, verts + size_t(n_verts) * 3);
  std::vector<double> A;
  if (n_attr > 0) A.assign(attrs, attrs + size_t(n_verts) * n_attr);
  std::vector<int> F(tris, tris + size_t(n_tris) * 3);
  std::vector<char> face_dead(n_tris, 0);
  std::vector<uint64_t> version(n_verts, 0);
  std::vector<Quadric> Q(n_verts);
  std::vector<std::unordered_set<int>> vfaces(n_verts);

  // face quadrics
  for (int f = 0; f < n_tris; ++f) {
    int i = F[3*f], j = F[3*f+1], k = F[3*f+2];
    if (i == j || j == k || i == k) { face_dead[f] = 1; continue; }
    const double *p = &V[3*i], *q = &V[3*j], *r = &V[3*k];
    double u[3] = {q[0]-p[0], q[1]-p[1], q[2]-p[2]};
    double w[3] = {r[0]-p[0], r[1]-p[1], r[2]-p[2]};
    double n[3] = {u[1]*w[2]-u[2]*w[1], u[2]*w[0]-u[0]*w[2],
                   u[0]*w[1]-u[1]*w[0]};
    double len = std::sqrt(n[0]*n[0]+n[1]*n[1]+n[2]*n[2]);
    double area = 0.5 * len;
    if (len < 1e-300) { continue; }
    for (int d = 0; d < 3; ++d) n[d] /= len;
    double dd = -(n[0]*p[0] + n[1]*p[1] + n[2]*p[2]);
    Q[i].add_plane(n[0], n[1], n[2], dd, area);
    Q[j].add_plane(n[0], n[1], n[2], dd, area);
    Q[k].add_plane(n[0], n[1], n[2], dd, area);
    vfaces[i].insert(f); vfaces[j].insert(f); vfaces[k].insert(f);
  }

  // boundary constraint quadrics: edges with exactly one incident face get
  // a perpendicular penalty plane (qslim boundary_weight analog)
  {
    std::unordered_map<uint64_t, int> edge_count;
    std::unordered_map<uint64_t, int> edge_face;
    for (int f = 0; f < n_tris; ++f) {
      if (face_dead[f]) continue;
      for (int e = 0; e < 3; ++e) {
        int a = F[3*f + e], b = F[3*f + (e+1)%3];
        edge_count[ekey(a, b)]++;
        edge_face[ekey(a, b)] = f;
      }
    }
    for (auto& kv : edge_count) {
      if (kv.second != 1 || boundary_weight <= 0) continue;
      int a = int(kv.first >> 32), b = int(kv.first & 0xffffffffu);
      int f = edge_face[kv.first];
      int i = F[3*f], j = F[3*f+1], k = F[3*f+2];
      const double *p = &V[3*i], *q = &V[3*j], *r = &V[3*k];
      double u[3] = {q[0]-p[0], q[1]-p[1], q[2]-p[2]};
      double w[3] = {r[0]-p[0], r[1]-p[1], r[2]-p[2]};
      double fn[3] = {u[1]*w[2]-u[2]*w[1], u[2]*w[0]-u[0]*w[2],
                      u[0]*w[1]-u[1]*w[0]};
      double e0[3] = {V[3*b]-V[3*a], V[3*b+1]-V[3*a+1], V[3*b+2]-V[3*a+2]};
      // plane containing the edge, perpendicular to the face
      double n[3] = {e0[1]*fn[2]-e0[2]*fn[1], e0[2]*fn[0]-e0[0]*fn[2],
                     e0[0]*fn[1]-e0[1]*fn[0]};
      double len = std::sqrt(n[0]*n[0]+n[1]*n[1]+n[2]*n[2]);
      if (len < 1e-300) continue;
      for (int d = 0; d < 3; ++d) n[d] /= len;
      double dd = -(n[0]*V[3*a] + n[1]*V[3*a+1] + n[2]*V[3*a+2]);
      Q[a].add_plane(n[0], n[1], n[2], dd, boundary_weight);
      Q[b].add_plane(n[0], n[1], n[2], dd, boundary_weight);
    }
  }

  auto edge_cost = [&](int a, int b, double* vout) -> double {
    Quadric s = Q[a];
    s.add(Q[b]);
    if (!s.optimum(vout)) {
      // fall back to best of endpoints/midpoint
      double m[3] = {0.5*(V[3*a]+V[3*b]), 0.5*(V[3*a+1]+V[3*b+1]),
                     0.5*(V[3*a+2]+V[3*b+2])};
      double ca = s.eval(&V[3*a]), cb = s.eval(&V[3*b]), cm = s.eval(m);
      if (ca <= cb && ca <= cm) { std::memcpy(vout, &V[3*a], 24); return ca; }
      if (cb <= cm) { std::memcpy(vout, &V[3*b], 24); return cb; }
      std::memcpy(vout, m, 24);
      return cm;
    }
    return s.eval(vout);
  };

  std::priority_queue<HeapEntry> heap;
  std::unordered_set<uint64_t> edges;
  for (int f = 0; f < n_tris; ++f) {
    if (face_dead[f]) continue;
    for (int e = 0; e < 3; ++e) {
      int a = F[3*f + e], b = F[3*f + (e+1)%3];
      uint64_t k = ekey(a, b);
      if (edges.insert(k).second) {
        double v[3];
        double c = edge_cost(a, b, v);
        heap.push({c, std::min(a, b), std::max(a, b), 0});
      }
    }
  }

  std::vector<int> remap(n_verts);
  for (int i = 0; i < n_verts; ++i) remap[i] = i;
  auto find = [&](int v) {
    while (remap[v] != v) { remap[v] = remap[remap[v]]; v = remap[v]; }
    return v;
  };

  int live_faces = 0;
  for (int f = 0; f < n_tris; ++f) if (!face_dead[f]) live_faces++;

  while (live_faces > face_target && !heap.empty()) {
    HeapEntry e = heap.top();
    heap.pop();
    int a = find(e.v0), b = find(e.v1);
    if (a == b) continue;
    if (e.stamp != version[a] + version[b]) continue;  // stale
    double vnew[3];
    double cost = edge_cost(a, b, vnew);
    (void)cost;
    // collapse b into a
    remap[b] = a;
    std::memcpy(&V[3*a], vnew, 24);
    if (n_attr > 0)
      for (int t = 0; t < n_attr; ++t)
        A[size_t(a)*n_attr + t] = 0.5 * (A[size_t(a)*n_attr + t]
                                         + A[size_t(b)*n_attr + t]);
    Q[a].add(Q[b]);
    version[a]++;
    // update faces
    for (int f : vfaces[b]) vfaces[a].insert(f);
    std::vector<int> drop;
    for (int f : vfaces[a]) {
      if (face_dead[f]) { drop.push_back(f); continue; }
      int i = find(F[3*f]), j = find(F[3*f+1]), k = find(F[3*f+2]);
      if (i == j || j == k || i == k) {
        face_dead[f] = 1;
        live_faces--;
        drop.push_back(f);
      }
    }
    for (int f : drop) vfaces[a].erase(f);
    // re-push neighborhood edges
    std::unordered_set<int> nbrs;
    for (int f : vfaces[a]) {
      for (int e2 = 0; e2 < 3; ++e2) {
        int v = find(F[3*f + e2]);
        if (v != a) nbrs.insert(v);
      }
    }
    for (int v : nbrs) {
      double tmp[3];
      double c = edge_cost(a, v, tmp);
      heap.push({c, a, v, version[a] + version[v]});
    }
  }

  // compact output
  std::vector<int> new_id(n_verts, -1);
  int nv = 0;
  int nf = 0;
  for (int f = 0; f < n_tris; ++f) {
    if (face_dead[f]) continue;
    int ids[3];
    bool ok = true;
    for (int e = 0; e < 3; ++e) {
      int v = find(F[3*f + e]);
      ids[e] = v;
    }
    if (ids[0] == ids[1] || ids[1] == ids[2] || ids[0] == ids[2]) continue;
    for (int e = 0; e < 3; ++e) {
      int v = ids[e];
      if (new_id[v] < 0) {
        new_id[v] = nv;
        std::memcpy(&out_verts[3*nv], &V[3*v], 24);
        if (n_attr > 0)
          std::memcpy(&out_attrs[size_t(nv)*n_attr], &A[size_t(v)*n_attr],
                      sizeof(double)*n_attr);
        nv++;
      }
      out_tris[3*nf + e] = new_id[v];
    }
    nf++;
    (void)ok;
  }
  out_counts[0] = nv;
  out_counts[1] = nf;
  return 0;
}
