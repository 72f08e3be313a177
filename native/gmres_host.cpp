// Native host-side sparse factorization library for gmres_tpu.
//
// The reference keeps its setup-heavy numerics in native code (leftILU.cu
// CPU paths, iluk.cpp/itsol.cpp ILU(k), ILU++ multilevel, CUSP AINV
// biconjugation); this library is the TPU framework's equivalent: the
// device apply stays in JAX/Pallas, the sequential host factorizations run
// here (NumPy reference implementations in gmres_tpu/precond remain as
// fallbacks and oracles).
//
// C ABI, ctypes-friendly. CSR inputs: sorted column indices, no duplicates.
// Build: make -C native (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <map>
#include <queue>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// ILU(0): in-place IKJ factorization on the CSR pattern of A.
// L strict-lower (unit diagonal implicit), U upper incl. diagonal, both
// stored back into `data`. Zero/missing pivots replaced by 1.0
// (the LUSolve_ignoreZero contract, SpMV_compute.cpp:92).
// ---------------------------------------------------------------------------
int gt_ilu0(int64_t n, const int64_t* indptr, const int32_t* indices,
            double* data) {
  std::vector<int64_t> diag(n, -1);
  std::vector<int64_t> pos(n, -1);  // col -> flat index in current row i
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
      if (indices[p] == i) { diag[i] = p; break; }
  }
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) pos[indices[p]] = p;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int32_t k = indices[p];
      if (k >= i) break;
      int64_t dk = diag[k];
      double ukk = (dk >= 0) ? data[dk] : 1.0;
      if (ukk == 0.0) ukk = 1.0;
      data[p] /= ukk;
      double lik = data[p];
      if (lik == 0.0) continue;
      int64_t start = (dk >= 0) ? dk + 1 : indptr[k];
      for (int64_t p2 = start; p2 < indptr[k + 1]; ++p2) {
        int32_t j = indices[p2];
        if (j <= k) continue;
        int64_t pij = pos[j];
        if (pij >= 0) data[pij] -= lik * data[p2];
      }
    }
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) pos[indices[p]] = -1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// ILU(k): symbolic fill-level expansion (Hysom/Pothen level rule
// lev(i,j) = min over paths, fill kept when lev <= lfil — the ilukC
// contract, iluk.cpp:56) followed by numeric ILU(0) on the expanded
// pattern. Handle-based result: fetch as CSR.
// ---------------------------------------------------------------------------
struct IlukResult {
  int64_t n = 0;
  std::vector<int64_t> indptr;
  std::vector<int32_t> indices;
  std::vector<double> data;
};

void* gt_iluk(int64_t n, const int64_t* indptr, const int32_t* indices,
              const double* data, int lfil) {
  auto* res = new IlukResult();
  res->n = n;
  res->indptr.assign(n + 1, 0);
  // per-row fill levels of the factored pattern (upper parts are needed by
  // later rows, keep them all)
  std::vector<std::vector<std::pair<int32_t, int32_t>>> rows(n);  // (col,lev)
  for (int64_t i = 0; i < n; ++i) {
    // merge map col -> level
    std::map<int32_t, int32_t> lev;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
      lev[indices[p]] = 0;
    lev.emplace((int32_t)i, 0);
    // process lower columns in ascending order, merging fill from row k
    for (auto it = lev.begin(); it != lev.end() && it->first < i; ++it) {
      int32_t k = it->first;
      int32_t lev_ik = it->second;
      if (lev_ik > lfil) continue;
      for (auto& kv : rows[k]) {
        int32_t j = kv.first;
        if (j <= k) continue;
        int32_t nl = lev_ik + kv.second + 1;
        if (nl > lfil) continue;
        auto f = lev.find(j);
        if (f == lev.end()) lev.emplace(j, nl);
        else if (f->second > nl) f->second = nl;
      }
    }
    rows[i].reserve(lev.size());
    for (auto& kv : lev) rows[i].push_back(kv);
    res->indptr[i + 1] = res->indptr[i] + (int64_t)lev.size();
  }
  int64_t nnz = res->indptr[n];
  res->indices.resize(nnz);
  res->data.assign(nnz, 0.0);
  for (int64_t i = 0; i < n; ++i) {
    int64_t q = res->indptr[i];
    int64_t p = indptr[i];
    for (auto& kv : rows[i]) {
      res->indices[q] = kv.first;
      while (p < indptr[i + 1] && indices[p] < kv.first) ++p;
      if (p < indptr[i + 1] && indices[p] == kv.first) res->data[q] = data[p];
      ++q;
    }
  }
  gt_ilu0(n, res->indptr.data(), res->indices.data(), res->data.data());
  return res;
}

int64_t gt_iluk_nnz(void* h) { return ((IlukResult*)h)->indptr.back(); }

void gt_iluk_fetch(void* h, int64_t* indptr, int32_t* indices, double* data) {
  auto* r = (IlukResult*)h;
  std::memcpy(indptr, r->indptr.data(), sizeof(int64_t) * (r->n + 1));
  std::memcpy(indices, r->indices.data(), sizeof(int32_t) * r->indices.size());
  std::memcpy(data, r->data.data(), sizeof(double) * r->data.size());
}

void gt_iluk_free(void* h) { delete (IlukResult*)h; }

// ---------------------------------------------------------------------------
// AINV: Benzi–Tůma nonsymmetric biconjugation with relative drop tolerance
// (the CUSP nonsym_bridson_ainv(A, 0.1) role, preconditioner.cu:169-187).
// Produces Z, W^T (unit upper / its transpose) and inv(diag) such that
// M^{-1} = Z diag(inv_d) W^T.
// ---------------------------------------------------------------------------
struct AinvResult {
  int64_t n = 0;
  // triplets for Z and Wt
  std::vector<int64_t> zr, zc, wr, wc;
  std::vector<double> zv, wv, invd;
};

namespace {
// sparse column store: per column sorted vector of (row, val)
struct Cols {
  std::vector<std::vector<std::pair<int32_t, double>>> col;
  std::vector<std::vector<int32_t>> inv;  // row -> columns containing it
  explicit Cols(int64_t n) : col(n), inv(n) {
    for (int64_t j = 0; j < n; ++j) {
      col[j].push_back({(int32_t)j, 1.0});
      inv[j].push_back((int32_t)j);
    }
  }
};

inline double dot_sparse(const std::vector<std::pair<int32_t, double>>& a,
                         const int32_t* idx, const double* val, int64_t len) {
  // a sorted by row; (idx,val) sorted by index
  double s = 0.0;
  size_t ia = 0;
  int64_t ib = 0;
  while (ia < a.size() && ib < len) {
    int32_t ra = a[ia].first, rb = idx[ib];
    if (ra == rb) { s += a[ia].second * val[ib]; ++ia; ++ib; }
    else if (ra < rb) ++ia;
    else ++ib;
  }
  return s;
}
}  // namespace

void* gt_ainv(int64_t n, const int64_t* indptrR, const int32_t* indicesR,
              const double* dataR, const int64_t* indptrC,
              const int32_t* indicesC, const double* dataC, double droptol,
              int64_t max_col_nnz) {
  Cols Z(n), W(n);
  auto* res = new AinvResult();
  res->n = n;
  res->invd.assign(n, 1.0);
  std::vector<int8_t> seen(n, 0);
  std::vector<int32_t> cand;

  auto sweep = [&](Cols& S, const int64_t* iptr, const int32_t* idx,
                   const double* val, int64_t i, double pi, bool compute_pi,
                   double* pi_out) {
    // candidates: columns j >= i sharing a row with A-row/col i
    cand.clear();
    for (int64_t p = iptr[i]; p < iptr[i + 1]; ++p) {
      int32_t r = idx[p];
      for (int32_t j : S.inv[r])
        if (j >= i && !seen[j]) { seen[j] = 1; cand.push_back(j); }
    }
    const int32_t* aidx = idx + iptr[i];
    const double* aval = val + iptr[i];
    int64_t alen = iptr[i + 1] - iptr[i];
    // compute dots
    std::vector<std::pair<int32_t, double>> dots;
    dots.reserve(cand.size());
    double mypi = 0.0;
    for (int32_t j : cand) {
      seen[j] = 0;
      double d = dot_sparse(S.col[j], aidx, aval, alen);
      if (j == (int32_t)i) mypi = d;
      else if (d != 0.0) dots.push_back({j, d});
    }
    if (compute_pi) {
      if (mypi == 0.0) mypi = 1.0;
      *pi_out = mypi;
      pi = mypi;
    }
    // update columns
    auto& si = S.col[i];
    double nrm = 0.0;
    for (auto& rv : si) nrm = std::max(nrm, std::fabs(rv.second));
    for (auto& jd : dots) {
      int32_t j = jd.first;
      double alpha = jd.second / pi;
      auto& sj = S.col[j];
      // merge sj - alpha*si (both sorted); only touched entries are subject
      // to the drop test, untouched entries pass through
      std::vector<std::pair<int32_t, double>> out;
      out.reserve(sj.size() + si.size());
      size_t a = 0, b = 0;
      while (a < sj.size() || b < si.size()) {
        int32_t ra = a < sj.size() ? sj[a].first : INT32_MAX;
        int32_t rb = b < si.size() ? si[b].first : INT32_MAX;
        if (ra < rb) {  // untouched: keep as-is
          out.push_back(sj[a]);
          ++a;
          continue;
        }
        int32_t r;
        double v;
        bool was_in;
        if (ra == rb) {
          r = ra; v = sj[a].second - alpha * si[b].second;
          ++a; ++b; was_in = true;
        } else {  // fill-in
          r = rb; v = -alpha * si[b].second;
          ++b; was_in = false;
        }
        bool keep = (r == j) || std::fabs(v) > droptol * nrm;
        if (keep) {
          out.push_back({r, v});
          if (!was_in) S.inv[r].push_back(j);
        } else if (was_in) {
          auto& vec = S.inv[r];
          for (size_t t = 0; t < vec.size(); ++t)
            if (vec[t] == j) { vec[t] = vec.back(); vec.pop_back(); break; }
        }
      }
      sj.swap(out);
      // bounded fill: keep only the max_col_nnz largest-|v| entries (the
      // diagonal always survives); keeps setup cost O(n * cap * band)
      if (max_col_nnz > 0 && (int64_t)sj.size() > max_col_nnz) {
        std::vector<std::pair<double, size_t>> mag;
        mag.reserve(sj.size());
        for (size_t t = 0; t < sj.size(); ++t)
          if (sj[t].first != j) mag.push_back({std::fabs(sj[t].second), t});
        int64_t nkeep = max_col_nnz - 1;  // slot for the diagonal
        if ((int64_t)mag.size() > nkeep) {
          std::nth_element(
              mag.begin(), mag.begin() + nkeep, mag.end(),
              [](auto& a, auto& b) { return a.first > b.first; });
          std::vector<char> kill(sj.size(), 0);
          for (size_t t = nkeep; t < mag.size(); ++t) kill[mag[t].second] = 1;
          std::vector<std::pair<int32_t, double>> pruned;
          pruned.reserve(max_col_nnz);
          for (size_t t = 0; t < sj.size(); ++t) {
            if (!kill[t]) {
              pruned.push_back(sj[t]);
            } else {
              auto& vec = S.inv[sj[t].first];
              for (size_t u = 0; u < vec.size(); ++u)
                if (vec[u] == j) { vec[u] = vec.back(); vec.pop_back(); break; }
            }
          }
          sj.swap(pruned);
        }
      }
    }
    return pi;
  };

  for (int64_t i = 0; i < n; ++i) {
    double pi = 0.0;
    sweep(Z, indptrR, indicesR, dataR, i, 0.0, true, &pi);
    res->invd[i] = 1.0 / pi;
    double dummy;
    sweep(W, indptrC, indicesC, dataC, i, pi, false, &dummy);
  }
  for (int64_t j = 0; j < n; ++j) {
    for (auto& rv : Z.col[j]) {
      res->zr.push_back(rv.first);
      res->zc.push_back(j);
      res->zv.push_back(rv.second);
    }
    for (auto& rv : W.col[j]) {  // Wt: row j, col = original row
      res->wr.push_back(j);
      res->wc.push_back(rv.first);
      res->wv.push_back(rv.second);
    }
  }
  return res;
}

int64_t gt_ainv_znnz(void* h) { return ((AinvResult*)h)->zv.size(); }
int64_t gt_ainv_wnnz(void* h) { return ((AinvResult*)h)->wv.size(); }

void gt_ainv_fetch(void* h, int64_t* zr, int64_t* zc, double* zv,
                   int64_t* wr, int64_t* wc, double* wv, double* invd) {
  auto* r = (AinvResult*)h;
  std::memcpy(zr, r->zr.data(), sizeof(int64_t) * r->zr.size());
  std::memcpy(zc, r->zc.data(), sizeof(int64_t) * r->zc.size());
  std::memcpy(zv, r->zv.data(), sizeof(double) * r->zv.size());
  std::memcpy(wr, r->wr.data(), sizeof(int64_t) * r->wr.size());
  std::memcpy(wc, r->wc.data(), sizeof(int64_t) * r->wc.size());
  std::memcpy(wv, r->wv.data(), sizeof(double) * r->wv.size());
  std::memcpy(invd, r->invd.data(), sizeof(double) * r->n);
}

void gt_ainv_free(void* h) { delete (AinvResult*)h; }

// ---------------------------------------------------------------------------
// Reverse Cuthill–McKee on the symmetrized pattern (replaces
// scipy.sparse.csgraph at scale; reference relies on METIS orderings).
// ---------------------------------------------------------------------------
int gt_rcm(int64_t n, const int64_t* indptr, const int32_t* indices,
           int64_t* perm) {
  // build symmetric adjacency (pattern of A + A^T), CSR
  std::vector<int64_t> deg(n, 0);
  for (int64_t i = 0; i < n; ++i)
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int32_t j = indices[p];
      if (j == i) continue;
      deg[i]++; deg[j]++;
    }
  std::vector<int64_t> aptr(n + 1, 0);
  for (int64_t i = 0; i < n; ++i) aptr[i + 1] = aptr[i] + deg[i];
  std::vector<int32_t> adj(aptr[n]);
  std::vector<int64_t> fill(aptr.begin(), aptr.end() - 1);
  for (int64_t i = 0; i < n; ++i)
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int32_t j = indices[p];
      if (j == i) continue;
      adj[fill[i]++] = j;
      adj[fill[j]++] = (int32_t)i;
    }
  // dedup neighbor lists
  std::vector<int64_t> aptr2(n + 1, 0);
  {
    int64_t w = 0;
    for (int64_t i = 0; i < n; ++i) {
      int64_t s = aptr[i], e = fill[i];
      std::sort(adj.begin() + s, adj.begin() + e);
      int64_t start = w;
      for (int64_t p = s; p < e; ++p)
        if (p == s || adj[p] != adj[p - 1]) adj[w++] = adj[p];
      aptr2[i] = start;
    }
    aptr2[n] = w;
    for (int64_t i = n; i > 0; --i) aptr2[i - 1] = std::min(aptr2[i - 1], aptr2[i]);
  }
  auto degree = [&](int64_t i) { return aptr2[i + 1] - aptr2[i]; };

  std::vector<int8_t> visited(n, 0);
  std::vector<int64_t> order;
  order.reserve(n);
  std::vector<int32_t> nbrs;
  for (;;) {
    // find unvisited node of minimum degree as component seed
    int64_t seed = -1, best = INT64_MAX;
    for (int64_t i = 0; i < n; ++i)
      if (!visited[i] && degree(i) < best) { best = degree(i); seed = i; }
    if (seed < 0) break;
    std::queue<int64_t> q;
    q.push(seed);
    visited[seed] = 1;
    while (!q.empty()) {
      int64_t u = q.front(); q.pop();
      order.push_back(u);
      nbrs.clear();
      for (int64_t p = aptr2[u]; p < aptr2[u + 1]; ++p)
        if (!visited[adj[p]]) { nbrs.push_back(adj[p]); visited[adj[p]] = 1; }
      std::sort(nbrs.begin(), nbrs.end(), [&](int32_t a, int32_t b) {
        return degree(a) < degree(b);
      });
      for (int32_t v : nbrs) q.push(v);
    }
  }
  for (int64_t i = 0; i < n; ++i) perm[i] = order[n - 1 - i];  // reverse
  return 0;
}

// ---------------------------------------------------------------------------
// Triangular dependency levels (level scheduling; leftILU.cu:339-368 /
// getLevel gmres.cu:1033-1077).
// ---------------------------------------------------------------------------
int gt_levels(int64_t n, const int64_t* indptr, const int32_t* indices,
              int lower, int32_t* level) {
  std::memset(level, 0, sizeof(int32_t) * n);
  if (lower) {
    for (int64_t i = 0; i < n; ++i) {
      int32_t lv = 0;
      for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
        int32_t j = indices[p];
        if (j < i && level[j] >= lv) lv = level[j] + 1;
      }
      level[i] = lv;
    }
  } else {
    for (int64_t i = n - 1; i >= 0; --i) {
      int32_t lv = 0;
      for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
        int32_t j = indices[p];
        if (j > i && level[j] >= lv) lv = level[j] + 1;
      }
      level[i] = lv;
    }
  }
  return 0;
}

}  // extern "C"
