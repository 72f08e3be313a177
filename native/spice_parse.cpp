// Native SPICE-subset parser + MNA stamper (the data-loader fast path).
//
// Covers the reference parser (src/parser.cpp: two-pass parse +
// stampG/stampC/stampB at :1904/:2100/:2269, .SUBCKT handling at
// :273,569-602): elements R/C/L/V/I with DC / PWL(...) / PULSE(...)
// sources, directives .tran .print .include .end .op, '*'/'$' comments,
// '+' continuations, StrToNum engineering suffixes (parser.cpp:30-66),
// and HIERARCHICAL netlists: .SUBCKT/.ends definitions flattened through
// X instances with the Python flattener's exact node-naming semantics
// (ports resolve through the instance connection map, inner nodes get
// the "Xinst." prefix chain — frontend/spice.py handle_card).
//
// Semantics mirror gmres_tpu/frontend/{spice,mna}.py exactly — node ids
// are assigned in first-encounter element order (n1 then n2), I-source
// columns precede V-source columns, V/L branch rows follow node rows —
// so the native and Python paths produce identical matrices (tested in
// tests/test_frontend.py).

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <functional>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Triplets {
  std::vector<int64_t> r, c;
  std::vector<double> v;
  void push(int64_t i, int64_t j, double x) {
    r.push_back(i);
    c.push_back(j);
    v.push_back(x);
  }
};

// kind: 0 = dc, 1 = pwl, 2 = pulse
struct SrcRec {
  int32_t kind = 0;
  double dc = 0.0;
  double pulse[7] = {0, 0, 0, 0, 0, 0, 0};
  std::vector<double> times, values;  // pwl
};

struct Csr {
  std::vector<int64_t> indptr;
  std::vector<int32_t> indices;
  std::vector<double> data;
};

// Triplets -> canonical CSR (row-major, sorted cols, duplicates summed)
// via counting sort — the Python-side scipy conversion was the single
// largest cost at 1M nodes (5.4 s for ~20M triplets; this is ~1 s).
void triplets_to_csr(const Triplets& T, int64_t nrows, Csr* out) {
  int64_t nnz = (int64_t)T.v.size();
  std::vector<int64_t> cnt(nrows + 1, 0);
  for (int64_t k = 0; k < nnz; ++k) cnt[T.r[k] + 1]++;
  for (int64_t i = 0; i < nrows; ++i) cnt[i + 1] += cnt[i];
  std::vector<int32_t> cols(nnz);
  std::vector<double> vals(nnz);
  {
    std::vector<int64_t> pos(cnt.begin(), cnt.end() - 1);
    for (int64_t k = 0; k < nnz; ++k) {
      int64_t p = pos[T.r[k]]++;
      cols[p] = (int32_t)T.c[k];
      vals[p] = T.v[k];
    }
  }
  out->indptr.assign(nrows + 1, 0);
  out->indices.reserve(nnz);
  out->data.reserve(nnz);
  std::vector<std::pair<int32_t, double>> row;
  for (int64_t i = 0; i < nrows; ++i) {
    int64_t lo = cnt[i], hi = cnt[i + 1];
    row.clear();
    for (int64_t k = lo; k < hi; ++k) row.push_back({cols[k], vals[k]});
    std::sort(row.begin(), row.end(),
              [](auto& a, auto& b) { return a.first < b.first; });
    for (size_t k = 0; k < row.size(); ++k) {
      if (!out->indices.empty() && (int64_t)out->indices.size() > out->indptr[i]
          && out->indices.back() == row[k].first) {
        out->data.back() += row[k].second;
      } else {
        out->indices.push_back(row[k].first);
        out->data.push_back(row[k].second);
      }
    }
    out->indptr[i + 1] = (int64_t)out->indices.size();
  }
}

struct ParseResult {
  int64_t nn = 0, nv = 0, nl = 0, nsrc = 0;
  double tstep = 0.0, tstop = 0.0;
  Triplets G, C, B;
  Csr Gc, Cc, Bc;                     // canonical CSR forms
  std::vector<SrcRec> sources;        // I sources then V sources
  std::vector<int64_t> ports;         // node indices of .print nodes
  std::string port_names;             // '\n'-joined, parallel to ports
  std::string node_names;             // '\n'-joined, in node-index order
  std::string error;                  // non-empty => hard parse error
};

bool ieq(const std::string& a, const char* b) {
  size_t n = std::strlen(b);
  if (a.size() != n) return false;
  for (size_t i = 0; i < n; ++i)
    if (std::tolower((unsigned char)a[i]) != std::tolower((unsigned char)b[i]))
      return false;
  return true;
}

bool is_ground(const std::string& s) {
  return ieq(s, "0") || ieq(s, "gnd") || ieq(s, "gnd!") || ieq(s, "vss!");
}

bool starts_with_lower(const std::string& s, const char* pfx) {
  size_t n = std::strlen(pfx);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; ++i)
    if (std::tolower((unsigned char)s[i]) != pfx[i]) return false;
  return true;
}

// parse_value semantics (frontend/spice.py:35-55): number + optional
// engineering suffix; "meg" = 1e6, single-char suffixes t g k m u n p f,
// unknown trailing units ignored. The Python rule is an anchored
// ^num[alpha]*$ regex, so the suffix must be PURELY alphabetic — tokens
// like "1k5" or "1.8)" must fail here exactly as they raise there
// (identical-behavior invariant, tests/test_frontend.py).
bool parse_value(const char* tok, double* out) {
  char* end = nullptr;
  double v = std::strtod(tok, &end);
  if (end == tok) return false;
  while (*end == ' ' || *end == '\t') ++end;
  if (*end == '\0') {
    *out = v;
    return true;
  }
  // strtod also accepts hex/inf/nan forms the Python regex rejects; the
  // suffix check below only sees what strtod left, so additionally require
  // the consumed part to contain no 'x'/'inf'/'nan' characters — in
  // practice: reject any non-alphabetic remainder, and any alphabetic
  // remainder is validated as a known-or-unit suffix shape below.
  const char* tail = end;
  while (*tail && std::isalpha((unsigned char)*tail)) ++tail;
  while (*tail == ' ' || *tail == '\t') ++tail;   // regex allows \s*$
  if (*tail != '\0') return false;                // "1.8)", "1k5"
  char a = std::tolower((unsigned char)end[0]);
  char b = end[1] ? std::tolower((unsigned char)end[1]) : '\0';
  char c = end[2] ? std::tolower((unsigned char)end[2]) : '\0';
  double mult = 1.0;
  if (a == 'm' && b == 'e' && c == 'g') mult = 1e6;
  else if (a == 't') mult = 1e12;
  else if (a == 'g') mult = 1e9;
  else if (a == 'k') mult = 1e3;
  else if (a == 'm') mult = 1e-3;
  else if (a == 'u') mult = 1e-6;
  else if (a == 'n') mult = 1e-9;
  else if (a == 'p') mult = 1e-12;
  else if (a == 'f') mult = 1e-15;
  *out = v * mult;
  return true;
}

void split_tokens(const std::string& s, std::vector<std::string>* toks) {
  toks->clear();
  size_t i = 0, n = s.size();
  while (i < n) {
    while (i < n && std::isspace((unsigned char)s[i])) ++i;
    size_t j = i;
    while (j < n && !std::isspace((unsigned char)s[j])) ++j;
    if (j > i) toks->emplace_back(s, i, j - i);
    i = j;
  }
}

// Extract all numeric tokens (with suffixes) from a "( ... )" tail.
void extract_numbers(const std::string& s, size_t from,
                     std::vector<double>* out) {
  size_t i = from, n = s.size();
  while (i < n) {
    char ch = s[i];
    if (ch == '-' || ch == '+' || ch == '.' ||
        std::isdigit((unsigned char)ch)) {
      size_t j = i;
      if (s[j] == '-' || s[j] == '+') ++j;
      bool any = false;
      while (j < n && (std::isdigit((unsigned char)s[j]) || s[j] == '.')) {
        ++j;
        any = true;
      }
      if (!any) {
        ++i;
        continue;
      }
      if (j < n && (s[j] == 'e' || s[j] == 'E')) {
        size_t k = j + 1;
        if (k < n && (s[k] == '+' || s[k] == '-')) ++k;
        size_t d = k;
        while (d < n && std::isdigit((unsigned char)s[d])) ++d;
        if (d > k) j = d;
      }
      size_t suf = j;
      while (suf < n && std::isalpha((unsigned char)s[suf])) ++suf;
      double v;
      if (parse_value(s.substr(i, suf - i).c_str(), &v)) out->push_back(v);
      i = suf;
    } else {
      ++i;
    }
  }
}

struct ElemRec {
  char kind;                  // R C L V I
  int64_t a, b;               // node ids (-1 = ground)
  double value;               // R/C/L
  int32_t src = -1;           // index into sources (V/I)
};

bool read_logical_lines(const std::string& path,
                        std::vector<std::string>* out, std::string* err) {
  std::ifstream f(path);
  if (!f) {
    *err = "cannot open " + path;
    return false;
  }
  std::string base;
  {
    size_t p = path.find_last_of('/');
    base = (p == std::string::npos) ? std::string(".") : path.substr(0, p);
  }
  std::string line;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    size_t b = line.find_first_not_of(" \t");
    if (b == std::string::npos) continue;
    size_t e = line.find_last_not_of(" \t");
    std::string s = line.substr(b, e - b + 1);
    if (s[0] == '*' || s[0] == '$') continue;
    if (s[0] == '+') {
      if (out->empty()) {
        *err = path + ": continuation with no prior line";
        return false;
      }
      out->back() += " " + s.substr(1);
      continue;
    }
    if (starts_with_lower(s, ".include") || starts_with_lower(s, ".inc ")) {
      size_t sp = s.find_first_of(" \t");
      if (sp == std::string::npos) {
        *err = path + ": bad .include";
        return false;
      }
      std::string inc = s.substr(s.find_first_not_of(" \t", sp));
      // strip quotes
      while (!inc.empty() && (inc.front() == '\'' || inc.front() == '"'))
        inc.erase(inc.begin());
      while (!inc.empty() && (inc.back() == '\'' || inc.back() == '"'))
        inc.pop_back();
      if (!inc.empty() && inc[0] != '/') inc = base + "/" + inc;
      if (!read_logical_lines(inc, out, err)) return false;
      continue;
    }
    out->push_back(std::move(s));
  }
  return true;
}

}  // namespace

extern "C" {

// Returns a ParseResult* handle, or NULL. When NULL, check
// gt_parse_last_error(): empty string => hierarchical netlist (caller
// should fall back to the Python parser); otherwise a hard error message.
static thread_local std::string g_parse_err;

const char* gt_parse_last_error() { return g_parse_err.c_str(); }

void* gt_parse_netlist(const char* path) {
  g_parse_err.clear();
  std::vector<std::string> lines;
  std::string err;
  if (!read_logical_lines(path, &lines, &err)) {
    g_parse_err = err;
    return nullptr;
  }

  // phase 1 (frontend/spice.py parse_netlist): split .SUBCKT definitions
  // from top-level cards. A .subckt starting inside an unfinished one
  // silently replaces it; an unfinished definition at EOF is dropped —
  // both mirror the Python flattener exactly.
  struct Subckt {
    std::vector<std::string> ports;
    std::vector<std::string> lines;
  };
  std::unordered_map<std::string, Subckt> subckts;
  std::vector<std::string> top;
  Subckt cur;
  std::string cur_name;
  bool in_sub = false;
  for (auto& s : lines) {
    if (starts_with_lower(s, ".subckt")) {
      std::vector<std::string> t;
      split_tokens(s, &t);
      if (t.size() < 2) {
        g_parse_err = "bad .subckt: " + s;
        return nullptr;
      }
      cur = Subckt();
      cur_name = t[1];
      std::transform(cur_name.begin(), cur_name.end(), cur_name.begin(),
                     ::tolower);
      cur.ports.assign(t.begin() + 2, t.end());
      in_sub = true;
      continue;
    }
    if (starts_with_lower(s, ".ends")) {
      if (!in_sub) {
        g_parse_err = ".ends without .subckt";
        return nullptr;
      }
      subckts[cur_name] = std::move(cur);
      in_sub = false;
      continue;
    }
    (in_sub ? cur.lines : top).push_back(std::move(s));
  }

  auto* res = new ParseResult();
  std::unordered_map<std::string, int64_t> node_index;
  node_index.reserve(1 << 20);
  std::vector<const std::string*> name_order;
  name_order.reserve(1 << 20);

  auto node = [&](const std::string& nm) -> int64_t {
    if (is_ground(nm)) return -1;
    auto it = node_index.find(nm);
    if (it != node_index.end()) return it->second;
    int64_t id = (int64_t)node_index.size();
    auto ins = node_index.emplace(nm, id);
    name_order.push_back(&ins.first->first);
    return id;
  };

  std::vector<ElemRec> elems;
  elems.reserve(top.size());
  std::vector<SrcRec> i_srcs, v_srcs;
  std::vector<std::string> print_names;

  // phase 2: recursive flattening (frontend/spice.py handle_card). Every
  // element's nodes resolve through the instance port map, else take the
  // "Xinst." prefix chain; ground stays ground.
  using PortMap = std::unordered_map<std::string, std::string>;
  std::function<bool(const std::string&, const std::string&,
                     const PortMap&, int)> handle =
      [&](const std::string& s, const std::string& prefix,
          const PortMap& portmap, int depth) -> bool {
    if (depth > 100) {
      g_parse_err = "subckt nesting too deep (cycle?)";
      return false;
    }
    std::vector<std::string> toks;
    auto mapnode = [&](const std::string& nm) -> std::string {
      if (is_ground(nm)) return "0";
      auto it = portmap.find(nm);
      if (it != portmap.end()) return it->second;
      return prefix.empty() ? nm : prefix + nm;
    };
    char c0 = std::toupper((unsigned char)s[0]);
    if (c0 == '.') {
      if (starts_with_lower(s, ".tran")) {
        split_tokens(s, &toks);
        if (toks.size() < 3 || !parse_value(toks[1].c_str(), &res->tstep) ||
            !parse_value(toks[2].c_str(), &res->tstop)) {
          g_parse_err = "bad .tran: " + s;
          return false;
        }
      } else if (starts_with_lower(s, ".print")) {
        // v(NAME) tokens; fallback: bare tokens minus tran/dc/ac
        bool found = false;
        for (size_t i = 0; i + 1 < s.size(); ++i) {
          if ((s[i] == 'v' || s[i] == 'V') && s[i + 1] == '(') {
            size_t j = s.find(')', i + 2);
            if (j == std::string::npos) break;
            std::string nm = s.substr(i + 2, j - i - 2);
            size_t b = nm.find_first_not_of(" \t");
            size_t e = nm.find_last_not_of(" \t");
            if (b != std::string::npos)
              print_names.push_back(nm.substr(b, e - b + 1));
            found = true;
            i = j;
          }
        }
        if (!found) {
          split_tokens(s, &toks);
          for (size_t i = 1; i < toks.size(); ++i)
            if (!ieq(toks[i], "tran") && !ieq(toks[i], "dc") &&
                !ieq(toks[i], "ac"))
              print_names.push_back(toks[i]);
        }
      }
      return true;  // .end/.op/unknown dot-cards ignored
    }
    if (c0 == 'X') {
      split_tokens(s, &toks);
      if (toks.size() < 2) {
        g_parse_err = "short X card: " + s;
        return false;
      }
      std::string subname = toks.back();
      std::transform(subname.begin(), subname.end(), subname.begin(),
                     ::tolower);
      auto it = subckts.find(subname);
      if (it == subckts.end()) {
        g_parse_err = "unknown subckt " + toks.back() + " in: " + s;
        return false;
      }
      const Subckt& sub = it->second;
      if (toks.size() - 2 != sub.ports.size()) {
        g_parse_err = toks[0] + ": wrong connection count for subckt " +
                      subname;
        return false;
      }
      PortMap inner;
      inner.reserve(sub.ports.size() * 2);
      for (size_t i = 0; i < sub.ports.size(); ++i)
        inner[sub.ports[i]] = mapnode(toks[1 + i]);
      std::string inst_prefix = prefix + toks[0] + ".";
      for (const auto& inner_line : sub.lines)
        if (!handle(inner_line, inst_prefix, inner, depth + 1)) return false;
      return true;
    }
    if (c0 == 'R' || c0 == 'C' || c0 == 'L') {
      split_tokens(s, &toks);
      if (toks.size() < 4) {
        g_parse_err = "short element card: " + s;
        return false;
      }
      double v;
      if (!parse_value(toks[3].c_str(), &v)) {
        g_parse_err = "bad numeric token in: " + s;
        return false;
      }
      if (c0 == 'R' && v == 0.0) {
        g_parse_err = toks[0] + ": zero resistance";
        return false;
      }
      elems.push_back({c0, node(mapnode(toks[1])), node(mapnode(toks[2])),
                       v, -1});
    } else if (c0 == 'V' || c0 == 'I') {
      split_tokens(s, &toks);
      if (toks.size() < 3) {
        g_parse_err = "short source card: " + s;
        return false;
      }
      // waveform tail = tokens[3:]
      std::string tail;
      for (size_t i = 3; i < toks.size(); ++i) {
        if (i > 3) tail += " ";
        tail += toks[i];
      }
      std::string up = tail;
      std::transform(up.begin(), up.end(), up.begin(), ::toupper);
      SrcRec sr;
      size_t p;
      if ((p = up.find("PWL")) != std::string::npos) {
        std::vector<double> nums;
        extract_numbers(tail, p + 3, &nums);
        if (nums.size() % 2 != 0) {
          g_parse_err = "odd PWL pair count in: " + s;
          return false;
        }
        size_t np = nums.size() / 2;
        std::vector<size_t> order(np);
        for (size_t i = 0; i < np; ++i) order[i] = i;
        std::stable_sort(order.begin(), order.end(),
                         [&](size_t x, size_t y) {
                           return nums[2 * x] < nums[2 * y];
                         });
        sr.kind = 1;
        for (size_t i = 0; i < np; ++i) {
          sr.times.push_back(nums[2 * order[i]]);
          sr.values.push_back(nums[2 * order[i] + 1]);
        }
        sr.dc = np ? sr.values[0] : 0.0;
      } else if ((p = up.find("PULSE")) != std::string::npos) {
        std::vector<double> nums;
        extract_numbers(tail, p + 5, &nums);
        nums.resize(7, 0.0);
        sr.kind = 2;
        for (int i = 0; i < 7; ++i) sr.pulse[i] = nums[i];
      } else {
        sr.kind = 0;
        sr.dc = 0.0;
        for (size_t i = 3; i < toks.size(); ++i) {
          if (ieq(toks[i], "dc")) continue;
          double v;
          if (parse_value(toks[i].c_str(), &v)) {
            sr.dc = v;
            break;
          }
          g_parse_err = "bad numeric token in: " + s;
          return false;
        }
      }
      int32_t idx;
      if (c0 == 'I') {
        idx = (int32_t)i_srcs.size();
        i_srcs.push_back(std::move(sr));
      } else {
        idx = (int32_t)v_srcs.size();
        v_srcs.push_back(std::move(sr));
      }
      elems.push_back({c0, node(mapnode(toks[1])), node(mapnode(toks[2])),
                       0.0, idx});
    }
    // other element kinds ignored (matches the Python parser)
    return true;
  };

  for (const auto& s : top) {
    if (!handle(s, std::string(), PortMap(), 0)) {
      delete res;
      return nullptr;
    }
  }

  int64_t nn = (int64_t)node_index.size();
  int64_t nv = (int64_t)v_srcs.size();
  int64_t ni = (int64_t)i_srcs.size();
  int64_t nl = 0;
  for (const auto& e : elems)
    if (e.kind == 'L') ++nl;
  res->nn = nn;
  res->nv = nv;
  res->nl = nl;
  res->nsrc = nv + ni;

  Triplets& G = res->G;
  Triplets& C = res->C;
  Triplets& B = res->B;
  G.r.reserve(elems.size() * 4);
  G.c.reserve(elems.size() * 4);
  G.v.reserve(elems.size() * 4);

  auto stamp_pair = [](Triplets& T, int64_t a, int64_t b, double val) {
    if (a >= 0) T.push(a, a, val);
    if (b >= 0) T.push(b, b, val);
    if (a >= 0 && b >= 0) {
      T.push(a, b, -val);
      T.push(b, a, -val);
    }
  };

  int64_t iv = 0, il = 0;
  for (const auto& e : elems) {
    switch (e.kind) {
      case 'R':
        stamp_pair(G, e.a, e.b, 1.0 / e.value);
        break;
      case 'C':
        stamp_pair(C, e.a, e.b, e.value);
        break;
      case 'L': {
        int64_t k = nn + nv + il;
        ++il;
        if (e.a >= 0) {
          G.push(e.a, k, 1.0);
          G.push(k, e.a, 1.0);
        }
        if (e.b >= 0) {
          G.push(e.b, k, -1.0);
          G.push(k, e.b, -1.0);
        }
        C.push(k, k, -e.value);
        break;
      }
      case 'V': {
        int64_t k = nn + iv;
        int64_t col = ni + iv;
        ++iv;
        if (e.a >= 0) {
          G.push(e.a, k, 1.0);
          G.push(k, e.a, 1.0);
        }
        if (e.b >= 0) {
          G.push(e.b, k, -1.0);
          G.push(k, e.b, -1.0);
        }
        B.push(k, col, 1.0);
        break;
      }
      case 'I': {
        if (e.a >= 0) B.push(e.a, e.src, -1.0);
        if (e.b >= 0) B.push(e.b, e.src, 1.0);
        break;
      }
    }
  }

  res->sources = std::move(i_srcs);
  for (auto& s : v_srcs) res->sources.push_back(std::move(s));

  for (const auto& p : print_names) {
    auto it = node_index.find(p);
    if (it != node_index.end()) {
      res->ports.push_back(it->second);
      if (!res->port_names.empty()) res->port_names += "\n";
      res->port_names += p;
    }
  }
  for (size_t i = 0; i < name_order.size(); ++i) {
    if (i) res->node_names += "\n";
    res->node_names += *name_order[i];
  }
  int64_t size = nn + nv + nl;
  triplets_to_csr(res->G, size, &res->Gc);
  triplets_to_csr(res->C, size, &res->Cc);
  triplets_to_csr(res->B, size, &res->Bc);
  res->G = Triplets();
  res->C = Triplets();
  res->B = Triplets();
  return res;
}

// L stamps: value lives in elems; re-expose L values for C[k,k]... (already
// stamped above). Dim/section getters:
int64_t gt_parse_dim(void* h, int32_t what) {
  auto* r = (ParseResult*)h;
  switch (what) {
    case 0: return r->nn;
    case 1: return r->nv;
    case 2: return r->nl;
    case 3: return r->nsrc;
    case 4: return (int64_t)r->Gc.data.size();
    case 5: return (int64_t)r->Cc.data.size();
    case 6: return (int64_t)r->Bc.data.size();
    case 7: return (int64_t)r->ports.size();
    case 8: return (int64_t)r->port_names.size();
    case 9: return (int64_t)r->node_names.size();
    case 10: return (int64_t)r->sources.size();
    case 11: {  // total PWL breakpoint count across sources
      int64_t t = 0;
      for (const auto& s : r->sources) t += (int64_t)s.times.size();
      return t;
    }
  }
  return -1;
}

double gt_parse_time(void* h, int32_t what) {
  auto* r = (ParseResult*)h;
  return what == 0 ? r->tstep : r->tstop;
}

void gt_parse_fetch_csr(void* h, int32_t which, int64_t* indptr,
                        int32_t* indices, double* data) {
  auto* r = (ParseResult*)h;
  Csr* M = which == 0 ? &r->Gc : which == 1 ? &r->Cc : &r->Bc;
  std::memcpy(indptr, M->indptr.data(), M->indptr.size() * sizeof(int64_t));
  std::memcpy(indices, M->indices.data(),
              M->indices.size() * sizeof(int32_t));
  std::memcpy(data, M->data.data(), M->data.size() * sizeof(double));
}

void gt_parse_fetch_ports(void* h, int64_t* ports, char* names) {
  auto* r = (ParseResult*)h;
  std::memcpy(ports, r->ports.data(), r->ports.size() * sizeof(int64_t));
  std::memcpy(names, r->port_names.data(), r->port_names.size());
}

void gt_parse_fetch_node_names(void* h, char* names) {
  auto* r = (ParseResult*)h;
  std::memcpy(names, r->node_names.data(), r->node_names.size());
}

// Batched source export: meta[k*10 .. k*10+9] = [kind, dc, p0..p6, npwl];
// PWL breakpoints concatenated into (t_all, v_all) in source order.
void gt_parse_fetch_sources(void* h, double* meta, double* t_all,
                            double* v_all) {
  auto* r = (ParseResult*)h;
  int64_t off = 0;
  for (size_t k = 0; k < r->sources.size(); ++k) {
    const SrcRec& s = r->sources[k];
    double* m = meta + k * 10;
    m[0] = (double)s.kind;
    m[1] = s.dc;
    for (int i = 0; i < 7; ++i) m[2 + i] = s.pulse[i];
    m[9] = (double)s.times.size();
    std::memcpy(t_all + off, s.times.data(),
                s.times.size() * sizeof(double));
    std::memcpy(v_all + off, s.values.data(),
                s.values.size() * sizeof(double));
    off += (int64_t)s.times.size();
  }
}

void gt_parse_free(void* h) { delete (ParseResult*)h; }

}  // extern "C"
