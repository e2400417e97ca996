// kdtpu_host: native host runtime for kaldi_decoder_tpu.
//
// TPU-native replacement for the reference's native host layer — the
// OpenFst/kaldifst graph machinery it links against
// (/root/reference/cmake/kaldifst.cmake:1-69) and the host-side lattice
// algorithms it calls (fst::ShortestPath at
// kaldi-decoder/csrc/lattice-simple-decoder.cc:574-580, the backpointer
// walk at kaldi-decoder/csrc/faster-decoder.cc:356-424).  The device
// compute path is JAX/XLA; this library covers the host-side hot loops:
//
//   * OpenFst binary VectorFst parsing (arc types "standard" and
//     "lattice4") straight into flat arrays,
//   * OpenFst text-format parsing,
//   * direct FST -> emitting/epsilon CSR compilation (the device graph
//     layout, kaldi_decoder_tpu/fst/csr.py semantics),
//   * batched Viterbi backtrace over downloaded backpointer logs,
//   * lattice shortest-path over flat arc arrays (DAG DP).
//
// Pure C ABI (loaded via ctypes); no dependencies beyond the C++17
// standard library.  Every function is single-threaded and reentrant
// (no globals); callers may parallelize across handles.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <limits>
#include <memory>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();
constexpr int32_t kNoLabel = 0;

struct Fst {
  // Flat CSR-ish storage: arcs grouped by source state.
  int64_t num_states = 0;
  int64_t start = -1;
  int weight_dim = 1;  // 1 = tropical (StdArc), 2 = (graph, acoustic)
  std::vector<int64_t> row_ptr;     // (S+1)
  std::vector<int32_t> ilabel;      // (A)
  std::vector<int32_t> olabel;      // (A)
  std::vector<float> weight;        // (A * weight_dim)
  std::vector<int32_t> nextstate;   // (A)
  std::vector<float> final_w;       // (S * weight_dim), +inf == not final
};

void set_err(char* err, int errlen, const std::string& msg) {
  if (err && errlen > 0) {
    std::snprintf(err, static_cast<size_t>(errlen), "%s", msg.c_str());
  }
}

// ---------------------------------------------------------------------------
// Binary VectorFst parsing (OpenFst on-disk format)
// ---------------------------------------------------------------------------

struct Cursor {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  template <typename T>
  T read() {
    if (p + sizeof(T) > end) {
      ok = false;
      return T();
    }
    T v;
    std::memcpy(&v, p, sizeof(T));
    p += sizeof(T);
    return v;
  }

  std::string read_string() {
    int32_t n = read<int32_t>();
    if (!ok || n < 0 || p + n > end) {
      ok = false;
      return "";
    }
    std::string s(reinterpret_cast<const char*>(p), static_cast<size_t>(n));
    p += n;
    return s;
  }
};

constexpr int32_t kFstMagic = 2125659606;

Fst* parse_binary(const uint8_t* data, size_t len, char* err, int errlen) {
  Cursor c{data, data + len};
  int32_t magic = c.read<int32_t>();
  if (!c.ok || magic != kFstMagic) {
    set_err(err, errlen, "bad FST magic (not an OpenFst binary file)");
    return nullptr;
  }
  std::string fst_type = c.read_string();
  std::string arc_type = c.read_string();
  if (fst_type != "vector" && fst_type != "const") {
    set_err(err, errlen, "unsupported FST container type '" + fst_type +
                             "' (only 'vector'/'const'; convert with "
                             "fstconvert)");
    return nullptr;
  }
  int wd;
  if (arc_type == "standard") {
    wd = 1;
  } else if (arc_type == "lattice4") {
    wd = 2;
  } else {
    set_err(err, errlen, "unsupported arc type '" + arc_type + "'");
    return nullptr;
  }
  int32_t version = c.read<int32_t>();
  c.read<int32_t>();  // flags
  c.read<uint64_t>();  // properties
  int64_t start = c.read<int64_t>();
  int64_t num_states = c.read<int64_t>();
  int64_t num_arcs = c.read<int64_t>();
  if (!c.ok || version < 1 || version > 2) {
    set_err(err, errlen, "unsupported FST file version");
    return nullptr;
  }
  if (num_states < 0) num_states = 0;
  if (num_arcs < 0) num_arcs = 0;

  if (fst_type == "const") {
    // ConstFst<Arc, uint32> layout (openfst const-fst.h): after the
    // header come flat arrays -- per state {final weight(s), u32 pos,
    // u32 narcs, u32 niepsilons, u32 noepsilons}, then the packed arcs.
    // File version 1 aligns each array to a 16-byte boundary relative to
    // the file start; version 2 is unaligned.  This maps to CSR directly
    // (the reference binds ConstFst ctors,
    // python/csrc/simple-decoder.cc:16-21).
    auto align16 = [&]() {
      size_t off = static_cast<size_t>(c.p - data);
      size_t pad = (16 - (off & 15)) & 15;
      if (c.p + pad > c.end) { c.ok = false; return; }
      c.p += pad;
    };
    auto fst = std::make_unique<Fst>();
    fst->num_states = num_states;
    fst->start = start;
    fst->weight_dim = wd;
    fst->row_ptr.resize(static_cast<size_t>(num_states) + 1, 0);
    fst->final_w.resize(static_cast<size_t>(num_states) * wd);
    if (version == 1) align16();
    for (int64_t s = 0; s < num_states; ++s) {
      for (int k = 0; k < wd; ++k) {
        fst->final_w[static_cast<size_t>(s) * wd + k] = c.read<float>();
      }
      uint32_t pos = c.read<uint32_t>();
      uint32_t narcs = c.read<uint32_t>();
      c.read<uint32_t>();  // niepsilons
      c.read<uint32_t>();  // noepsilons
      if (!c.ok) {
        set_err(err, errlen, "truncated ConstFst state table");
        return nullptr;
      }
      if (static_cast<int64_t>(pos) + narcs > num_arcs ||
          static_cast<int64_t>(pos) != fst->row_ptr[static_cast<size_t>(s)]) {
        // ConstFst arc ranges are contiguous per state (the writer dumps
        // one flat arcs_ array); anything else is a corrupt file.
        set_err(err, errlen, "ConstFst state arc range not contiguous");
        return nullptr;
      }
      fst->row_ptr[static_cast<size_t>(s) + 1] =
          static_cast<int64_t>(pos) + narcs;
    }
    if (version == 1) align16();
    fst->ilabel.resize(static_cast<size_t>(num_arcs));
    fst->olabel.resize(static_cast<size_t>(num_arcs));
    fst->weight.resize(static_cast<size_t>(num_arcs) * wd);
    fst->nextstate.resize(static_cast<size_t>(num_arcs));
    const size_t arc_bytes = 12 + 4 * static_cast<size_t>(wd);
    if (c.p + static_cast<size_t>(num_arcs) * arc_bytes > c.end) {
      set_err(err, errlen, "truncated ConstFst arc table");
      return nullptr;
    }
    for (int64_t a = 0; a < num_arcs; ++a) {
      fst->ilabel[static_cast<size_t>(a)] = c.read<int32_t>();
      fst->olabel[static_cast<size_t>(a)] = c.read<int32_t>();
      for (int k = 0; k < wd; ++k) {
        fst->weight[static_cast<size_t>(a) * wd + k] = c.read<float>();
      }
      fst->nextstate[static_cast<size_t>(a)] = c.read<int32_t>();
    }
    return fst.release();
  }

  auto fst = std::make_unique<Fst>();
  fst->num_states = num_states;
  fst->start = start;
  fst->weight_dim = wd;
  fst->row_ptr.resize(static_cast<size_t>(num_states) + 1, 0);
  fst->final_w.resize(static_cast<size_t>(num_states) * wd);
  fst->ilabel.reserve(static_cast<size_t>(num_arcs));
  fst->olabel.reserve(static_cast<size_t>(num_arcs));
  fst->weight.reserve(static_cast<size_t>(num_arcs) * wd);
  fst->nextstate.reserve(static_cast<size_t>(num_arcs));

  const size_t arc_bytes = 12 + 4 * static_cast<size_t>(wd);
  for (int64_t s = 0; s < num_states; ++s) {
    for (int k = 0; k < wd; ++k) {
      fst->final_w[static_cast<size_t>(s) * wd + k] = c.read<float>();
    }
    int64_t narcs = c.read<int64_t>();
    if (!c.ok || narcs < 0 ||
        c.p + static_cast<size_t>(narcs) * arc_bytes > c.end) {
      set_err(err, errlen, "truncated FST file at state " + std::to_string(s));
      return nullptr;
    }
    for (int64_t a = 0; a < narcs; ++a) {
      fst->ilabel.push_back(c.read<int32_t>());
      fst->olabel.push_back(c.read<int32_t>());
      for (int k = 0; k < wd; ++k) fst->weight.push_back(c.read<float>());
      fst->nextstate.push_back(c.read<int32_t>());
    }
    fst->row_ptr[static_cast<size_t>(s) + 1] = static_cast<int64_t>(fst->ilabel.size());
  }
  return fst.release();
}

// ---------------------------------------------------------------------------
// Text-format parsing (fstcompile conventions; fst/io.py:235-273 semantics)
// ---------------------------------------------------------------------------

struct TextArc {
  int64_t src, dst;
  int32_t il, ol;
  float w0, w1;
};

Fst* parse_text(const char* text, int64_t len, int weight_dim, char* err,
                int errlen) {
  const char* p = text;
  const char* end = text + len;
  std::vector<TextArc> arcs;
  // (state, w0, w1) finals
  std::vector<int64_t> fin_state;
  std::vector<float> fin_w;
  int64_t max_state = -1;
  int64_t start = -1;
  int64_t lineno = 0;

  auto fail = [&](const std::string& msg) -> Fst* {
    set_err(err, errlen,
            "bad FST text line " + std::to_string(lineno) + ": " + msg);
    return nullptr;
  };

  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    const char* line_end = nl ? nl : end;
    ++lineno;
    // Tokenize on whitespace.
    const char* q = p;
    std::vector<std::string> tok;
    while (q < line_end) {
      while (q < line_end && (*q == ' ' || *q == '\t' || *q == '\r')) ++q;
      const char* t0 = q;
      while (q < line_end && *q != ' ' && *q != '\t' && *q != '\r') ++q;
      if (q > t0) tok.emplace_back(t0, q);
    }
    p = nl ? nl + 1 : end;
    if (tok.empty() || tok[0][0] == '#') continue;

    auto parse_w = [&](const std::string& s, float* w0, float* w1) -> bool {
      if (weight_dim == 1) {
        char* e = nullptr;
        *w0 = std::strtof(s.c_str(), &e);
        *w1 = 0.0f;
        return e && *e == '\0';
      }
      size_t comma = s.find(',');
      if (comma == std::string::npos) return false;
      char* e = nullptr;
      *w0 = std::strtof(s.substr(0, comma).c_str(), &e);
      if (!e || *e != '\0') return false;
      *w1 = std::strtof(s.c_str() + comma + 1, &e);
      return e && *e == '\0';
    };

    if (tok.size() <= 2) {  // final state
      int64_t s = std::strtoll(tok[0].c_str(), nullptr, 10);
      float w0 = 0.0f, w1 = 0.0f;
      if (tok.size() == 2 && !parse_w(tok[1], &w0, &w1))
        return fail("bad final weight");
      if (s > max_state) max_state = s;
      if (start < 0) start = s;
      fin_state.push_back(s);
      fin_w.push_back(w0);
      fin_w.push_back(w1);
    } else if (tok.size() == 4 || tok.size() == 5) {  // arc
      TextArc a;
      a.src = std::strtoll(tok[0].c_str(), nullptr, 10);
      a.dst = std::strtoll(tok[1].c_str(), nullptr, 10);
      a.il = static_cast<int32_t>(std::strtol(tok[2].c_str(), nullptr, 10));
      a.ol = static_cast<int32_t>(std::strtol(tok[3].c_str(), nullptr, 10));
      a.w0 = 0.0f;
      a.w1 = 0.0f;
      if (tok.size() == 5 && !parse_w(tok[4], &a.w0, &a.w1))
        return fail("bad arc weight");
      if (a.src > max_state) max_state = a.src;
      if (a.dst > max_state) max_state = a.dst;
      if (start < 0) start = a.src;
      arcs.push_back(a);
    } else {
      return fail("expected 1-2 (final) or 4-5 (arc) fields, got " +
                  std::to_string(tok.size()));
    }
  }

  const int wd = weight_dim;
  auto fst = std::make_unique<Fst>();
  int64_t S = max_state + 1;
  fst->num_states = S;
  fst->start = start;
  fst->weight_dim = wd;
  fst->final_w.assign(static_cast<size_t>(S) * wd, kInf);
  for (size_t i = 0; i < fin_state.size(); ++i) {
    for (int k = 0; k < wd; ++k)
      fst->final_w[static_cast<size_t>(fin_state[i]) * wd + k] =
          fin_w[2 * i + k];
  }
  // Counting sort arcs by source state (stable, preserves input order).
  fst->row_ptr.assign(static_cast<size_t>(S) + 1, 0);
  for (const auto& a : arcs) fst->row_ptr[static_cast<size_t>(a.src) + 1]++;
  for (int64_t s = 0; s < S; ++s)
    fst->row_ptr[static_cast<size_t>(s) + 1] += fst->row_ptr[static_cast<size_t>(s)];
  const size_t A = arcs.size();
  fst->ilabel.resize(A);
  fst->olabel.resize(A);
  fst->weight.resize(A * wd);
  fst->nextstate.resize(A);
  std::vector<int64_t> pos(fst->row_ptr.begin(), fst->row_ptr.end() - 1);
  for (const auto& a : arcs) {
    int64_t i = pos[static_cast<size_t>(a.src)]++;
    fst->ilabel[static_cast<size_t>(i)] = a.il;
    fst->olabel[static_cast<size_t>(i)] = a.ol;
    fst->weight[static_cast<size_t>(i) * wd] = a.w0;
    if (wd == 2) fst->weight[static_cast<size_t>(i) * wd + 1] = a.w1;
    fst->nextstate[static_cast<size_t>(i)] = static_cast<int32_t>(a.dst);
  }
  return fst.release();
}

}  // namespace

extern "C" {

// -- FST handles -------------------------------------------------------------

void* kd_fst_open(const char* path, char* err, int errlen) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    set_err(err, errlen, std::string("cannot open ") + path);
    return nullptr;
  }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(n));
  size_t got = n ? std::fread(buf.data(), 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  if (got != static_cast<size_t>(n)) {
    set_err(err, errlen, std::string("short read on ") + path);
    return nullptr;
  }
  return parse_binary(buf.data(), buf.size(), err, errlen);
}

void* kd_fst_open_bytes(const uint8_t* data, int64_t len, char* err,
                        int errlen) {
  return parse_binary(data, static_cast<size_t>(len), err, errlen);
}

void* kd_fst_open_text(const char* text, int64_t len, int weight_dim,
                       char* err, int errlen) {
  return parse_text(text, len, weight_dim, err, errlen);
}

void kd_fst_free(void* h) { delete static_cast<Fst*>(h); }

// info[0]=num_states, info[1]=num_arcs, info[2]=start, info[3]=weight_dim
void kd_fst_info(void* h, int64_t* info) {
  auto* f = static_cast<Fst*>(h);
  info[0] = f->num_states;
  info[1] = static_cast<int64_t>(f->ilabel.size());
  info[2] = f->start;
  info[3] = f->weight_dim;
}

// Copy the flat arrays into caller-allocated buffers (numpy).
void kd_fst_fill(void* h, int64_t* row_ptr, int32_t* ilabel, int32_t* olabel,
                 float* weight, int32_t* nextstate, float* final_w) {
  auto* f = static_cast<Fst*>(h);
  std::memcpy(row_ptr, f->row_ptr.data(), f->row_ptr.size() * sizeof(int64_t));
  size_t A = f->ilabel.size();
  std::memcpy(ilabel, f->ilabel.data(), A * sizeof(int32_t));
  std::memcpy(olabel, f->olabel.data(), A * sizeof(int32_t));
  std::memcpy(weight, f->weight.data(), f->weight.size() * sizeof(float));
  std::memcpy(nextstate, f->nextstate.data(), A * sizeof(int32_t));
  std::memcpy(final_w, f->final_w.data(), f->final_w.size() * sizeof(float));
}

// -- FST -> device CSR compile ------------------------------------------------
// Matches kaldi_decoder_tpu/fst/csr.py compile_fst(): stable partition of
// arcs into emitting (ilabel > 0) and epsilon (ilabel == 0) sub-CSRs, the
// CTC score index ilabel-1 pre-resolved (decodable-ctc.cc:22-29 convention),
// plus epsilon-depth / degree metadata.

// sizes[0] = n_emitting, sizes[1] = n_eps; returns 0 ok, -1 if weight_dim!=1.
int kd_csr_sizes(void* h, int64_t* sizes) {
  auto* f = static_cast<Fst*>(h);
  if (f->weight_dim != 1) return -1;
  int64_t n_em = 0;
  for (int32_t il : f->ilabel) n_em += (il != kNoLabel);
  sizes[0] = n_em;
  sizes[1] = static_cast<int64_t>(f->ilabel.size()) - n_em;
  return 0;
}

// meta[0]=eps_depth (-1 if cyclic), meta[1]=max_em_deg, meta[2]=max_eps_deg,
// meta[3]=max_score_idx.  Returns 0 ok.
int kd_csr_fill(void* h, int32_t* em_row_ptr, int32_t* em_il, int32_t* em_ol,
                float* em_w, int32_t* em_next, int32_t* em_sidx,
                int32_t* eps_row_ptr, int32_t* eps_ol, float* eps_w,
                int32_t* eps_next, float* final_cost, int64_t* meta) {
  auto* f = static_cast<Fst*>(h);
  if (f->weight_dim != 1) return -1;
  const int64_t S = f->num_states;
  em_row_ptr[0] = 0;
  eps_row_ptr[0] = 0;
  int64_t ne = 0, nz = 0;
  int64_t max_em = 0, max_eps = 0;
  int32_t max_sidx = -1;
  for (int64_t s = 0; s < S; ++s) {
    int64_t lo = f->row_ptr[static_cast<size_t>(s)];
    int64_t hi = f->row_ptr[static_cast<size_t>(s) + 1];
    int64_t ne0 = ne, nz0 = nz;
    for (int64_t a = lo; a < hi; ++a) {
      int32_t il = f->ilabel[static_cast<size_t>(a)];
      if (il != kNoLabel) {
        em_il[ne] = il;
        em_ol[ne] = f->olabel[static_cast<size_t>(a)];
        em_w[ne] = f->weight[static_cast<size_t>(a)];
        em_next[ne] = f->nextstate[static_cast<size_t>(a)];
        em_sidx[ne] = il - 1;
        if (il - 1 > max_sidx) max_sidx = il - 1;
        ++ne;
      } else {
        eps_ol[nz] = f->olabel[static_cast<size_t>(a)];
        eps_w[nz] = f->weight[static_cast<size_t>(a)];
        eps_next[nz] = f->nextstate[static_cast<size_t>(a)];
        ++nz;
      }
    }
    em_row_ptr[s + 1] = static_cast<int32_t>(ne);
    eps_row_ptr[s + 1] = static_cast<int32_t>(nz);
    if (ne - ne0 > max_em) max_em = ne - ne0;
    if (nz - nz0 > max_eps) max_eps = nz - nz0;
    final_cost[s] = f->final_w[static_cast<size_t>(s)];
  }
  // Epsilon depth: longest chain in the eps subgraph (Kahn), -1 if cyclic.
  // Mirrors fst/csr.py:_eps_depth and bounds the device closure iteration
  // count (the worklist at faster-decoder.cc:59-119 terminates likewise).
  int64_t depth_out = 0;
  if (nz > 0) {
    std::vector<int64_t> indeg(static_cast<size_t>(S), 0);
    for (int64_t a = 0; a < nz; ++a) indeg[static_cast<size_t>(eps_next[a])]++;
    std::vector<int64_t> depth(static_cast<size_t>(S), 0);
    std::vector<int64_t> stack;
    stack.reserve(static_cast<size_t>(S));
    for (int64_t s = 0; s < S; ++s)
      if (indeg[static_cast<size_t>(s)] == 0) stack.push_back(s);
    int64_t processed = 0;
    while (!stack.empty()) {
      int64_t s = stack.back();
      stack.pop_back();
      ++processed;
      for (int32_t a = eps_row_ptr[s]; a < eps_row_ptr[s + 1]; ++a) {
        int64_t t = eps_next[a];
        if (depth[static_cast<size_t>(t)] < depth[static_cast<size_t>(s)] + 1)
          depth[static_cast<size_t>(t)] = depth[static_cast<size_t>(s)] + 1;
        if (--indeg[static_cast<size_t>(t)] == 0) stack.push_back(t);
      }
    }
    if (processed != S) {
      depth_out = -1;  // cycle
    } else {
      for (int64_t s = 0; s < S; ++s)
        if (depth[static_cast<size_t>(s)] > depth_out)
          depth_out = depth[static_cast<size_t>(s)];
    }
  }
  meta[0] = depth_out;
  meta[1] = max_em;
  meta[2] = max_eps;
  meta[3] = max_sidx;
  return 0;
}

// -- Viterbi backtrace ---------------------------------------------------------
// Walks the per-frame backpointer logs the device decoder produced, exactly
// like the reference's Token::prev_ chain walk (faster-decoder.cc:393-406).
// Layout per utterance: an init eps block (D_init, K, 2), then per frame an
// emitting block (K, 2) and an eps block (D, K, 2).  Entry = (prev_slot,
// arc_id); arc_id == -1 means identity (no arc).
//
// Output: out[(n), 3] = (is_eps, arc_id, frame) in FORWARD order.
// Returns n >= 0, or -1 on dead slot (search failure), -2 if cap too small.
int64_t kd_backtrace(int64_t T, int64_t K, int64_t D, int64_t D_init,
                     int64_t slot0, const int32_t* bp_init,
                     const int32_t* bp_emit, const int32_t* bp_eps,
                     int32_t* out, int64_t cap) {
  constexpr int32_t kNoArc = -1;
  std::vector<int32_t> rev;  // packed (is_eps, arc, frame) back-to-front
  rev.reserve(static_cast<size_t>(3 * (T + D_init + 1)));
  int64_t slot = slot0;
  auto walk_eps = [&](const int32_t* block, int64_t depth, int64_t frame) {
    for (int64_t d = depth - 1; d >= 0; --d) {
      const int32_t* e = block + (d * K + slot) * 2;
      if (e[1] != kNoArc) {
        rev.push_back(1);
        rev.push_back(e[1]);
        rev.push_back(static_cast<int32_t>(frame));
      }
      slot = e[0];
    }
  };
  for (int64_t t = T - 1; t >= 0; --t) {
    walk_eps(bp_eps + t * D * K * 2, D, t);
    const int32_t* e = bp_emit + (t * K + slot) * 2;
    if (e[1] == kNoArc) return -1;  // dead backpointer: search failure
    rev.push_back(0);
    rev.push_back(e[1]);
    rev.push_back(static_cast<int32_t>(t));
    slot = e[0];
  }
  walk_eps(bp_init, D_init, -1);
  int64_t n = static_cast<int64_t>(rev.size()) / 3;
  if (n > cap) return -2;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t* src = rev.data() + (n - 1 - i) * 3;
    out[i * 3] = src[0];
    out[i * 3 + 1] = src[1];
    out[i * 3 + 2] = src[2];
  }
  return n;
}

// -- Lattice shortest path -----------------------------------------------------
// Natural-order shortest path over a lattice given as flat arc arrays
// (replaces fst::ShortestPath, lattice-simple-decoder.cc:574-580).  The
// lattice semiring compares by w_graph + w_acoustic; ties on the total
// prefer the SMALLER graph component (lattice-weight.h Compare semantics).
// w_graph / final_graph may be null for plain tropical (no tie-break).
// Requires an acyclic graph (decoder lattices always are).
//
// Output: indices of the best path's arcs in forward order.
// Returns n >= 0, -1 if no successful path, -2 if cyclic, -3 if cap too small.
int64_t kd_shortest_path(int64_t S, int64_t A, const int32_t* src,
                         const float* w_total, const float* w_graph,
                         const int32_t* dst, const float* final_total,
                         const float* final_graph, int64_t start, int32_t* out,
                         int64_t cap) {
  if (S <= 0 || start < 0 || start >= S) return -1;
  // CSR by source (counting sort keeps arc order stable).
  std::vector<int64_t> row(static_cast<size_t>(S) + 1, 0);
  for (int64_t a = 0; a < A; ++a) row[static_cast<size_t>(src[a]) + 1]++;
  for (int64_t s = 0; s < S; ++s) row[static_cast<size_t>(s) + 1] += row[static_cast<size_t>(s)];
  std::vector<int32_t> order(static_cast<size_t>(A));
  {
    std::vector<int64_t> pos(row.begin(), row.end() - 1);
    for (int64_t a = 0; a < A; ++a)
      order[static_cast<size_t>(pos[static_cast<size_t>(src[a])]++)] =
          static_cast<int32_t>(a);
  }
  // Topological order via Kahn.
  std::vector<int64_t> indeg(static_cast<size_t>(S), 0);
  for (int64_t a = 0; a < A; ++a) indeg[static_cast<size_t>(dst[a])]++;
  std::vector<int32_t> topo;
  topo.reserve(static_cast<size_t>(S));
  for (int64_t s = 0; s < S; ++s)
    if (indeg[static_cast<size_t>(s)] == 0) topo.push_back(static_cast<int32_t>(s));
  for (size_t i = 0; i < topo.size(); ++i) {
    int64_t s = topo[i];
    for (int64_t k = row[static_cast<size_t>(s)]; k < row[static_cast<size_t>(s) + 1]; ++k) {
      int64_t t = dst[order[static_cast<size_t>(k)]];
      if (--indeg[static_cast<size_t>(t)] == 0) topo.push_back(static_cast<int32_t>(t));
    }
  }
  if (static_cast<int64_t>(topo.size()) != S) return -2;  // cycle

  const double inf = std::numeric_limits<double>::infinity();
  std::vector<double> cost(static_cast<size_t>(S), inf);
  std::vector<double> gcost(static_cast<size_t>(S), inf);  // graph component
  std::vector<int32_t> back(static_cast<size_t>(S), -1);  // arc index into state
  cost[static_cast<size_t>(start)] = 0.0;
  gcost[static_cast<size_t>(start)] = 0.0;
  for (int32_t s : topo) {
    double c = cost[static_cast<size_t>(s)];
    if (c == inf) continue;
    double g = gcost[static_cast<size_t>(s)];
    for (int64_t k = row[static_cast<size_t>(s)]; k < row[static_cast<size_t>(s) + 1]; ++k) {
      int32_t a = order[static_cast<size_t>(k)];
      double nc = c + static_cast<double>(w_total[a]);
      double ng = g + (w_graph ? static_cast<double>(w_graph[a]) : 0.0);
      size_t t = static_cast<size_t>(dst[a]);
      if (nc < cost[t] || (nc == cost[t] && ng < gcost[t])) {
        cost[t] = nc;
        gcost[t] = ng;
        back[t] = a;
      }
    }
  }
  // Best final state (same natural-order tie-break).
  int64_t best_s = -1;
  double best_c = inf, best_g = inf;
  for (int64_t s = 0; s < S; ++s) {
    if (!std::isfinite(final_total[s])) continue;
    double c = cost[static_cast<size_t>(s)] + static_cast<double>(final_total[s]);
    double g = gcost[static_cast<size_t>(s)] +
               (final_graph ? static_cast<double>(final_graph[s]) : 0.0);
    if (c < best_c || (c == best_c && g < best_g)) {
      best_c = c;
      best_g = g;
      best_s = s;
    }
  }
  if (best_s < 0) return -1;
  // Walk back.
  std::vector<int32_t> rev;
  int64_t s = best_s;
  while (s != start) {
    int32_t a = back[static_cast<size_t>(s)];
    if (a < 0) break;  // start reached only through here if cost finite
    rev.push_back(a);
    s = src[a];
  }
  int64_t n = static_cast<int64_t>(rev.size());
  if (n > cap) return -3;
  for (int64_t i = 0; i < n; ++i) out[i] = rev[static_cast<size_t>(n - 1 - i)];
  return n;
}

// Standalone GetCutoff with exact reference semantics
// (faster-decoder.cc:244-336), exported so tests can pin the C++ decision
// table against the device implementation (ops/cutoff.py) on random
// frontiers.  costs: n finite token costs; out[0] = cutoff,
// out[1] = adaptive_beam.
void kd_get_cutoff(const float* costs, int64_t n, float beam,
                   int64_t max_active, int64_t min_active, float beam_delta,
                   double* out) {
  const double inf = std::numeric_limits<double>::infinity();
  double best = inf;
  std::vector<float> tmp(costs, costs + n);
  for (int64_t i = 0; i < n; ++i)
    best = std::min(best, static_cast<double>(costs[i]));
  double beam_cutoff = best + static_cast<double>(beam);
  double max_active_cutoff = inf;
  if (static_cast<int64_t>(tmp.size()) > max_active) {
    std::nth_element(tmp.begin(), tmp.begin() + max_active, tmp.end());
    max_active_cutoff = static_cast<double>(tmp[static_cast<size_t>(max_active)]);
  }
  if (max_active_cutoff < beam_cutoff) {
    out[0] = max_active_cutoff;
    out[1] = max_active_cutoff - best + static_cast<double>(beam_delta);
    return;
  }
  double min_active_cutoff = inf;
  if (static_cast<int64_t>(tmp.size()) > min_active) {
    if (min_active == 0) {
      min_active_cutoff = best;
    } else {
      std::nth_element(tmp.begin(), tmp.begin() + min_active,
                       static_cast<int64_t>(tmp.size()) > max_active
                           ? tmp.begin() + max_active
                           : tmp.end());
      min_active_cutoff = static_cast<double>(tmp[static_cast<size_t>(min_active)]);
    }
  }
  if (min_active_cutoff > beam_cutoff) {
    out[0] = min_active_cutoff;
    out[1] = min_active_cutoff - best + static_cast<double>(beam_delta);
    return;
  }
  out[0] = beam_cutoff;
  out[1] = beam;
}

// -- Single-threaded reference-algorithmics decoder ---------------------------
// The honest native CPU baseline (BASELINE.md): the reference FasterDecoder's
// per-frame algorithmics — GetCutoff with nth_element beam/max-active cutoffs
// and adaptive beam (faster-decoder.cc:244-336), hash-map token frontier with
// keep-the-cheaper insert (hash-list-inl.h:128-173 as used at
// faster-decoder.cc:212-228), best-token lookahead pre-tightening the next
// cutoff (faster-decoder.cc:174-189), emitting expansion over the CSR arc
// arrays, and the epsilon-closure worklist (faster-decoder.cc:59-119) — in
// compiled C++ over the same CSR graph the device decodes.  Original
// implementation; tokens carry a backpointer chain in an arena, as the
// reference's refcounted Token::prev_ chain does.
//
// Returns the best final-state cost (+inf if no final state was reached);
// out_stats[0] = frames decoded, out_stats[1] = total tokens created.
double kd_decode_faster(
    int64_t S, const int32_t* em_row_ptr, const int32_t* em_next,
    const float* em_w, const int32_t* em_sidx, const int32_t* eps_row_ptr,
    const int32_t* eps_next, const float* eps_w, const float* final_cost,
    int64_t start, int64_t T, int64_t V, const float* scores, float beam,
    int64_t max_active, int64_t min_active, float beam_delta,
    int64_t* out_stats) {
  struct Tok {
    double cost;
    int32_t prev;   // arena index of predecessor token (-1 at start)
    int32_t arc;    // arc taken to get here (emitting or eps id; -1 none)
  };
  std::vector<Tok> arena;
  arena.reserve(1 << 16);
  const double inf = std::numeric_limits<double>::infinity();

  // state -> arena index of its current token, per frontier.
  std::unordered_map<int32_t, int32_t> cur, nxt;
  cur.reserve(1024);
  nxt.reserve(1024);

  auto tok_cost = [&](int32_t idx) { return arena[static_cast<size_t>(idx)].cost; };

  // Epsilon-closure worklist under a cutoff (faster-decoder.cc:59-119).
  std::vector<int32_t> queue;
  auto process_nonemitting = [&](std::unordered_map<int32_t, int32_t>& toks,
                                 double cutoff) {
    queue.clear();
    for (auto& kv : toks) queue.push_back(kv.first);
    while (!queue.empty()) {
      int32_t s = queue.back();
      queue.pop_back();
      auto it = toks.find(s);
      if (it == toks.end()) continue;
      double c = tok_cost(it->second);
      if (c > cutoff) continue;
      int32_t me = it->second;
      for (int32_t a = eps_row_ptr[s]; a < eps_row_ptr[s + 1]; ++a) {
        double nc = c + static_cast<double>(eps_w[a]);
        if (nc > cutoff) continue;
        int32_t ns = eps_next[a];
        auto jt = toks.find(ns);
        if (jt == toks.end() || nc < tok_cost(jt->second)) {
          arena.push_back({nc, me, a});
          toks[ns] = static_cast<int32_t>(arena.size() - 1);
          queue.push_back(ns);
        }
      }
    }
  };

  // GetCutoff (faster-decoder.cc:244-336): beam cutoff, max/min-active
  // cutoffs via nth_element, adaptive beam.
  std::vector<float> tmp;
  auto get_cutoff = [&](std::unordered_map<int32_t, int32_t>& toks,
                        double* adaptive_beam, int32_t* best_tok) {
    double best = inf;
    int32_t best_idx = -1;
    if (max_active == std::numeric_limits<int64_t>::max() && min_active == 0) {
      for (auto& kv : toks) {
        double c = tok_cost(kv.second);
        if (c < best) {
          best = c;
          best_idx = kv.second;
        }
      }
      *adaptive_beam = beam;
      *best_tok = best_idx;
      return best + static_cast<double>(beam);
    }
    tmp.clear();
    for (auto& kv : toks) {
      double c = tok_cost(kv.second);
      tmp.push_back(static_cast<float>(c));
      if (c < best) {
        best = c;
        best_idx = kv.second;
      }
    }
    *best_tok = best_idx;
    double beam_cutoff = best + static_cast<double>(beam);
    double max_active_cutoff = inf;
    if (static_cast<int64_t>(tmp.size()) > max_active) {
      std::nth_element(tmp.begin(), tmp.begin() + max_active, tmp.end());
      max_active_cutoff = static_cast<double>(tmp[static_cast<size_t>(max_active)]);
    }
    if (max_active_cutoff < beam_cutoff) {
      *adaptive_beam = max_active_cutoff - best + static_cast<double>(beam_delta);
      return max_active_cutoff;
    }
    double min_active_cutoff = -inf;
    if (static_cast<int64_t>(tmp.size()) > min_active && min_active > 0) {
      // Reference takes tmp_array_[config_.min_active], the
      // (min_active+1)-th smallest (faster-decoder.cc:315-321).
      std::nth_element(tmp.begin(), tmp.begin() + min_active,
                       max_active_cutoff == inf
                           ? tmp.end()
                           : tmp.begin() + max_active);
      min_active_cutoff = static_cast<double>(tmp[static_cast<size_t>(min_active)]);
    }
    if (min_active_cutoff > beam_cutoff) {
      *adaptive_beam = min_active_cutoff - best + static_cast<double>(beam_delta);
      return min_active_cutoff;
    }
    *adaptive_beam = beam;
    return beam_cutoff;
  };

  // InitDecoding (faster-decoder.cc:42-56).
  arena.push_back({0.0, -1, -1});
  cur[static_cast<int32_t>(start)] = 0;
  process_nonemitting(cur, inf);

  int64_t frames = 0;
  for (int64_t t = 0; t < T && !cur.empty(); ++t, ++frames) {
    double adaptive_beam = beam;
    int32_t best_tok = -1;
    double weight_cutoff = get_cutoff(cur, &adaptive_beam, &best_tok);
    const float* row = scores + t * V;

    // Best-token lookahead pre-tightens the next frame's cutoff
    // (faster-decoder.cc:174-189).
    double next_weight_cutoff = inf;
    if (best_tok >= 0) {
      // find the best token's state (reverse lookup kept cheap: GetCutoff
      // remembered the arena index; we need its state's arcs, so scan cur)
      for (auto& kv : cur) {
        if (kv.second != best_tok) continue;
        int32_t s = kv.first;
        double c = tok_cost(best_tok);
        for (int32_t a = em_row_ptr[s]; a < em_row_ptr[s + 1]; ++a) {
          double nc = c + static_cast<double>(em_w[a]) -
                      static_cast<double>(row[em_sidx[a]]);
          if (nc + adaptive_beam < next_weight_cutoff)
            next_weight_cutoff = nc + adaptive_beam;
        }
        break;
      }
    }

    // ProcessEmitting (faster-decoder.cc:155-241).
    nxt.clear();
    for (auto& kv : cur) {
      int32_t s = kv.first;
      double c = tok_cost(kv.second);
      if (c > weight_cutoff) continue;
      for (int32_t a = em_row_ptr[s]; a < em_row_ptr[s + 1]; ++a) {
        double nc = c + static_cast<double>(em_w[a]) -
                    static_cast<double>(row[em_sidx[a]]);
        if (nc >= next_weight_cutoff) continue;
        if (nc + adaptive_beam < next_weight_cutoff)
          next_weight_cutoff = nc + adaptive_beam;
        int32_t ns = em_next[a];
        auto jt = nxt.find(ns);
        if (jt == nxt.end() || nc < tok_cost(jt->second)) {
          arena.push_back({nc, kv.second, a});
          nxt[ns] = static_cast<int32_t>(arena.size() - 1);
        }
      }
    }
    std::swap(cur, nxt);
    process_nonemitting(cur, next_weight_cutoff);
  }

  double best_final = inf;
  for (auto& kv : cur) {
    double fc = static_cast<double>(final_cost[kv.first]);
    if (std::isfinite(fc)) {
      double c = tok_cost(kv.second) + fc;
      if (c < best_final) best_final = c;
    }
  }
  if (out_stats) {
    out_stats[0] = frames;
    out_stats[1] = static_cast<int64_t>(arena.size());
  }
  return best_final;
}

// -- Single-threaded lattice-mode baseline ------------------------------------
// The apples-to-apples CPU baseline for the bench's lattice decode:
// LatticeSimpleDecoder's token/ForwardLink structure and windowed backward
// pruning (lattice-simple-decoder.cc:53-73 loop, :198-305 PruneActiveTokens /
// PruneForwardLinks, :364-402 ProcessEmitting link creation) UNIONED with
// FasterDecoder's GetCutoff max-active/adaptive-beam (faster-decoder.cc:
// 244-336) — the same capability the device decoder provides.  Original
// implementation over the CSR arrays.
//
// Returns the best final cost; out_stats = {frames, tokens_created,
// links_created, tokens_live, links_live}.
double kd_decode_lattice(
    int64_t S, const int32_t* em_row_ptr, const int32_t* em_next,
    const float* em_w, const int32_t* em_sidx, const int32_t* eps_row_ptr,
    const int32_t* eps_next, const float* eps_w, const float* final_cost,
    int64_t start, int64_t T, int64_t V, const float* scores, float beam,
    int64_t max_active, int64_t min_active, float beam_delta,
    float lattice_beam, int64_t prune_interval, int64_t* out_stats) {
  const double inf = std::numeric_limits<double>::infinity();
  struct Tok {
    double cost;
    double extra;
    int32_t link_head;  // index into links, -1 none
  };
  struct Link {
    int32_t dst;      // token arena index
    float w;          // graph + acoustic cost of the arc
    int32_t next;     // next link of the same src token
    bool alive;
  };
  std::vector<Tok> toks;
  std::vector<Link> links;
  toks.reserve(1 << 16);
  links.reserve(1 << 18);
  // frames[f]: state -> token index for frame f tokens.
  std::vector<std::unordered_map<int32_t, int32_t>> frames(1);

  auto add_link = [&](int32_t src, int32_t dst, double w) {
    links.push_back({dst, static_cast<float>(w), toks[static_cast<size_t>(src)].link_head, true});
    toks[static_cast<size_t>(src)].link_head = static_cast<int32_t>(links.size() - 1);
  };
  auto new_tok = [&](std::unordered_map<int32_t, int32_t>& m, int32_t s,
                     double c) {
    auto it = m.find(s);
    if (it == m.end()) {
      toks.push_back({c, 0.0, -1});
      int32_t idx = static_cast<int32_t>(toks.size() - 1);
      m[s] = idx;
      return std::pair<int32_t, bool>(idx, true);
    }
    bool better = c < toks[static_cast<size_t>(it->second)].cost;
    if (better) toks[static_cast<size_t>(it->second)].cost = c;
    return std::pair<int32_t, bool>(it->second, better);
  };

  // Eps closure creating links (lattice-simple-decoder.cc:122-191).
  std::vector<int32_t> queue;
  auto process_nonemitting = [&](std::unordered_map<int32_t, int32_t>& m,
                                 double cutoff) {
    queue.clear();
    for (auto& kv : m) queue.push_back(kv.first);
    while (!queue.empty()) {
      int32_t s = queue.back();
      queue.pop_back();
      int32_t me = m[s];
      double c = toks[static_cast<size_t>(me)].cost;
      if (c > cutoff) continue;
      for (int32_t a = eps_row_ptr[s]; a < eps_row_ptr[s + 1]; ++a) {
        double nc = c + static_cast<double>(eps_w[a]);
        if (nc > cutoff) continue;
        auto [idx, improved] = new_tok(m, eps_next[a], nc);
        add_link(me, idx, static_cast<double>(eps_w[a]));
        if (improved) queue.push_back(eps_next[a]);
      }
    }
  };

  // Backward extra-cost sweep over frames [0, upto] with the live
  // frontier's extras at 0 (PruneActiveTokens semantics).
  auto sweep = [&](size_t upto) {
    for (auto& kv : frames[upto])
      toks[static_cast<size_t>(kv.second)].extra = 0.0;
    for (size_t f = upto; f-- > 0;) {
      for (auto& kv : frames[f]) {
        Tok& t = toks[static_cast<size_t>(kv.second)];
        double ex = inf;
        for (int32_t li = t.link_head; li >= 0; li = links[static_cast<size_t>(li)].next) {
          Link& lk = links[static_cast<size_t>(li)];
          if (!lk.alive) continue;
          Tok& d = toks[static_cast<size_t>(lk.dst)];
          double slack = t.cost + static_cast<double>(lk.w) - d.cost;
          double le = d.extra + (slack < 0 ? 0 : slack);
          if (le > lattice_beam) {
            lk.alive = false;
            continue;
          }
          if (le < ex) ex = le;
        }
        t.extra = ex;
      }
      // (token deletion is represented by extra == inf; map erase elided —
      // the reference's PruneTokensForFrame frees them, we only need the
      // equivalent traversal work for an honest baseline)
    }
  };

  std::vector<float> tmp;
  auto get_cutoff = [&](std::unordered_map<int32_t, int32_t>& m,
                        double* adaptive_beam) {
    double best = inf;
    tmp.clear();
    for (auto& kv : m) {
      double c = toks[static_cast<size_t>(kv.second)].cost;
      tmp.push_back(static_cast<float>(c));
      if (c < best) best = c;
    }
    double beam_cutoff = best + static_cast<double>(beam);
    double max_cut = inf;
    if (static_cast<int64_t>(tmp.size()) > max_active) {
      std::nth_element(tmp.begin(), tmp.begin() + max_active, tmp.end());
      max_cut = static_cast<double>(tmp[static_cast<size_t>(max_active)]);
    }
    if (max_cut < beam_cutoff) {
      *adaptive_beam = max_cut - best + static_cast<double>(beam_delta);
      return max_cut;
    }
    *adaptive_beam = beam;
    return beam_cutoff;
  };

  toks.push_back({0.0, 0.0, -1});
  frames[0][static_cast<int32_t>(start)] = 0;
  process_nonemitting(frames[0], inf);

  int64_t frames_done = 0;
  for (int64_t t = 0; t < T && !frames[static_cast<size_t>(t)].empty();
       ++t, ++frames_done) {
    auto& cur = frames[static_cast<size_t>(t)];
    double adaptive_beam = beam;
    double cutoff = get_cutoff(cur, &adaptive_beam);
    const float* row = scores + t * V;
    frames.emplace_back();
    auto& nxt = frames.back();
    double next_cutoff = inf;
    for (auto& kv : cur) {
      int32_t s = kv.first;
      int32_t me = kv.second;
      double c = toks[static_cast<size_t>(me)].cost;
      if (c > cutoff) continue;
      for (int32_t a = em_row_ptr[s]; a < em_row_ptr[s + 1]; ++a) {
        double w = static_cast<double>(em_w[a]) -
                   static_cast<double>(row[em_sidx[a]]);
        double nc = c + w;
        if (nc >= next_cutoff) continue;
        if (nc + adaptive_beam < next_cutoff) next_cutoff = nc + adaptive_beam;
        auto [idx, improved] = new_tok(nxt, em_next[a], nc);
        add_link(me, idx, w);
        (void)improved;
      }
    }
    process_nonemitting(nxt, next_cutoff);
    if ((t + 1) % prune_interval == 0) sweep(static_cast<size_t>(t + 1));
  }
  sweep(frames.size() - 1);

  double best_final = inf;
  for (auto& kv : frames.back()) {
    double fc = static_cast<double>(final_cost[kv.first]);
    if (std::isfinite(fc)) {
      double c = toks[static_cast<size_t>(kv.second)].cost + fc;
      if (c < best_final) best_final = c;
    }
  }
  int64_t toks_live = 0, links_live = 0;
  for (auto& t : toks)
    if (std::isfinite(t.extra) && t.extra <= lattice_beam) toks_live++;
  for (auto& l : links)
    if (l.alive) links_live++;
  if (out_stats) {
    out_stats[0] = frames_done;
    out_stats[1] = static_cast<int64_t>(toks.size());
    out_stats[2] = static_cast<int64_t>(links.size());
    out_stats[3] = toks_live;
    out_stats[4] = links_live;
  }
  return best_final;
}

}  // extern "C"
