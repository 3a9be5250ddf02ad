// Native data-plane kernels for the host input pipeline.
//
// Role: the reference burns host CPU in forked DataLoader workers on
// per-example tokenization + base64 feature decode (SURVEY.md §3 hot loop 4,
// `oscar/oscar_datasets_ml/oscar_tsv4.py` __getitem__ path). On TPU the host
// must stay ahead of the device, so these two hot host ops are implemented
// natively with a plain C ABI (loaded via ctypes; no pybind11 needed):
//
//   - greedy WordPiece tokenization over a hash-map vocab (ASCII fast path:
//     lowercase + punctuation split + greedy longest-match with "##"
//     continuations — exact same algorithm as data/tokenization.py, which
//     remains the reference implementation and the non-ASCII fallback),
//   - base64 -> float32 region-feature decode (predictions.tsv contract).
//
// Build: g++ -O3 -shared -fPIC -o libfastdata.so fastdata.cpp
//
// Thread safety: vocab handles are immutable after load; all entry points
// are reentrant (callers may tokenize from many threads).

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

struct Vocab {
  std::unordered_map<std::string, int32_t> map;
  int32_t unk_id;
  int32_t max_chars_per_word;
};

// --------------------------------------------------------------------------
// vocab
// --------------------------------------------------------------------------

void* vocab_create() { return new Vocab{{}, 1, 100}; }

void vocab_add(void* handle, const char* token, int32_t id) {
  static_cast<Vocab*>(handle)->map.emplace(token, id);
}

void vocab_finalize(void* handle, int32_t unk_id) {
  static_cast<Vocab*>(handle)->unk_id = unk_id;
}

void vocab_free(void* handle) { delete static_cast<Vocab*>(handle); }

int32_t vocab_size(void* handle) {
  return static_cast<int32_t>(static_cast<Vocab*>(handle)->map.size());
}

// --------------------------------------------------------------------------
// tokenization (ASCII fast path)
// --------------------------------------------------------------------------

static inline bool is_ascii_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

static void wordpiece(const Vocab& v, const std::string& word,
                      std::vector<int32_t>& out) {
  if ((int32_t)word.size() > v.max_chars_per_word) {
    out.push_back(v.unk_id);
    return;
  }
  size_t start = 0;
  std::vector<int32_t> subs;
  std::string buf;
  while (start < word.size()) {
    size_t end = word.size();
    int32_t cur = -1;
    while (start < end) {
      buf.clear();
      if (start > 0) buf = "##";
      buf.append(word, start, end - start);
      auto it = v.map.find(buf);
      if (it != v.map.end()) {
        cur = it->second;
        break;
      }
      --end;
    }
    if (cur < 0) {
      out.push_back(v.unk_id);
      return;
    }
    subs.push_back(cur);
    start = end;
  }
  out.insert(out.end(), subs.begin(), subs.end());
}

// returns n tokens written, or -1 if text is not pure printable ASCII
// (caller falls back to the Python tokenizer for unicode).
int32_t tokenize_ascii(void* handle, const char* text, int32_t text_len,
                       int32_t* out, int32_t max_out) {
  const Vocab& v = *static_cast<Vocab*>(handle);
  std::vector<int32_t> ids;
  ids.reserve(64);
  std::string word;
  auto flush = [&]() {
    if (!word.empty()) {
      wordpiece(v, word, ids);
      word.clear();
    }
  };
  for (int32_t i = 0; i < text_len; ++i) {
    unsigned char c = text[i];
    if (c >= 128) return -1;  // non-ASCII: python fallback
    if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
      flush();
    } else if (is_ascii_punct(c)) {
      flush();
      word.assign(1, (char)c);
      flush();
    } else {
      if (c < 32) continue;  // control chars dropped
      word.push_back((char)((c >= 'A' && c <= 'Z') ? c + 32 : c));
    }
  }
  flush();
  int32_t n = (int32_t)ids.size();
  if (n > max_out) n = max_out;
  std::memcpy(out, ids.data(), n * sizeof(int32_t));
  return n;
}

// --------------------------------------------------------------------------
// base64 -> bytes (feature decode)
// --------------------------------------------------------------------------

static const int8_t B64_INV[256] = {
    /* built lazily below */};

static int8_t* b64_table() {
  static int8_t table[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i) table[i] = -1;
    const char* alpha =
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
    for (int i = 0; i < 64; ++i) table[(unsigned char)alpha[i]] = (int8_t)i;
    init = true;
  }
  return table;
}

// returns bytes written, or -1 on invalid input
int32_t b64_decode(const char* in, int32_t in_len, uint8_t* out,
                   int32_t max_out) {
  const int8_t* tbl = b64_table();
  int32_t n = 0;
  uint32_t acc = 0;
  int bits = 0;
  for (int32_t i = 0; i < in_len; ++i) {
    unsigned char c = in[i];
    if (c == '=' || c == '\n' || c == '\r') continue;
    int8_t v = tbl[c];
    if (v < 0) return -1;
    acc = (acc << 6) | (uint32_t)v;
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      if (n >= max_out) return -1;
      out[n++] = (uint8_t)((acc >> bits) & 0xFF);
    }
  }
  return n;
}

}  // extern "C"
