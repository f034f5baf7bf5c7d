// Fast GloVe scan/filter for the data-prep path.
//
// The reference scans the 2.2M-line glove.840B.300d.txt TWICE in Python
// (util/data_gen.py:129-153: once for the vocab set, once for the vectors).
// This native kernel does membership + vector extraction in ONE streaming
// pass with a hash map over the (small) corpus vocabulary.
//
// Parsing parity with the Python path (data_gen.py:133-135, 148-152):
//   tokens = line.lstrip().rstrip().split(' ')   [single-space split]
//   skip if len(tokens) == 2 or len(tokens) != dim + 1
//   vector = [float(x) for x in tokens[1:]]      [parsed as double, then
//                                                  stored as float32]
// Duplicate words keep the LAST occurrence, matching the Python dict
// assignment semantics.
//
// Exposed via ctypes:
//   long glove_filter(const char* glove_path,
//                     const char* words,       // '\n'-joined UTF-8 queries
//                     long n_words,
//                     long dim,
//                     float* out_vectors,      // [n_words * dim], caller-zeroed
//                     unsigned char* found)    // [n_words]
//   returns #distinct query words found, or -1 on I/O error.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" long glove_filter(const char* glove_path, const char* words,
                             long n_words, long dim, float* out_vectors,
                             unsigned char* found) {
  std::unordered_map<std::string, long> index;
  index.reserve(static_cast<size_t>(n_words) * 2);
  {
    const char* p = words;
    for (long i = 0; i < n_words; ++i) {
      const char* nl = strchr(p, '\n');
      size_t len = nl ? static_cast<size_t>(nl - p) : strlen(p);
      index.emplace(std::string(p, len), i);
      if (!nl) break;
      p = nl + 1;
    }
  }

  FILE* f = fopen(glove_path, "rb");
  if (!f) return -1;

  long n_found = 0;
  std::string line;
  line.reserve(1 << 13);
  std::vector<char*> tokens;
  char buf[1 << 16];
  bool pending = false;

  auto process_line = [&](char* s, size_t len) {
    // lstrip/rstrip of whitespace (python str.strip default set is larger,
    // but glove lines only carry spaces/\r)
    size_t b = 0, e = len;
    while (b < e && (s[b] == ' ' || s[b] == '\t' || s[b] == '\r')) ++b;
    while (e > b && (s[e - 1] == ' ' || s[e - 1] == '\t' || s[e - 1] == '\r'))
      --e;
    s[e] = '\0';
    s += b;
    // split on single spaces (python .split(' '): empty tokens possible on
    // double spaces, making len != dim+1 -> skipped; same here)
    tokens.clear();
    char* tok = s;
    for (char* q = s;; ++q) {
      if (*q == ' ' || *q == '\0') {
        bool end = (*q == '\0');
        *q = '\0';
        tokens.push_back(tok);
        tok = q + 1;
        if (end) break;
      }
    }
    if (tokens.size() == 2 || tokens.size() != static_cast<size_t>(dim) + 1)
      return;
    auto it = index.find(tokens[0]);
    if (it == index.end()) return;
    long row = it->second;
    if (!found[row]) ++n_found;
    found[row] = 1;
    float* out = out_vectors + row * dim;
    for (long d = 0; d < dim; ++d) {
      // strtod then narrow: identical to python float() -> float32
      out[d] = static_cast<float>(strtod(tokens[1 + d], nullptr));
    }
  };

  while (fgets(buf, sizeof(buf), f)) {
    size_t len = strlen(buf);
    bool complete = len > 0 && buf[len - 1] == '\n';
    if (complete) buf[--len] = '\0';
    if (pending || !complete) {
      line.append(buf, len);
      pending = !complete;
      if (complete) {
        std::vector<char> tmp(line.begin(), line.end());
        tmp.push_back('\0');
        process_line(tmp.data(), line.size());
        line.clear();
      }
    } else {
      process_line(buf, len);
    }
  }
  if (pending && !line.empty()) {
    std::vector<char> tmp(line.begin(), line.end());
    tmp.push_back('\0');
    process_line(tmp.data(), line.size());
  }
  fclose(f);
  return n_found;
}
