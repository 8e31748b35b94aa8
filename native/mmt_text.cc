// Native WordPiece tokenization: the host input pipeline's hottest text
// op (reference counterpart: tensorflow_text.BertTokenizer's C++ kernels
// behind src/data/data_utils.py:88-104).
//
// Scope: the ASCII fast path, byte-exact with mmt_tpu/text/wordpiece.py
// (BasicTokenizer cleanup/lowercase/punct-split + greedy
// longest-match-first WordPiece + preserve_unused_token semantics).  Any
// input containing a non-ASCII byte returns MMT_WP_NON_ASCII and the
// Python tokenizer handles it -- full Unicode (NFD accent stripping,
// category tables, CJK spacing) stays in Python where unicodedata is
// authoritative.  Real workloads (WIT/Flickr30k/Fashion-Gen captions)
// are overwhelmingly ASCII, so the fast path covers the hot loop.
//
// ABI (extern "C", used via ctypes from mmt_tpu/text/native.py):
//   mmt_wp_create(vocab_blob, len, lower_case) -> handle
//     vocab_blob: '\n'-joined tokens, index = vocab id.
//   mmt_wp_tokenize(handle, text, len, out_ids, out_word_end, cap)
//     -> n_pieces >= 0, with out_word_end[i] = one-past piece index of
//        word i's last piece (word-aligned ragged structure, n_words =
//        number of distinct values); negative = error code.
//   mmt_wp_free(handle)

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

constexpr int64_t MMT_WP_NON_ASCII = -1;
constexpr int64_t MMT_WP_OVERFLOW = -2;

struct WpVocab {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_set<std::string> preserve;  // bracketed tokens, unsplittable
  bool lower_case = true;
  int max_chars_per_word = 200;
  int32_t unk_id = -1;
};

inline bool ascii_ws(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r';
}

inline bool ascii_control(unsigned char c) {
  // Python _is_control: category C minus \t\n\r; for ASCII that is
  // 0x00-0x1F (minus \t\n\r) and 0x7F.
  if (c == '\t' || c == '\n' || c == '\r') return false;
  return c < 0x20 || c == 0x7F;
}

inline bool ascii_punct(unsigned char c) {
  // Python _is_punctuation's explicit ranges cover every ASCII
  // punctuation/symbol char (33-47, 58-64, 91-96, 123-126).
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

// Greedy longest-match-first wordpiece split of `word` (already
// lowercased, no punctuation).  Appends ids; false => [UNK].
bool wordpiece(const WpVocab& wp, const std::string& word,
               std::vector<int32_t>* ids) {
  if ((int)word.size() > wp.max_chars_per_word) return false;
  size_t n0 = ids->size();
  size_t start = 0;
  std::string sub;
  while (start < word.size()) {
    size_t end = word.size();
    int32_t piece = -1;
    while (start < end) {
      sub.assign(start > 0 ? "##" : "");
      sub.append(word, start, end - start);
      auto it = wp.vocab.find(sub);
      if (it != wp.vocab.end()) {
        piece = it->second;
        break;
      }
      --end;
    }
    if (piece < 0) {
      ids->resize(n0);
      return false;
    }
    ids->push_back(piece);
    start = end;
  }
  return true;
}

}  // namespace

extern "C" {

WpVocab* mmt_wp_create(const char* vocab_blob, int64_t len, int lower_case) {
  auto* wp = new WpVocab();
  wp->lower_case = lower_case != 0;
  int32_t idx = 0;
  const char* p = vocab_blob;
  const char* end = vocab_blob + len;
  while (p < end) {
    const char* nl = (const char*)memchr(p, '\n', end - p);
    size_t n = nl ? (size_t)(nl - p) : (size_t)(end - p);
    if (n > 0) {
      std::string tok(p, n);
      wp->vocab[tok] = idx;  // last occurrence wins (== Python load_vocab)
      if (tok.size() >= 2 && tok.front() == '[' && tok.back() == ']') {
        wp->preserve.insert(tok);
        if (tok == "[UNK]") wp->unk_id = idx;
      }
    }
    ++idx;
    p = nl ? nl + 1 : end;
  }
  return wp;
}

void mmt_wp_free(WpVocab* wp) { delete wp; }

// Tokenizes `text` (must be pure ASCII) into word-aligned wordpiece ids.
// out_ids[cap], out_word_end[cap]: parallel to words -- out_word_end[w]
// is the exclusive piece-end index of word w; n_words is returned via
// *n_words_out.  Returns total piece count, or MMT_WP_NON_ASCII /
// MMT_WP_OVERFLOW.
int64_t mmt_wp_tokenize(WpVocab* wp, const char* text, int64_t len,
                        int32_t* out_ids, int32_t* out_word_end,
                        int64_t cap, int64_t* n_words_out) {
  // Pass 0: ASCII gate + cleanup into a local buffer (drop control,
  // whitespace -> ' ').
  std::string clean;
  clean.reserve(len);
  for (int64_t i = 0; i < len; ++i) {
    unsigned char c = (unsigned char)text[i];
    if (c >= 0x80) return MMT_WP_NON_ASCII;
    if (c == 0 || ascii_control(c)) continue;
    clean.push_back(ascii_ws(c) ? ' ' : (char)c);
  }

  std::vector<int32_t> ids;
  std::vector<int32_t> word_end;
  std::string word;
  size_t i = 0;
  while (i < clean.size()) {
    while (i < clean.size() && clean[i] == ' ') ++i;
    if (i >= clean.size()) break;
    size_t j = i;
    while (j < clean.size() && clean[j] != ' ') ++j;
    std::string tok = clean.substr(i, j - i);
    i = j;

    // preserve_unused_token: bracketed vocab tokens pass through whole,
    // checked before lowercasing (mirrors BasicTokenizer.tokenize).
    if (wp->preserve.count(tok)) {
      auto it = wp->vocab.find(tok);
      ids.push_back(it->second);
      word_end.push_back((int32_t)ids.size());
      continue;
    }
    if (wp->lower_case) {
      for (auto& ch : tok)
        if (ch >= 'A' && ch <= 'Z') ch += 32;
      // NFD accent stripping is identity on ASCII.
    }
    // Re-check preserve AFTER lowercasing (mirrors the Python
    // BasicTokenizer._split_punct re-check): text "[UNUSED0]" with
    // vocab token "[unused0]" stays whole instead of punct-splitting.
    if (wp->preserve.count(tok)) {
      auto it = wp->vocab.find(tok);
      ids.push_back(it->second);
      word_end.push_back((int32_t)ids.size());
      continue;
    }
    // Punctuation split: each punct char its own word, runs of
    // non-punct chars form words (BasicTokenizer._split_punct).
    word.clear();
    auto flush_word = [&]() {
      if (word.empty()) return;
      if (!wordpiece(*wp, word, &ids)) ids.push_back(wp->unk_id);
      word_end.push_back((int32_t)ids.size());
      word.clear();
    };
    for (char ch : tok) {
      if (ascii_punct((unsigned char)ch)) {
        flush_word();
        std::string p1(1, ch);
        if (!wordpiece(*wp, p1, &ids)) ids.push_back(wp->unk_id);
        word_end.push_back((int32_t)ids.size());
      } else {
        word.push_back(ch);
      }
    }
    flush_word();
  }

  if ((int64_t)ids.size() > cap || (int64_t)word_end.size() > cap)
    return MMT_WP_OVERFLOW;
  memcpy(out_ids, ids.data(), ids.size() * sizeof(int32_t));
  memcpy(out_word_end, word_end.data(), word_end.size() * sizeof(int32_t));
  *n_words_out = (int64_t)word_end.size();
  return (int64_t)ids.size();
}

}  // extern "C"
