// CTC beam-search decoder with ARPA n-gram LM rescoring (host-side, C++17).
//
// TPU-native replacement for the reference's pyctcdecode + kenlm stack
// (ref: src/train/evaluator.py:148-154,189-210 via HF
// Wav2Vec2ProcessorWithLM.batch_decode). The device produces log-probs; this
// library consumes them on the host, overlapped with TPU eval.
//
// Semantics follow pyctcdecode's prefix beam search:
//  - beams keyed by (text, partial_word, last_char_idx); duplicates merged
//    by logsumexp of the acoustic score
//  - blank (id 0) and repeated-char frames extend a beam without emitting
//  - the word delimiter token completes a word and applies the LM:
//      score += alpha * ln(10) * log10 P(w | context) + beta
//  - token_min_logp: frames' tokens below this log-prob are skipped (the
//    frame argmax is always kept); beam_prune_logp: beams worse than
//    best + prune are dropped; top beam_width beams survive per frame
//  - score_boundary: LM context starts at <s> and the final word is scored
//    with </s> following, like kenlm sentence scoring
//  - n-gram backoff scoring of an ARPA text model (arbitrary order)
//
// Divergence vs pyctcdecode (documented): partial (in-progress) words carry
// no LM score until completed; pyctcdecode scores partial tokens via a
// unigram trie. At end of sequence the trailing partial word is completed
// and scored.
//
// C ABI for ctypes; thread-parallel over the batch.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <iostream>
#include <memory>
#include <sstream>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kNegInf = -1e30f;
constexpr double kLn10 = 2.302585092994046;

// ---------------------------------------------------------------- ARPA LM --

struct NGramLM {
  // key: space-joined word ids; value: (log10 prob, log10 backoff)
  struct Entry {
    float logp;
    float backoff;
  };
  int order = 0;
  std::unordered_map<std::string, int> word_ids;
  std::vector<std::unordered_map<std::string, Entry>> tables;  // [n-1]
  int unk_id = -1, bos_id = -1, eos_id = -1;

  int word_id(const std::string& w) const {
    auto it = word_ids.find(w);
    if (it != word_ids.end()) return it->second;
    return unk_id;
  }

  static std::string key(const std::vector<int>& ids, size_t start, size_t end) {
    std::string k;
    for (size_t i = start; i < end; ++i) {
      if (!k.empty()) k.push_back(' ');
      k += std::to_string(ids[i]);
    }
    return k;
  }

  // log10 P(w | context) with standard Katz backoff.
  float score_word(const std::vector<int>& context, int w) const {
    std::vector<int> ids(context);
    ids.push_back(w);
    size_t total = ids.size();
    size_t maxn = std::min<size_t>(total, order);
    size_t start = total - maxn;
    // try longest n-gram first, accumulate backoff on misses
    float backoff_sum = 0.f;
    for (size_t s = start; s < total; ++s) {
      size_t n = total - s;
      const auto& table = tables[n - 1];
      auto it = table.find(key(ids, s, total));
      if (it != table.end()) return it->second.logp + backoff_sum;
      // miss at this order: add backoff weight of the (shorter) context
      // (context of order n-1 = ids[s..total-1))
      if (n >= 2) {
        const auto& ctx_table = tables[n - 2];
        auto bit = ctx_table.find(key(ids, s, total - 1));
        if (bit != ctx_table.end()) backoff_sum += bit->second.backoff;
      }
    }
    return -7.f + backoff_sum;  // OOV floor (log10), pyctcdecode-style harsh
  }

  bool load_arpa(const std::string& path, std::string* err) {
    std::ifstream f(path);
    if (!f) {
      *err = "cannot open " + path;
      return false;
    }
    std::string line;
    // header
    std::vector<long> counts;
    while (std::getline(f, line)) {
      if (line.rfind("\\data\\", 0) == 0) break;
    }
    while (std::getline(f, line)) {
      if (line.empty()) continue;
      if (line[0] == '\\') break;  // first "\1-grams:" section marker
      if (line.rfind("ngram", 0) == 0) {
        auto eq = line.find('=');
        if (eq != std::string::npos)
          counts.push_back(std::stol(line.substr(eq + 1)));
      }
    }
    if (counts.empty()) {
      *err = "no ngram counts in ARPA header";
      return false;
    }
    order = static_cast<int>(counts.size());
    tables.resize(order);
    int next_word_id = 0;
    auto intern = [&](const std::string& w) {
      auto it = word_ids.find(w);
      if (it != word_ids.end()) return it->second;
      word_ids.emplace(w, next_word_id);
      return next_word_id++;
    };
    // `line` currently holds "\1-grams:" (or similar)
    int current_n = 0;
    do {
      if (line.empty()) continue;
      if (line[0] == '\\') {
        if (line.rfind("\\end\\", 0) == 0) break;
        // parse "\N-grams:"
        auto dash = line.find('-');
        if (dash != std::string::npos && dash > 1) {
          current_n = std::stoi(line.substr(1, dash - 1));
        }
        continue;
      }
      if (current_n < 1) continue;
      // entry: logp \t w1 w2 ... wn [\t backoff]
      std::istringstream ss(line);
      float logp;
      if (!(ss >> logp)) continue;
      std::vector<int> ids;
      ids.reserve(current_n);
      std::string w;
      for (int i = 0; i < current_n; ++i) {
        if (!(ss >> w)) break;
        ids.push_back(intern(w));
      }
      if (static_cast<int>(ids.size()) != current_n) continue;
      float backoff = 0.f;
      ss >> backoff;  // optional
      tables[current_n - 1][key(ids, 0, ids.size())] = {logp, backoff};
    } while (std::getline(f, line));

    auto find_id = [&](const char* w) {
      auto it = word_ids.find(w);
      return it == word_ids.end() ? -1 : it->second;
    };
    unk_id = find_id("<unk>");
    if (unk_id < 0) unk_id = find_id("<UNK>");
    bos_id = find_id("<s>");
    eos_id = find_id("</s>");
    return true;
  }
};

// ----------------------------------------------------------- beam search --

// Prefix arena: beams reference interned character chains instead of owning
// strings, so a beam is a small POD and the per-frame expansion loop does no
// heap traffic. Node 0 is the empty prefix.
struct PrefixArena {
  struct Node {
    int32_t parent;
    char ch;
  };
  std::vector<Node> nodes{{-1, '\0'}};

  int32_t extend(int32_t node, char ch) {
    nodes.push_back({node, ch});
    return static_cast<int32_t>(nodes.size() - 1);
  }

  std::string materialize(int32_t node) const {
    std::string out;
    while (node > 0) {
      out.push_back(nodes[node].ch);
      node = nodes[node].parent;
    }
    std::reverse(out.begin(), out.end());
    return out;
  }
};

constexpr int kMaxCtx = 8;  // supports up to 9-gram LMs

struct Beam {
  int32_t text = 0;        // arena id: completed words (space-joined)
  int32_t partial = 0;     // arena id: in-progress word
  int last_char = -1;      // last emitted vocab idx (-1 after blank)
  float p_ac = 0.f;        // acoustic log-prob (ln)
  double p_lm = 0.0;       // LM score (ln, already alpha/beta weighted)
  int32_t context[kMaxCtx];  // LM word-id context of completed words
  uint8_t ctx_len = 0;
  double score() const { return p_ac + p_lm; }
};

struct Decoder {
  std::vector<std::string> vocab;  // index -> token string
  int blank_id = 0;
  int delim_id = -1;               // word delimiter ("|" -> space)
  std::vector<bool> special;      // tokens like <s> </s> <unk>: never emitted
  std::unique_ptr<NGramLM> lm;
  double alpha = 0.5, beta = 0.5;
  bool score_boundary = false;
};

inline float logsumexp2(float a, float b) {
  if (a < b) std::swap(a, b);
  if (b <= kNegInf) return a;
  return a + std::log1p(std::exp(b - a));
}

void complete_word(const Decoder& d, PrefixArena& arena, Beam& b,
                   bool is_last) {
  if (b.partial == 0) return;
  if (d.lm) {
    std::vector<int> ctx(b.context, b.context + b.ctx_len);
    int wid = d.lm->word_id(arena.materialize(b.partial));
    float lg = d.lm->score_word(ctx, wid);
    b.p_lm += d.alpha * kLn10 * lg + d.beta;
    // keep context bounded to order-1 words
    int maxc = std::min(std::max(d.lm->order - 1, 1), kMaxCtx);
    if (b.ctx_len < maxc) {
      b.context[b.ctx_len++] = wid;
    } else {
      for (int i = 1; i < maxc; ++i) b.context[i - 1] = b.context[i];
      b.context[maxc - 1] = wid;
      b.ctx_len = static_cast<uint8_t>(maxc);
    }
    if (is_last && d.score_boundary && d.lm->eos_id >= 0) {
      std::vector<int> ctx2(b.context, b.context + b.ctx_len);
      b.p_lm += d.alpha * kLn10 * d.lm->score_word(ctx2, d.lm->eos_id);
    }
  }
  // splice partial chain onto text (with separating space if needed)
  std::string word = arena.materialize(b.partial);
  if (b.text != 0) b.text = arena.extend(b.text, ' ');
  for (char c : word) b.text = arena.extend(b.text, c);
  b.partial = 0;
}

std::string decode_one(const Decoder& d, const float* logp, int T, int V,
                       int beam_width, float prune_logp, float token_min_logp) {
  PrefixArena arena;
  // per-char extension cache: (partial_node, char idx) -> new node, so the
  // arena stays compact when many beams extend the same prefix
  std::unordered_map<uint64_t, int32_t> extend_cache;
  auto extend_cached = [&](int32_t node, int v) {
    uint64_t key = (static_cast<uint64_t>(node) << 16) | static_cast<uint32_t>(v);
    auto it = extend_cache.find(key);
    if (it != extend_cache.end()) return it->second;
    int32_t nn = node;
    for (char c : d.vocab[v]) nn = arena.extend(nn, c);
    extend_cache.emplace(key, nn);
    return nn;
  };

  std::vector<Beam> beams(1);
  if (d.lm && d.score_boundary && d.lm->bos_id >= 0) {
    beams[0].context[0] = d.lm->bos_id;
    beams[0].ctx_len = 1;
  }

  std::vector<Beam> next;
  std::unordered_map<uint64_t, size_t> merged;
  for (int t = 0; t < T; ++t) {
    const float* row = logp + static_cast<size_t>(t) * V;
    int max_idx = 0;
    for (int v = 1; v < V; ++v)
      if (row[v] > row[max_idx]) max_idx = v;

    next.clear();
    next.reserve(beams.size() * 8);
    for (int v = 0; v < V; ++v) {
      float p = row[v];
      if (v != max_idx && p < token_min_logp) continue;
      for (const Beam& b : beams) {
        Beam nb = b;  // POD copy
        nb.p_ac += p;
        if (v == d.blank_id) {
          nb.last_char = -1;
        } else if (v == b.last_char) {
          // repeat frame: same emission, no new char
        } else if (d.special[v]) {
          // special tokens (<s>, </s>, <unk>) consumed, emit nothing
          nb.last_char = v;
        } else if (v == d.delim_id) {
          complete_word(d, arena, nb, /*is_last=*/false);
          nb.last_char = v;
        } else {
          nb.partial = extend_cached(b.partial, v);
          nb.last_char = v;
        }
        next.push_back(nb);
      }
    }
    // merge beams with identical (text, partial, last_char)
    merged.clear();
    std::vector<Beam> uniq;
    uniq.reserve(next.size());
    for (Beam& b : next) {
      // exact key: arena node ids are < 2^31 in practice but pack defensively
      uint64_t k = (static_cast<uint64_t>(static_cast<uint32_t>(b.text)) << 32) |
                   (static_cast<uint64_t>(static_cast<uint32_t>(b.partial) & 0xFFFFFF) << 8) |
                   static_cast<uint64_t>(static_cast<uint8_t>(b.last_char + 1));
      auto it = merged.find(k);
      if (it == merged.end()) {
        merged.emplace(k, uniq.size());
        uniq.push_back(b);
      } else {
        uniq[it->second].p_ac = logsumexp2(uniq[it->second].p_ac, b.p_ac);
      }
    }
    std::sort(uniq.begin(), uniq.end(),
              [](const Beam& a, const Beam& b) { return a.score() > b.score(); });
    if (static_cast<int>(uniq.size()) > beam_width) uniq.resize(beam_width);
    if (!uniq.empty()) {
      double best = uniq[0].score();
      while (!uniq.empty() && uniq.back().score() < best + prune_logp)
        uniq.pop_back();
    }
    beams.swap(uniq);
    if (beams.empty()) break;
  }
  if (beams.empty()) return "";
  // finalize: score trailing partial words, re-rank
  for (Beam& b : beams) complete_word(d, arena, b, /*is_last=*/true);
  auto bestit =
      std::max_element(beams.begin(), beams.end(), [](const Beam& a, const Beam& b) {
        return a.score() < b.score();
      });
  return arena.materialize(bestit->text);
}

}  // namespace

extern "C" {

void* ctc_decoder_create(const char** vocab, int vocab_size, int blank_id,
                         const char* word_delim_token, const char* arpa_path,
                         double alpha, double beta, int score_boundary,
                         char* err_out, int err_cap) {
  auto d = std::make_unique<Decoder>();
  d->vocab.assign(vocab, vocab + vocab_size);
  d->blank_id = blank_id;
  d->special.assign(vocab_size, false);
  for (int i = 0; i < vocab_size; ++i) {
    const std::string& tok = d->vocab[i];
    if (tok == word_delim_token) d->delim_id = i;
    if (tok.size() >= 2 && tok.front() == '<' && tok.back() == '>' &&
        i != blank_id)
      d->special[i] = true;
  }
  d->alpha = alpha;
  d->beta = beta;
  d->score_boundary = score_boundary != 0;
  if (arpa_path != nullptr && arpa_path[0] != '\0') {
    d->lm = std::make_unique<NGramLM>();
    std::string err;
    if (!d->lm->load_arpa(arpa_path, &err)) {
      std::snprintf(err_out, err_cap, "%s", err.c_str());
      return nullptr;
    }
  }
  return d.release();
}

void ctc_decoder_destroy(void* handle) {
  delete static_cast<Decoder*>(handle);
}

int ctc_decoder_lm_order(void* handle) {
  auto* d = static_cast<Decoder*>(handle);
  return d->lm ? d->lm->order : 0;
}

// logp: (B, T, V) float32 natural-log probabilities; lens: (B,) valid frames.
// out: caller-allocated char* array of size B; each entry malloc'd here,
// caller frees via ctc_decoder_free_strings.
void ctc_decoder_decode_batch(void* handle, const float* logp, int B, int T,
                              int V, const int* lens, int beam_width,
                              float prune_logp, float token_min_logp,
                              char** out, int n_threads) {
  auto* d = static_cast<Decoder*>(handle);
  if (n_threads <= 0)
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
  n_threads = std::max(1, std::min(n_threads, B));
  auto work = [&](int start, int stride) {
    for (int b = start; b < B; b += stride) {
      int tlen = lens ? std::min(lens[b], T) : T;
      std::string s =
          decode_one(*d, logp + static_cast<size_t>(b) * T * V, tlen, V,
                     beam_width, prune_logp, token_min_logp);
      out[b] = static_cast<char*>(std::malloc(s.size() + 1));
      std::memcpy(out[b], s.c_str(), s.size() + 1);
    }
  };
  if (n_threads == 1) {
    work(0, 1);
  } else {
    std::vector<std::thread> threads;
    for (int i = 0; i < n_threads; ++i) threads.emplace_back(work, i, n_threads);
    for (auto& th : threads) th.join();
  }
}

void ctc_decoder_free_strings(char** strs, int n) {
  for (int i = 0; i < n; ++i) std::free(strs[i]);
}

}  // extern "C"
