// fastpack — native host-side batch encoding for the TPU input pipeline.
//
// The framework's two host-side tokenization hot loops — fastText-style
// word/bigram id packing and char-level BERT packing — run per example per
// step and must outpace the accelerator. These are the loops the reference
// delegates to native wheels (fastText C++ tokenizer, HF fast tokenizers);
// here they are a self-contained C++ library exposed through ctypes
// (multimodalsimilar_tpu/native.py), with pure-Python fallbacks.
//
// Functions are exported with a plain C ABI; all batch outputs are written
// into caller-allocated row-major buffers.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// FNV-1a 32-bit over the word's UTF-8 bytes. fastText XORs each byte
// SIGN-EXTENDED (dictionary.cc: uint32_t(int8_t(c))) — bytes >= 0x80
// (every byte of a CJK char) carry the 0xFFFFFF00 high bits.
uint32_t fnv1a(const char* s, size_t len) {
    uint32_t h = 2166136261u;
    for (size_t i = 0; i < len; ++i) {
        h ^= static_cast<uint32_t>(static_cast<int8_t>(s[i]));
        h *= 16777619u;
    }
    return h;
}

struct FtVocab {
    std::unordered_map<std::string, int32_t> words;
    int64_t bucket;
    int64_t nwords;
};

struct CharVocab {
    // UTF-8 codepoint (as string) -> id
    std::unordered_map<std::string, int32_t> chars;
    int32_t pad, unk, cls, sep;
};

// Iterate UTF-8 codepoints of `s`, calling fn(ptr, len) for each.
// The declared lead-byte length is clamped to the remaining bytes: a
// string ending in a truncated multibyte sequence (the exported C ABI
// guarantees nothing about valid UTF-8) must not read past the
// terminator or jump the cursor over it into foreign memory.
template <typename F>
void for_each_utf8(const char* s, F fn) {
    const unsigned char* p = reinterpret_cast<const unsigned char*>(s);
    const unsigned char* end = p + std::strlen(s);
    while (p < end) {
        size_t len = 1;
        if ((*p & 0x80) == 0x00) len = 1;
        else if ((*p & 0xE0) == 0xC0) len = 2;
        else if ((*p & 0xF0) == 0xE0) len = 3;
        else if ((*p & 0xF8) == 0xF0) len = 4;
        if (len > static_cast<size_t>(end - p)) len = end - p;
        fn(reinterpret_cast<const char*>(p), len);
        p += len;
    }
}

bool is_space(const char* p, size_t len) {
    if (len != 1) return false;
    char c = *p;
    return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
           c == '\v';
}

}  // namespace

extern "C" {

// ---------------- fastText-style packing ----------------

void* ft_vocab_create(const char** words, const int32_t* ids, int32_t n,
                      int64_t bucket, int64_t nwords) {
    auto* v = new FtVocab();
    v->words.reserve(n * 2);
    // last duplicate wins, like the Python dict the fallback builds
    for (int32_t i = 0; i < n; ++i) v->words[words[i]] = ids[i];
    v->bucket = bucket;
    v->nwords = nwords;
    return v;
}

void ft_vocab_free(void* vp) { delete static_cast<FtVocab*>(vp); }

// Encode n_lines whitespace-tokenized lines into [n_lines, max_tokens]
// int32 ids + float32 mask. Tokens = known words (+EOS appended) then
// hashed bigram bucket ids ((h1*116049371 + h2) % bucket + nwords).
void ft_encode_batch(void* vp, const char** lines, int32_t n_lines,
                     int32_t max_tokens, int32_t word_ngrams,
                     int32_t* out_ids, float* out_mask) {
    auto* v = static_cast<FtVocab*>(vp);
    std::vector<std::string> toks;
    std::vector<uint32_t> hashes;
    for (int32_t b = 0; b < n_lines; ++b) {
        toks.clear();
        hashes.clear();
        // whitespace split
        const char* s = lines[b];
        std::string cur;
        for_each_utf8(s, [&](const char* p, size_t len) {
            if (is_space(p, len)) {
                if (!cur.empty()) { toks.push_back(cur); cur.clear(); }
            } else {
                cur.append(p, len);
            }
        });
        if (!cur.empty()) toks.push_back(cur);
        toks.push_back("</s>");

        int32_t* row_ids = out_ids + (int64_t)b * max_tokens;
        float* row_mask = out_mask + (int64_t)b * max_tokens;
        std::memset(row_ids, 0, sizeof(int32_t) * max_tokens);
        std::memset(row_mask, 0, sizeof(float) * max_tokens);
        int32_t pos = 0;
        for (const auto& t : toks) {
            auto it = v->words.find(t);
            if (it != v->words.end() && pos < max_tokens) {
                row_ids[pos] = it->second;
                row_mask[pos] = 1.0f;
                ++pos;
            }
        }
        if (word_ngrams >= 2) {
            hashes.reserve(toks.size());
            for (const auto& t : toks)
                hashes.push_back(fnv1a(t.data(), t.size()));
            for (size_t i = 0; i + 1 < toks.size() && pos < max_tokens;
                 ++i) {
                // fastText stores hashes as int32 and sign-extends them to
                // uint64 in addWordNgrams (dictionary.cc)
                uint64_t h1 = (uint64_t)(int64_t)(int32_t)hashes[i];
                uint64_t h2 = (uint64_t)(int64_t)(int32_t)hashes[i + 1];
                uint64_t h = h1 * 116049371ull + h2;
                row_ids[pos] = (int32_t)(v->nwords + (int64_t)(h % v->bucket));
                row_mask[pos] = 1.0f;
                ++pos;
            }
        }
    }
}

// ---------------- char-level BERT packing ----------------

void* char_vocab_create(const char** tokens, int32_t n, int32_t pad,
                        int32_t unk, int32_t cls, int32_t sep) {
    auto* v = new CharVocab();
    v->chars.reserve(n * 2);
    // last duplicate wins — tokenizer.py from_vocab builds {t: i for ...},
    // where a duplicated vocab line keeps the LAST index; emplace kept the
    // first, so the two paths tokenized a duplicated token differently
    for (int32_t i = 0; i < n; ++i) v->chars[tokens[i]] = i;
    v->pad = pad; v->unk = unk; v->cls = cls; v->sep = sep;
    return v;
}

void char_vocab_free(void* vp) { delete static_cast<CharVocab*>(vp); }

// [CLS] c1 c2 ... [SEP] with max_length truncation; whitespace skipped.
void char_encode_batch(void* vp, const char** lines, int32_t n_lines,
                       int32_t max_length, int32_t* out_ids,
                       int32_t* out_mask, int32_t* out_types) {
    auto* v = static_cast<CharVocab*>(vp);
    std::string ch;
    for (int32_t b = 0; b < n_lines; ++b) {
        int32_t* ids = out_ids + (int64_t)b * max_length;
        int32_t* mask = out_mask + (int64_t)b * max_length;
        int32_t* types = out_types + (int64_t)b * max_length;
        for (int32_t i = 0; i < max_length; ++i) {
            ids[i] = v->pad; mask[i] = 0; types[i] = 0;
        }
        int32_t pos = 0;
        ids[pos] = v->cls; mask[pos] = 1; ++pos;
        for_each_utf8(lines[b], [&](const char* p, size_t len) {
            if (pos >= max_length - 1 || is_space(p, len)) return;
            ch.assign(p, len);
            auto it = v->chars.find(ch);
            ids[pos] = (it != v->chars.end()) ? it->second : v->unk;
            mask[pos] = 1;
            ++pos;
        });
        // pos <= max_length-1 always (chars stop at max_length-1), so
        // SEP always fits
        ids[pos] = v->sep; mask[pos] = 1;
    }
}

}  // extern "C"
