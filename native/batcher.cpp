// Native host-side batch assembly + masking for the packed-sequence loader.
//
// The reference's input pipeline bottoms out in TF's C++ tf.data runtime
// (reference src/dataloader.py:220-246 — parallel_interleave/map_and_batch
// are C++ ops; only the random mask choice crosses into Python via
// tf.py_func). This library is the TPU build's native equivalent: the
// per-batch hot path (row gather + per-row distinct mask sampling + label
// gather) runs in C++ off the GIL, exposed over a plain C ABI consumed via
// ctypes (easydgl_tpu/data/native.py). NumPy remains the fallback.
//
// RNG: splitmix64-seeded xoshiro256**, one independent stream per row,
// seeded from (seed, epoch, batch, row) so results are deterministic and
// host-shardable.

#include <cstdint>
#include <cstring>

namespace {

struct Xoshiro256 {
  uint64_t s[4];

  static uint64_t splitmix64(uint64_t &x) {
    uint64_t z = (x += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }

  explicit Xoshiro256(uint64_t seed) {
    uint64_t x = seed;
    for (auto &si : s) si = splitmix64(x);
  }

  static uint64_t rotl(uint64_t v, int k) {
    return (v << k) | (v >> (64 - k));
  }

  uint64_t next() {
    const uint64_t result = rotl(s[1] * 5, 7) * 9;
    const uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }

  // unbiased bounded integer (Lemire)
  uint32_t bounded(uint32_t n) {
    uint64_t m = (uint64_t)(uint32_t)next() * n;
    uint32_t l = (uint32_t)m;
    if (l < n) {
      uint32_t t = (uint32_t)(-(int32_t)n) % n;
      while (l < t) {
        m = (uint64_t)(uint32_t)next() * n;
        l = (uint32_t)m;
      }
    }
    return (uint32_t)(m >> 32);
  }
};

inline uint64_t row_seed(uint64_t seed, uint64_t epoch, uint64_t batch,
                         uint64_t row) {
  uint64_t x = seed * 0x9e3779b97f4a7c15ULL + epoch;
  x = Xoshiro256::splitmix64(x) + batch;
  x = Xoshiro256::splitmix64(x) + row;
  return Xoshiro256::splitmix64(x);
}

}  // namespace

extern "C" {

// Gather rows: out[r, :] = src[indices[r], :] for int32 data.
void gather_rows_i32(const int32_t *src, const int64_t *indices,
                     int64_t n_rows, int64_t row_len, int32_t *out) {
  for (int64_t r = 0; r < n_rows; ++r) {
    std::memcpy(out + r * row_len, src + indices[r] * row_len,
                row_len * sizeof(int32_t));
  }
}

void gather_rows_f32(const float *src, const int64_t *indices,
                     int64_t n_rows, int64_t row_len, float *out) {
  for (int64_t r = 0; r < n_rows; ++r) {
    std::memcpy(out + r * row_len, src + indices[r] * row_len,
                row_len * sizeof(float));
  }
}

// Masked-protocol batch (reference dataloader.py:39-85 / 159-207 semantics):
// per row, sample `masklen` DISTINCT positions in [ignore_head, seqslen),
// write masked tokens (mask_id substituted), positions, and gathered labels.
//
// tokens: (n_rows, seqslen) int32 (already gathered batch rows)
// out_masked: (n_rows, seqslen); out_positions/out_labels: (n_rows, masklen)
void masked_batch(const int32_t *tokens, int64_t n_rows, int64_t seqslen,
                  int64_t masklen, int32_t mask_id, int64_t ignore_head,
                  uint64_t seed, uint64_t epoch, uint64_t batch_idx,
                  int32_t *out_masked, int32_t *out_positions,
                  int32_t *out_labels) {
  const int64_t range = seqslen - ignore_head;
  for (int64_t r = 0; r < n_rows; ++r) {
    const int32_t *row = tokens + r * seqslen;
    int32_t *mrow = out_masked + r * seqslen;
    std::memcpy(mrow, row, seqslen * sizeof(int32_t));

    Xoshiro256 rng(row_seed(seed, epoch, batch_idx, (uint64_t)r));
    // partial Fisher-Yates over [0, range) without materializing the
    // permutation: a tiny open-addressing map for swapped slots.
    // range <= a few hundred in practice -> simple array.
    int32_t perm[512];
    int64_t n = range < 512 ? range : 512;
    for (int64_t i = 0; i < n; ++i) perm[i] = (int32_t)i;
    for (int64_t j = 0; j < masklen; ++j) {
      int64_t pick = j + rng.bounded((uint32_t)(range - j));
      int32_t tmp = perm[j];
      perm[j] = perm[pick];
      perm[pick] = tmp;
      int32_t pos = perm[j] + (int32_t)ignore_head;
      out_positions[r * masklen + j] = pos;
      out_labels[r * masklen + j] = row[pos];
      mrow[pos] = mask_id;
    }
  }
}

// Multi-hot mark gather: out[r, t, :] = table[clamp(ids[r,t])] with ids >=
// table_rows mapped to row 0 (the MASK id, EasyDGL.py:76-77).
void mark_gather(const int8_t *table, int64_t table_rows, int64_t n_events,
                 const int32_t *ids, int64_t n, float *out) {
  for (int64_t i = 0; i < n; ++i) {
    int32_t id = ids[i];
    if (id < 0 || id >= table_rows) id = 0;
    const int8_t *src = table + (int64_t)id * n_events;
    float *dst = out + i * n_events;
    for (int64_t e = 0; e < n_events; ++e) dst[e] = (float)src[e];
  }
}

int abi_version() { return 1; }

}  // extern "C"
