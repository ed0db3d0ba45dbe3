// Native construction kernels for ds2i_tpu.
//
// The reference runs its (1+eps)-approximate partition DP
// (optimal_partition.hpp:70-121) inside C++ worker threads; here the same
// algorithm is provided as a shared library called through ctypes, with the
// indexed-sequence cost function (min of Elias-Fano / ranked-bitvector /
// all-ones bit sizes + fixed per-partition cost) evaluated inline. The
// Python DP in ds2i_tpu.sequences.partitioned is the reference
// implementation; this one must produce identical partitions (asserted by
// tests/test_native.py).
//
// Build: python ds2i_tpu/native/build.py  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstddef>
#include <vector>
#include <cmath>
#include <limits>

namespace {

constexpr uint64_t INF_BITS = uint64_t(1) << 62;

inline uint64_t msb(uint64_t x) {
    return 63 - __builtin_clzll(x);
}

inline uint64_t ceil_log2(uint64_t x) {
    return x > 1 ? msb(x - 1) + 1 : 0;
}

struct EFParams {
    uint64_t log_sampling0;
    uint64_t log_sampling1;
    uint64_t rb_log_rank1_sampling;
    uint64_t rb_log_sampling1;
};

// compact_elias_fano bit size (mirrors sequences/ef.py EFOffsets)
inline uint64_t ef_bitsize(const EFParams& p, uint64_t universe, uint64_t n) {
    uint64_t lower_bits = universe > n ? msb(universe / n) : 0;
    uint64_t higher_bits_length = n + (universe >> lower_bits) + 2;
    uint64_t pointer_size = ceil_log2(higher_bits_length);
    uint64_t pointers0 = (higher_bits_length - n) >> p.log_sampling0;
    uint64_t pointers1 = n >> p.log_sampling1;
    return (pointers0 + pointers1) * pointer_size + higher_bits_length + n * lower_bits;
}

// compact_ranked_bitvector bit size (mirrors sequences/ef.py RBOffsets)
inline uint64_t rb_bitsize(const EFParams& p, uint64_t universe, uint64_t n) {
    uint64_t rank1_sample_size = ceil_log2(n + 1);
    uint64_t pointer_size = ceil_log2(universe);
    uint64_t rank1_samples = universe >> p.rb_log_rank1_sampling;
    uint64_t pointers1 = n >> p.rb_log_sampling1;
    return rank1_samples * rank1_sample_size + pointers1 * pointer_size + universe;
}

// indexed_sequence: min(all_ones, EF+1, RB+1)
inline uint64_t indexed_bitsize(const EFParams& p, uint64_t universe, uint64_t n) {
    uint64_t best = (universe == n) ? 0 : INF_BITS;
    uint64_t ef = ef_bitsize(p, universe, n) + 1;
    if (ef < best) best = ef;
    uint64_t rb = rb_bitsize(p, universe, n) + 1;
    if (rb < best) best = rb;
    return best;
}

struct CostWindow {
    size_t start = 0, end = 0;
    uint64_t min_p, max_p = 0;
    double cost_upper_bound;
};

}  // namespace

extern "C" {

// Returns the number of partition endpoints written to out (<= n), or -1 on
// overflow of out capacity. cost_kind: 0 = indexed_sequence cost (docs),
// 1 = strict_sequence cost (freq prefix sums; strict EF over u-n+1 with
// zero-sampling disabled, strict_sequence.hpp:24-30).
long ds2i_optimal_partition(
    const uint32_t* values, uint64_t n, uint64_t universe,
    double eps1, double eps2, uint64_t fix_cost, int cost_kind,
    uint64_t ef_log_sampling0, uint64_t ef_log_sampling1,
    uint64_t rb_log_rank1_sampling, uint64_t rb_log_sampling1,
    uint32_t* out, uint64_t out_capacity)
{
    EFParams p{ef_log_sampling0, ef_log_sampling1, rb_log_rank1_sampling, rb_log_sampling1};
    EFParams sp{63, ef_log_sampling1, 63, rb_log_sampling1};
    auto strict_bitsize = [&](uint64_t u, uint64_t m) -> uint64_t {
        uint64_t best = (u == m) ? 0 : INF_BITS;
        uint64_t ef = ef_bitsize(sp, u - m + 1, m) + 1;
        if (ef < best) best = ef;
        uint64_t rb = rb_bitsize(sp, u, m) + 1;
        if (rb < best) best = rb;
        return best;
    };
    auto cost = [&](uint64_t u, uint64_t m) -> double {
        uint64_t bits = cost_kind == 1 ? strict_bitsize(u, m) : indexed_bitsize(p, u, m);
        return double(bits + fix_cost);
    };

    double single_block_cost = cost(universe, n);
    std::vector<double> min_cost(n + 1, single_block_cost);
    min_cost[0] = 0;

    std::vector<CostWindow> windows;
    double cost_lb = cost(1, 1);
    // match the Python/C++ reference truncation: cost bounds are integers
    uint64_t cost_bound = (uint64_t)cost_lb;
    while (eps1 == 0 || (double)cost_bound < cost_lb / eps1) {
        CostWindow w;
        w.min_p = values[0];
        w.cost_upper_bound = (double)cost_bound;
        windows.push_back(w);
        if ((double)cost_bound >= single_block_cost) break;
        cost_bound = (uint64_t)(cost_bound * (1 + eps2));
    }

    std::vector<uint32_t> path(n + 1, 0);
    for (size_t i = 0; i < n; ++i) {
        size_t last_end = i + 1;
        for (auto& w : windows) {
            while (w.end < last_end) {
                w.max_p = values[w.end];
                ++w.end;
            }
            while (true) {
                double window_cost = cost(w.max_p - w.min_p + 1, w.end - w.start);
                if (min_cost[i] + window_cost < min_cost[w.end]) {
                    min_cost[w.end] = min_cost[i] + window_cost;
                    path[w.end] = (uint32_t)i;
                }
                last_end = w.end;
                if (w.end == n) break;
                if (window_cost >= w.cost_upper_bound) break;
                w.max_p = values[w.end];
                ++w.end;
            }
            w.min_p = (uint64_t)values[w.start] + 1;
            ++w.start;
        }
    }

    std::vector<uint32_t> partition;
    size_t cur = n;
    while (cur != 0) {
        partition.push_back((uint32_t)cur);
        cur = path[cur];
    }
    if (partition.size() > out_capacity) return -1;
    for (size_t k = 0; k < partition.size(); ++k) {
        out[k] = partition[partition.size() - 1 - k];
    }
    return (long)partition.size();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Batched compact-Elias-Fano writer.
//
// The reference encodes posting lists inside semiasync_queue worker threads
// (freq_index.hpp:54-97, compact_elias_fano.hpp:69-136). Here whole index
// construction is one call: every sequence's bit layout was precomputed on
// the host (vectorized), and this kernel writes headers, high bits, low
// bits, and both pointer arrays for all sequences, thread-parallel over
// contiguous sequence ranges. Adjacent sequences can share a 64-bit word,
// so every write is an atomic OR into the zero-initialized buffer (all
// writes touch disjoint bits, making relaxed atomics exact).

#include <thread>
#include <vector>
#include <atomic>

namespace {

inline void or_bits(uint64_t* words, int64_t pos, uint64_t value, int width) {
    if (width <= 0) return;
    if (width < 64) value &= (1ULL << width) - 1;
    int64_t w = pos >> 6;
    int s = (int)(pos & 63);
    __atomic_fetch_or(&words[w], value << s, __ATOMIC_RELAXED);
    if (s + width > 64)
        __atomic_fetch_or(&words[w + 1], value >> (64 - s), __ATOMIC_RELAXED);
}

// gamma(x): nn = x+1, l = msb(nn); LSB-first: (1<<l) in l+1 bits, then
// nn^(1<<l) in l bits (integer_codes.hpp:6-24; bitvec/codes.py)
inline int64_t write_gamma(uint64_t* words, int64_t pos, uint64_t x) {
    uint64_t nn = x + 1;
    int l = (int)msb(nn);
    or_bits(words, pos, 1ULL << l, l + 1);
    or_bits(words, pos + l + 1, nn ^ (1ULL << l), l);
    return pos + 2 * l + 1;
}

inline void ef_write_one(uint64_t* words, const uint64_t* v, int64_t n,
                         uint64_t universe, int64_t base, int log_s0, int log_s1) {
    int l = universe > (uint64_t)n ? (int)msb(universe / (uint64_t)n) : 0;
    int64_t hb_len = n + (int64_t)(universe >> l) + 2;
    int psize = (int)ceil_log2((uint64_t)hb_len);
    int64_t p0 = (hb_len - n) >> log_s0;
    int64_t p1 = n >> log_s1;
    int64_t p0_off = base;
    int64_t p1_off = p0_off + p0 * psize;
    int64_t hb_off = p1_off + p1 * psize;
    int64_t lb_off = hb_off + hb_len;
    uint64_t mask = l ? ((1ULL << l) - 1) : 0;

    for (int64_t k = 0; k < n; k++) {
        uint64_t high = (v[k] >> l) + (uint64_t)k + 1;
        int64_t pos = hb_off + (int64_t)high;
        __atomic_fetch_or(&words[pos >> 6], 1ULL << (pos & 63), __ATOMIC_RELAXED);
        if (l) or_bits(words, lb_off + k * l, v[k] & mask, l);
    }
    for (int64_t k = 1; k <= p1; k++) {
        int64_t idx = k << log_s1;
        if (idx >= n) break;  // slots past the end stay zero (reference loop bound)
        or_bits(words, p1_off + (k - 1) * psize, (v[idx] >> l) + (uint64_t)idx + 1, psize);
    }
    if (p0) {
        // walk ones in order, emitting every (k<<log_s0)-th zero position
        int64_t zeros_seen = 0, prev_one = -1, k = 1;
        int64_t next_target = (int64_t)1 << log_s0;
        int64_t total_zeros = hb_len - n;
        for (int64_t i = 0; i <= n && k <= p0; i++) {
            int64_t one = (i < n) ? (int64_t)((v[i] >> l) + (uint64_t)i + 1) : hb_len;
            int64_t gap = one - prev_one - 1;  // zeros strictly between
            while (k <= p0 && next_target < zeros_seen + gap) {
                if (next_target >= total_zeros) { k = p0 + 1; break; }
                int64_t zpos = prev_one + 1 + (next_target - zeros_seen);
                or_bits(words, p0_off + (k - 1) * psize, (uint64_t)zpos, psize);
                k++; next_target = (int64_t)k << log_s0;
            }
            zeros_seen += gap;
            prev_one = one;
        }
    }
}

}  // namespace

extern "C" {

// occs == NULL: plain EF sequences. occs != NULL: per-sequence freq_index
// docs header first — gamma_nonzero(occ), then n in ceil_log2(occ+1) bits
// when occ > 1 (freq_index.hpp:68-73) — then EF at the header's end.
void ds2i_ef_write_batch(
    uint64_t* words,
    const uint64_t* vals, const int64_t* voff,
    const int64_t* base_bits, const uint64_t* universes,
    const uint64_t* occs,
    int log_s0, int log_s1, int64_t count, int nthreads) {
    if (nthreads < 1) nthreads = 1;
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            int64_t n = voff[i + 1] - voff[i];
            int64_t pos = base_bits[i];
            if (occs) {
                pos = write_gamma(words, pos, occs[i] - 1);
                if (occs[i] > 1) {
                    int w = (int)ceil_log2(occs[i] + 1);
                    or_bits(words, pos, (uint64_t)n, w);
                    pos += w;
                }
            }
            ef_write_one(words, vals + voff[i], n, universes[i], pos, log_s0, log_s1);
        }
    };
    if (nthreads == 1 || count < 256) {
        work(0, count);
        return;
    }
    std::vector<std::thread> ts;
    int64_t chunk = (count + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; t++) {
        int64_t lo = t * chunk, hi = std::min(count, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back(work, lo, hi);
    }
    for (auto& th : ts) th.join();
}

}  // extern "C"
