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
