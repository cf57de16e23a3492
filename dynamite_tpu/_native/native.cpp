// Host-side native kernels for dynamite_tpu.
//
// The device compute path is JAX/XLA/Pallas; these C++ routines cover the
// inherently-sequential or latency-sensitive *host* work, the same split the
// reference uses (its compute_rcm BFS and subspace index maps live in
// C/Cython: bsubspace.pyx:212-261, bsubspace_impl.h).
//
// Exposed via a plain C ABI, loaded with ctypes (no pybind11 dependency).
//
// Build: make -C dynamite_tpu/_native

#include <cstdint>
#include <cstring>
#include <complex>
#include <unordered_map>
#include <vector>

extern "C" {

static inline int parity64(uint64_t x) {
#if defined(__GNUC__) || defined(__clang__)
    return __builtin_parityll(x);
#else
    x ^= x >> 32; x ^= x >> 16; x ^= x >> 8;
    x ^= x >> 4;  x ^= x >> 2;  x ^= x >> 1;
    return (int)(x & 1);
#endif
}

static inline int popcount64(uint64_t x) {
#if defined(__GNUC__) || defined(__clang__)
    return __builtin_popcountll(x);
#else
    int c = 0; while (x) { x &= x - 1; ++c; } return c;
#endif
}

// Breadth-first search over the operator's hopping graph from a seed state:
// an edge state -> state^mask exists when the mask group's total coefficient
//   sum_t (-1)^parity(state & sign_t) * coeff_t
// is nonzero. States are emitted in queue (discovery) order. Returns the
// number of states found, or -1 if out_capacity was exceeded.
//
// masks/signs: per-term arrays of length nterms, sorted by mask;
// group_offsets: length ngroups+1 giving each mask group's term range;
// group_masks: length ngroups.
int64_t bfs_sector(
    const int64_t* group_masks,
    const int64_t* group_offsets,
    int64_t ngroups,
    const int64_t* signs,
    const double* coeffs_re,
    const double* coeffs_im,
    int64_t seed,
    int64_t* out_states,
    int64_t out_capacity)
{
    std::unordered_map<int64_t, int64_t> seen;
    seen.reserve((size_t)out_capacity * 2);

    if (out_capacity < 1) return -1;
    out_states[0] = seed;
    seen.emplace(seed, 0);
    int64_t n_found = 1;

    for (int64_t qi = 0; qi < n_found; ++qi) {
        const uint64_t state = (uint64_t)out_states[qi];
        for (int64_t g = 0; g < ngroups; ++g) {
            double tot_re = 0.0, tot_im = 0.0;
            for (int64_t t = group_offsets[g]; t < group_offsets[g + 1];
                 ++t) {
                const double sgn =
                    parity64(state & (uint64_t)signs[t]) ? -1.0 : 1.0;
                tot_re += sgn * coeffs_re[t];
                tot_im += sgn * coeffs_im[t];
            }
            if (tot_re != 0.0 || tot_im != 0.0) {
                const int64_t edge = (int64_t)(state ^ (uint64_t)group_masks[g]);
                if (seen.find(edge) == seen.end()) {
                    if (n_found >= out_capacity) return -1;
                    seen.emplace(edge, n_found);
                    out_states[n_found++] = edge;
                }
            }
        }
    }
    return n_found;
}

// Value-order combinatorial rank of a fixed-popcount bitstring (one half
// of the sector-major layout; see ops/sectors.py).
static inline int64_t rank_half(uint64_t s, const int64_t* nchoosek,
                                int64_t ld)
{
    int64_t idx = 0, kk = 0;
    while (s) {
        const int nbit = __builtin_ctzll(s);
        ++kk;
        if (kk <= nbit) idx += nchoosek[kk * ld + nbit];
        s &= s - 1;
    }
    return idx;
}

static inline uint64_t unrank_half(int64_t idx, int64_t kk, int64_t nbits,
                                   const int64_t* nchoosek, int64_t ld)
{
    uint64_t state = 0;
    for (int64_t nbit = nbits; nbit > 0; --nbit) {
        state <<= 1;
        const int64_t current =
            (kk > nbit - 1) ? 0 : nchoosek[kk * ld + (nbit - 1)];
        if (idx >= current) {
            idx -= current;
            --kk;
            state |= 1;
        }
    }
    return state;
}

// Batch sector-major rank (state -> index) for the SpinConserve subspace
// (layout: ops/sectors.py). nchoosek is a (k+1) x (L+1) row-major table;
// off_tk / na_tk are the 2*(Lr+1)-entry sector offset / row-length lookups
// indexed t*(Lr+1)+kr. Emits -1 for states with the wrong popcount.
void spinconserve_s2i(
    const int64_t* states, int64_t n,
    int64_t L, int64_t k,
    const int64_t* nchoosek,
    int64_t La,
    const int64_t* off_tk,
    const int64_t* na_tk,
    int64_t* out_idxs)
{
    const int64_t ld = L + 1;
    const int64_t Lr = L - La - 1;
    const uint64_t amask = (La >= 64) ? ~0ull : ((1ull << La) - 1);
    const uint64_t rmask = (Lr >= 64) ? ~0ull : ((1ull << Lr) - 1);
    for (int64_t i = 0; i < n; ++i) {
        const uint64_t s = (uint64_t)states[i];
        if (popcount64(s) != k) { out_idxs[i] = -1; continue; }
        const int64_t t = (int64_t)((s >> (L - 1)) & 1);
        const uint64_t hr = (s >> La) & rmask;
        const uint64_t sa = s & amask;
        const int64_t kr = popcount64(hr);
        const int64_t slot = t * (Lr + 1) + kr;
        out_idxs[i] = off_tk[slot]
            + rank_half(hr, nchoosek, ld) * na_tk[slot]
            + rank_half(sa, nchoosek, ld);
    }
}

// Batch sector-major unrank (index -> state) for SpinConserve. sec_* are
// the per-sector metadata arrays (offset, top bit, rest popcount, low
// popcount, row length) in index order.
void spinconserve_i2s(
    const int64_t* idxs, int64_t n,
    int64_t L, int64_t k,
    const int64_t* nchoosek,
    int64_t La,
    const int64_t* sec_off,
    const int64_t* sec_t,
    const int64_t* sec_kr,
    const int64_t* sec_ka,
    const int64_t* sec_na,
    int64_t n_sectors,
    int64_t* out_states)
{
    const int64_t ld = L + 1;
    const int64_t Lr = L - La - 1;
    (void)k;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t idx = idxs[i];
        // binary search: last sector with sec_off <= idx
        int64_t lo = 0, hi = n_sectors - 1;
        while (lo < hi) {
            const int64_t mid = (lo + hi + 1) >> 1;
            if (sec_off[mid] <= idx) lo = mid; else hi = mid - 1;
        }
        const int64_t rem = idx - sec_off[lo];
        const int64_t na = sec_na[lo];
        const int64_t rb = rem / na;
        const int64_t ra = rem - rb * na;
        const uint64_t hr = unrank_half(rb, sec_kr[lo], Lr, nchoosek, ld);
        const uint64_t sa = unrank_half(ra, sec_ka[lo], La, nchoosek, ld);
        out_states[i] = (int64_t)(((uint64_t)sec_t[lo] << (L - 1))
                                  | (hr << La) | sa);
    }
}

// Batch parity of x & sign over an array (used by the host-side oracle and
// conservation check).
void parity_and(
    const int64_t* x, int64_t n,
    int64_t sign,
    uint8_t* out)
{
    for (int64_t i = 0; i < n; ++i)
        out[i] = (uint8_t)parity64((uint64_t)x[i] & (uint64_t)sign);
}

}  // extern "C"
