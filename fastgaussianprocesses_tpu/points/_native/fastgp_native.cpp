// Native point-generation kernels for the TPU fast-GP framework.
//
// The reference delegates its point generation to qmcpy's compiled C
// internals (SURVEY.md section 2.3); this is the framework's own native
// layer: batch generation of Sobol' digital-net points (natural order,
// digital shift) and rank-1 lattice points (van der Corput order, random
// shift), plus bit-reversal tables.  Exposed through ctypes (points/native.py)
// with pure-numpy fallbacks.
//
// Build: g++ -O3 -march=native -shared -fPIC fastgp_native.cpp -o libfastgp_native.so

#include <cstdint>
#include <cstddef>

extern "C" {

// Reverse the lowest 32 bits of each index.
static inline uint32_t bitrev32(uint32_t v) {
    v = ((v & 0x55555555u) << 1) | ((v >> 1) & 0x55555555u);
    v = ((v & 0x33333333u) << 2) | ((v >> 2) & 0x33333333u);
    v = ((v & 0x0F0F0F0Fu) << 4) | ((v >> 4) & 0x0F0F0F0Fu);
    v = ((v & 0x00FF00FFu) << 8) | ((v >> 8) & 0x00FF00FFu);
    return (v << 16) | (v >> 16);
}

// Sobol' natural order: out[i - n_min][j] = shift[j] XOR xor_{set bits b of i} cols[j][b].
// cols: (d, m_max) row-major uint32; out: (n_max - n_min, d) row-major.
// Gray-code incremental generation: from x_i to x_{i+1} exactly one
// *Gray* flip differs, but natural order needs the direct XOR form; we still
// amortize by iterating i and updating only the changed columns of the
// binary expansion (trailing-bit trick: i -> i+1 flips bits [0, ctz(i+1)]).
void sobol_natural(const uint32_t* cols, int d, int m_max,
                   uint64_t n_min, uint64_t n_max, const uint32_t* shift,
                   uint32_t* out) {
    // state = XOR of cols[j][b] over set bits b of i
    uint32_t* state = new uint32_t[d];
    for (int j = 0; j < d; ++j) state[j] = 0;
    uint64_t i = n_min;
    for (int b = 0; b < m_max; ++b) {
        if ((i >> b) & 1ull) {
            for (int j = 0; j < d; ++j) state[j] ^= cols[(size_t)j * m_max + b];
        }
    }
    for (; i < n_max; ++i) {
        uint32_t* row = out + (size_t)(i - n_min) * d;
        for (int j = 0; j < d; ++j) row[j] = state[j] ^ shift[j];
        // advance i -> i+1: bits [0, z] flip where z = count of trailing ones
        uint64_t ip = i + 1;
        uint64_t changed = i ^ ip;  // mask of flipped bits
        // b < m_max guard: when n_max == 2^m_max the final increment flips
        // bit m_max, which has no column — without the bound that read is
        // one past the cols row (past the whole array for j == d-1)
        for (int b = 0; b < m_max && (changed >> b); ++b) {
            if ((changed >> b) & 1ull) {
                for (int j = 0; j < d; ++j) state[j] ^= cols[(size_t)j * m_max + b];
            }
        }
    }
    delete[] state;
}

// uint64 variant for t > 30 bit precision (t <= 53 keeps float64 exact).
void sobol_natural64(const uint64_t* cols, int d, int m_max,
                     uint64_t n_min, uint64_t n_max, const uint64_t* shift,
                     uint64_t* out) {
    uint64_t* state = new uint64_t[d];
    for (int j = 0; j < d; ++j) state[j] = 0;
    uint64_t i = n_min;
    for (int b = 0; b < m_max; ++b) {
        if ((i >> b) & 1ull) {
            for (int j = 0; j < d; ++j) state[j] ^= cols[(size_t)j * m_max + b];
        }
    }
    for (; i < n_max; ++i) {
        uint64_t* row = out + (size_t)(i - n_min) * d;
        for (int j = 0; j < d; ++j) row[j] = state[j] ^ shift[j];
        uint64_t ip = i + 1;
        uint64_t changed = i ^ ip;
        for (int b = 0; b < m_max && (changed >> b); ++b) {  // see 32-bit variant
            if ((changed >> b) & 1ull) {
                for (int j = 0; j < d; ++j) state[j] ^= cols[(size_t)j * m_max + b];
            }
        }
    }
    delete[] state;
}

// Rank-1 lattice, natural (van der Corput) order with shift:
// out[i - n_min][j] = frac(vdc(i) * g[j] + shift[j]).
void lattice_natural(const uint64_t* gen_vec, int d,
                     uint64_t n_min, uint64_t n_max, const double* shift,
                     double* out) {
    const double inv32 = 1.0 / 4294967296.0;
    for (uint64_t i = n_min; i < n_max; ++i) {
        double v = bitrev32((uint32_t)i) * inv32;
        double* row = out + (size_t)(i - n_min) * d;
        for (int j = 0; j < d; ++j) {
            double x = v * (double)gen_vec[j] + shift[j];
            x -= (double)(int64_t)x;  // frac for non-negative x
            row[j] = x;
        }
    }
}

void bit_reverse_table(int m, int64_t* out) {
    uint32_t n = 1u << m;
    for (uint32_t i = 0; i < n; ++i) out[i] = bitrev32(i) >> (32 - m);
}

}  // extern "C"
