// Native host-side preprocessing kernels for blasted_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; these routines are the host-side
// symbolic/setup passes that the reference implements natively in its src/
// tree (level scheduling: src/levelschedule.cpp; ILU position lists:
// src/ilu_pattern.cpp; diagonal search: src/helper_algorithms.hpp).  They are
// sequential-dependency algorithms that vectorise poorly in NumPy, so they
// live here as a small C++ library loaded through ctypes
// (blasted_tpu/native/__init__.py), with pure-NumPy fallbacks kept in the
// Python tree.
//
// Build: g++ -O3 -march=native -shared -fPIC blasted_host.cpp -o libblasted_host.so

#include <cstdint>
#include <algorithm>
#include <vector>

extern "C" {

// Wavefront depth for forward substitution: level[i] = 1 + max over
// strictly-lower neighbours (equivalent partition to the reference's
// consecutive peeling, levelschedule.cpp:11-71).
void blasted_levels_lower(int64_t n, const int64_t* rowptr,
                          const int32_t* colind, int32_t* level) {
    for (int64_t i = 0; i < n; ++i) {
        int32_t lv = 0;
        for (int64_t jj = rowptr[i]; jj < rowptr[i + 1]; ++jj) {
            int32_t c = colind[jj];
            if (c < i && level[c] + 1 > lv) lv = level[c] + 1;
        }
        level[i] = lv;
    }
}

void blasted_levels_upper(int64_t n, const int64_t* rowptr,
                          const int32_t* colind, int32_t* level) {
    for (int64_t i = n - 1; i >= 0; --i) {
        int32_t lv = 0;
        for (int64_t jj = rowptr[i]; jj < rowptr[i + 1]; ++jj) {
            int32_t c = colind[jj];
            if (c > i && level[c] + 1 > lv) lv = level[c] + 1;
        }
        level[i] = lv;
    }
}

// Position of the diagonal entry of each row (binary search per row;
// reference: helper_algorithms.hpp inner_search).
// Returns the index of the first row lacking a diagonal, or -1 on success.
int64_t blasted_diagind(int64_t n, const int64_t* rowptr,
                        const int32_t* colind, int32_t* diagind) {
    for (int64_t i = 0; i < n; ++i) {
        const int32_t* lo = colind + rowptr[i];
        const int32_t* hi = colind + rowptr[i + 1];
        const int32_t* p = std::lower_bound(lo, hi, (int32_t)i);
        if (p == hi || *p != (int32_t)i) return i;
        diagind[i] = (int32_t)(p - colind);
    }
    return -1;
}

// ILU(0) position lists (reference: ilu_pattern.cpp:31-163).  Uniform
// formulation: for nonzero (i,c), pairs are {(posL=(i,k), posU=(k,c)) :
// k < min(i,c), both stored}.  Two-pass: count then fill.
// posptr must have length nnz+1; lowerp/upperp length posptr[nnz] (second call).
// Pass lowerp == nullptr for the counting pass.
void blasted_ilu_positions(int64_t n, const int64_t* rowptr,
                           const int32_t* colind, const int32_t* diagind,
                           int64_t* posptr, int32_t* lowerp, int32_t* upperp) {
    const int64_t nnz = rowptr[n];
    if (!lowerp) {
        for (int64_t j = 0; j <= nnz; ++j) posptr[j] = 0;
    }
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t j = rowptr[i]; j < rowptr[i + 1]; ++j) {
            const int32_t c = colind[j];
            const int32_t kmax = std::min((int32_t)i, c);
            int64_t cnt = 0;
            for (int64_t kk = rowptr[i];
                 kk < rowptr[i + 1] && colind[kk] < kmax; ++kk) {
                const int32_t k = colind[kk];
                // search for column c in the upper part of row k
                const int32_t* lo = colind + diagind[k] + 1;
                const int32_t* hi = colind + rowptr[k + 1];
                const int32_t* p = std::lower_bound(lo, hi, c);
                if (p != hi && *p == c) {
                    if (lowerp) {
                        const int64_t at = posptr[j] + cnt;
                        lowerp[at] = (int32_t)kk;
                        upperp[at] = (int32_t)(p - colind);
                    }
                    ++cnt;
                }
            }
            if (!lowerp) posptr[j + 1] = cnt;
        }
    }
    if (!lowerp) {
        for (int64_t j = 0; j < nnz; ++j) posptr[j + 1] += posptr[j];
    }
}

}  // extern "C"
