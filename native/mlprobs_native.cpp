// mlprobs_tpu native runtime: host-side hot loops.
//
// The TPU computes DP matrices and direction bits; these routines do the
// sequential host work the reference does in C++ (traceback walks,
// feature aggregation over pairwise Viterbi alignments) at native speed.
// Exposed via a plain C ABI and loaded with ctypes.
//
// Build: see tools/build_native.py (invoked automatically on import).

#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Probabilistic-consistency relaxation over sparse posteriors.
//
// The reference's hottest host transform (MSA::DoRelaxation,
// MSA.cpp:1172-1360; QuickProbs ConsistencyStage.cpp:133-334): for each
// aligned pair (i, j),
//
//   R_ij = self_coef[p] * P_ij + z_scale[p] * sum_z w_eff[p,z] P_iz P_zj
//
// masked to the original support of P_ij and thresholded at `cutoff`
// (support never grows, so outputs reuse the input index structure).
// self_coef / z_scale / w_eff encode both variants: the plain baseMSA
// transform (self=2/N, scale=1/N, w=1 for z != i,j) and the QuickProbs
// weighted one (self=1/sumW, scale=1/(Wij*sumW), w_z = ClustalW weight,
// zeroed for z rejected by the stochastic selectivity filter).
//
// Cell storage: all ordered cells (i, j), i != j, as CSR over a shared
// pool; cell c = i*n + j has indptr at indptr_pool + cell_ptr[c]
// (lengths[i] + 1 entries) and indices/data at indices_pool/data_pool +
// cell_dat[c].  Lower cells hold precomputed transposes.  Results are
// written to out_data at the same offsets as the upper pair's data.
//
// Parallelism: OpenMP dynamic over pairs — the exact analogue of the
// reference's `#pragma omp parallel for schedule(dynamic)` pair loops.
// A per-thread epoch-stamped dense scratch row avoids per-row memsets.
void relax_all_pairs(
    int n,
    const int32_t* lengths,
    const int64_t* cell_ptr,    // (n*n,) offsets into indptr_pool
    const int64_t* cell_dat,    // (n*n,) offsets into indices/data pools
    const int32_t* indptr_pool,
    const int32_t* indices_pool,
    const float* data_pool,
    int npairs,
    const int32_t* pair_ij,     // (npairs, 2)
    const float* self_coef,     // (npairs,)
    const float* z_scale,       // (npairs,)
    const float* w_eff,         // (npairs * n)
    float cutoff,
    float* out_data             // same layout as data_pool (upper cells)
) {
    int max_len = 0;
    for (int i = 0; i < n; ++i)
        if (lengths[i] > max_len) max_len = lengths[i];

#pragma omp parallel
    {
        std::vector<float> acc((size_t)max_len, 0.0f);

#pragma omp for schedule(dynamic)
        for (int p = 0; p < npairs; ++p) {
            const int i = pair_ij[2 * p];
            const int j = pair_ij[2 * p + 1];
            const int li = lengths[i];
            const int lj = lengths[j];
            const float sc = self_coef[p];
            const float zs = z_scale[p];
            const float* we = w_eff + (size_t)p * n;

            const int64_t cij = (int64_t)i * n + j;
            const int32_t* ip_ij = indptr_pool + cell_ptr[cij];
            const int32_t* ix_ij = indices_pool + cell_dat[cij];
            const float* da_ij = data_pool + cell_dat[cij];
            float* out = out_data + cell_dat[cij];

            for (int r = 0; r < li; ++r) {
                const int s0 = ip_ij[r], s1 = ip_ij[r + 1];
                if (s0 == s1) continue;
                std::memset(acc.data(), 0, (size_t)lj * sizeof(float));
                // accumulate sum_z w_z * (row r of P_iz) @ P_zj
                for (int z = 0; z < n; ++z) {
                    const float wz = we[z];
                    if (wz == 0.0f) continue;
                    const int64_t ciz = (int64_t)i * n + z;
                    const int32_t* ip_a = indptr_pool + cell_ptr[ciz];
                    const int32_t a0 = ip_a[r], a1 = ip_a[r + 1];
                    if (a0 == a1) continue;
                    const int32_t* ix_a = indices_pool + cell_dat[ciz];
                    const float* da_a = data_pool + cell_dat[ciz];
                    const int64_t czj = (int64_t)z * n + j;
                    const int32_t* ip_b = indptr_pool + cell_ptr[czj];
                    const int32_t* ix_b = indices_pool + cell_dat[czj];
                    const float* da_b = data_pool + cell_dat[czj];
                    for (int a = a0; a < a1; ++a) {
                        const int m = ix_a[a];
                        const float va = wz * da_a[a];
                        const int b0 = ip_b[m], b1 = ip_b[m + 1];
                        for (int b = b0; b < b1; ++b) {
                            acc[ix_b[b]] += va * da_b[b];
                        }
                    }
                }
                // emit at the support of P_ij only
                for (int s = s0; s < s1; ++s) {
                    const float v = sc * da_ij[s] + zs * acc[ix_ij[s]];
                    out[s] = (v < cutoff) ? 0.0f : v;
                }
            }
        }
    }
}

// Walk one MWT direction matrix (0=diag, 1=left, 2=up) from (lx, ly).
// dirs has row stride `stride`. Writes path codes (0='B',1='X',2='Y')
// in forward order into out (capacity lx+ly); returns path length.
int mwt_traceback(const int8_t* dirs, int stride, int lx, int ly,
                  int8_t* out) {
    int r = lx, c = ly, n = 0;
    int8_t* rev = out;  // fill backwards then reverse
    while (r != 0 || c != 0) {
        int8_t d = dirs[r * stride + c];
        if (d == 0) { --r; --c; rev[n++] = 0; }
        else if (d == 1) { --c; rev[n++] = 2; }
        else { --r; rev[n++] = 1; }
    }
    for (int i = 0; i < n / 2; ++i) {
        int8_t t = out[i]; out[i] = out[n - 1 - i]; out[n - 1 - i] = t;
    }
    return n;
}

// Walk one packed Viterbi direction matrix (bits 0-1: M predecessor,
// bit 2: X-from-X, bit 3: Y-from-Y) from (lx, ly) in state `state`.
int viterbi_traceback(const int8_t* dirs, int stride, int lx, int ly,
                      int state, int8_t* out) {
    int r = lx, c = ly, n = 0;
    while (r != 0 || c != 0) {
        int8_t d = dirs[r * stride + c];
        int nxt;
        if (state == 0) { nxt = d & 3; --r; --c; out[n++] = 0; }
        else if (state == 1) { nxt = (d & 4) ? 1 : 0; --r; out[n++] = 1; }
        else { nxt = (d & 8) ? 2 : 0; --c; out[n++] = 2; }
        state = nxt;
    }
    for (int i = 0; i < n / 2; ++i) {
        int8_t t = out[i]; out[i] = out[n - 1 - i]; out[n - 1 - i] = t;
    }
    return n;
}

// Aggregate the -G feature pass over a batch of pairwise Viterbi
// alignments (MSA.cpp Alter_ModelAdjustmentTest semantics).
//
// For each pair k: traceback dirs[k], walk the path against sequences
// x=seqs[xi[k]], y=seqs[yi[k]] (int8 residue classes; 0..19 standard),
// and accumulate:
//   pids[k]      = matches / path_len
//   lengths[k]   = path_len
//   col_acc[pos] += blosum(a,b) for matched standard residues with
//                  score < 10 (shared across pairs)
//   sp_sum, sp_cols
// Returns the max path length over the batch.
int viterbi_features_batch(
    const int8_t* dirs,        // (B, stride_r, stride_c) packed dirs
    const int32_t* end_states, // (B,)
    int batch, int stride_r, int stride_c,
    const int8_t* const* xs,   // per-pair pointers to encoded sequences
    const int8_t* const* ys,
    const int32_t* lxs, const int32_t* lys,
    const double* blosum,      // (21*21) with unknown row zero
    double* pids,              // out (B,)
    int32_t* lengths,          // out (B,)
    double* col_acc,           // out (cap,) shared accumulation
    int col_cap,
    double* sp_out             // out [sp_sum, sp_cols]
) {
    int max_len = 0;
    double sp_sum = 0.0;
    long long sp_cols = 0;
    std::vector<int8_t> path;
    for (int k = 0; k < batch; ++k) {
        int lx = lxs[k], ly = lys[k];
        path.resize(lx + ly + 2);
        const int8_t* d = dirs + (long long)k * stride_r * stride_c;
        int n = viterbi_traceback(d, stride_c, lx, ly, end_states[k],
                                  path.data());
        if (n > max_len) max_len = n;
        const int8_t* x = xs[k];
        const int8_t* y = ys[k];
        int a = 0, b = 0, matches = 0;
        for (int t = 0; t < n; ++t) {
            if (path[t] == 0) {
                int ca = x[a++], cb = y[b++];
                if (ca == cb) ++matches;
                if (ca < 20 && cb < 20) {
                    double s = blosum[ca * 21 + cb];
                    if (s < 10.0 && t < col_cap) {
                        col_acc[t] += s;
                        sp_sum += s;
                    }
                }
            } else if (path[t] == 1) ++a;
            else ++b;
        }
        sp_cols += n;
        pids[k] = n > 0 ? (double)matches / n : 0.0;
        lengths[k] = n;
    }
    sp_out[0] = sp_sum;
    sp_out[1] = (double)sp_cols;
    return max_len;
}

// ---------------------------------------------------------------------------
// Profile-profile posterior builder.
//
// The construction hot loop (ProbabilisticModel::BuildPosterior,
// ProbabilisticModel.h:1197-1379 / ParallelProbabilisticModel.cpp
// buildPosterior): for every inter-group sequence pair, scatter its
// sparse posterior through the two gap mappings into the dense
// (l1, l2) profile plane, weighted; optionally subtract w * cutoff at
// every mapped cell (the QuickProbs posteriorCutoff subtraction over
// ungapped rows x the first l2-1 mapped columns).
//
// COO pool layout: pair p owns entries [pair_off[p], pair_off[p+1]) of
// coo_r / coo_c / coo_v (ungapped 0-based coordinates in its two
// sequences).  maps1/maps2 pools hold each group member's
// ungapped-position -> profile-column map (map1_off has n1+1 entries).
//
// OpenMP over pairs with per-thread accumulation planes, reduced at
// the end (matches the reference's row-block parallel variant).
void profile_posterior(
    int l1, int l2,
    int npairs,
    const int64_t* pair_start,   // (npairs,) offsets into the COO pool
    const int64_t* pair_len,     // (npairs,)
    const int32_t* a_idx,        // (npairs,) group-1 member
    const int32_t* b_idx,        // (npairs,) group-2 member
    const float* wts,            // (npairs,)
    const int32_t* coo_r,
    const int32_t* coo_c,
    const float* coo_v,
    const int32_t* maps1, const int64_t* map1_off,
    const int32_t* maps2, const int64_t* map2_off,
    float cutoff_sub,
    float* out                   // (l1*l2), caller-zeroed
) {
    const size_t plane = (size_t)l1 * l2;
#ifdef _OPENMP
    int nthreads = omp_get_max_threads();
#else
    int nthreads = 1;
#endif
    std::vector<std::vector<double>> acc(
        nthreads, std::vector<double>(plane, 0.0));

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (int p = 0; p < npairs; ++p) {
#ifdef _OPENMP
        double* A = acc[omp_get_thread_num()].data();
#else
        double* A = acc[0].data();
#endif
        const int32_t* m1 = maps1 + map1_off[a_idx[p]];
        const int32_t* m2 = maps2 + map2_off[b_idx[p]];
        const double w = wts[p];
        const int64_t e0 = pair_start[p], e1 = e0 + pair_len[p];
        for (int64_t e = e0; e < e1; ++e) {
            A[(size_t)m1[coo_r[e]] * l2 + m2[coo_c[e]]] += w * coo_v[e];
        }
        if (cutoff_sub != 0.0f) {
            const int64_t n1 =
                map1_off[a_idx[p] + 1] - map1_off[a_idx[p]];
            const int64_t n2 =
                map2_off[b_idx[p] + 1] - map2_off[b_idx[p]];
            const double sub = w * (double)cutoff_sub;
            // ungapped rows x the first n2-1 mapped columns
            // (the reference mapping's 0 sentinel swallows one entry)
            for (int64_t r = 0; r < n1; ++r) {
                double* row = A + (size_t)m1[r] * l2;
                for (int64_t c = 0; c + 1 < n2; ++c) {
                    row[m2[c]] -= sub;
                }
            }
        }
    }
    for (int t = 0; t < nthreads; ++t) {
        const double* A = acc[t].data();
        for (size_t k = 0; k < plane; ++k) out[k] += (float)A[k];
    }
}

}  // extern "C"
