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

extern "C" {

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

}  // extern "C"
