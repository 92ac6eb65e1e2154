/* Levenshtein edit distance over token-id sequences.
 *
 * Native replacement for the third-party `editdistance` C++ extension the
 * reference uses for WER (reference: src/postprocess.py:1,31-50).  Tokens are
 * pre-hashed to uint64 on the Python side; this kernel only compares ids.
 *
 * Exposed C ABI (loaded via ctypes):
 *   long edit_distance_u64(const uint64_t* a, long n, const uint64_t* b, long m);
 *   void edit_distance_batch_u64(const uint64_t* a, const long* a_off, const long* a_len,
 *                                const uint64_t* b, const long* b_off, const long* b_len,
 *                                long count, long* out);
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

static long min3(long x, long y, long z) {
    long m = x < y ? x : y;
    return m < z ? m : z;
}

long edit_distance_u64(const uint64_t* a, long n, const uint64_t* b, long m) {
    if (n == 0) return m;
    if (m == 0) return n;
    /* single-row DP, O(min(n,m)) memory */
    if (m > n) { /* swap so the row is the shorter side */
        const uint64_t* t = a; a = b; b = t;
        long tl = n; n = m; m = tl;
    }
    long* row = (long*)malloc((size_t)(m + 1) * sizeof(long));
    if (!row) return -1;
    for (long j = 0; j <= m; ++j) row[j] = j;
    for (long i = 1; i <= n; ++i) {
        long prev_diag = row[0]; /* row[i-1][0] */
        row[0] = i;
        for (long j = 1; j <= m; ++j) {
            long up = row[j];        /* row[i-1][j]   */
            long left = row[j - 1];  /* row[i][j-1]   */
            long sub = prev_diag + (a[i - 1] == b[j - 1] ? 0 : 1);
            row[j] = min3(up + 1, left + 1, sub);
            prev_diag = up;
        }
    }
    long d = row[m];
    free(row);
    return d;
}

void edit_distance_batch_u64(const uint64_t* a, const long* a_off, const long* a_len,
                             const uint64_t* b, const long* b_off, const long* b_len,
                             long count, long* out) {
    for (long i = 0; i < count; ++i) {
        out[i] = edit_distance_u64(a + a_off[i], a_len[i], b + b_off[i], b_len[i]);
    }
}
