/* Native batch edit-distance kernels (optional fast path).
 *
 * Compiled at first import by functions/native.py (gcc -O3, ctypes); the
 * numpy batch kernels in functions/strings.py are the always-available
 * fallback and the parity reference — tests assert bit-identical output.
 * Algorithms are public: Myers' bit-parallel Levenshtein (JACM 1999;
 * multiword form per Hyyro 2003) and the classic Jaro-Winkler with the
 * same greedy-window semantics as the scalar python reference.
 *
 * Why C here: edit scoring is the flagship pipeline's largest compute
 * stage, and the numpy formulation is python-call-overhead bound (~70
 * us/pair vs ~2 us/pair here) while its (n_pairs, W) temporaries put
 * avoidable pressure on DRAM bandwidth — the resource that stops a
 * 32-core node from scaling. The C loops keep the whole DP state in
 * registers/L1.
 */

#include <stdint.h>
#include <string.h>

#define MAX_W 8 /* supports cap <= 512 bytes */

/* Byte-level Levenshtein ratio, Myers/Hyyro multiword bit-parallel.
 * A, B: (n, cap) zero-padded byte matrices; la, lb: byte lengths.
 * out[p] = 1 - dist/max(la,lb)  (1.0 when both empty). */
void batch_lev_ratio(const uint8_t *A, const int64_t *la,
                     const uint8_t *B, const int64_t *lb,
                     int64_t n, int64_t cap, double *out)
{
    uint64_t Peq[256][MAX_W];
    memset(Peq, 0, sizeof(Peq)); /* pairs restore the zero state after use */
    for (int64_t p = 0; p < n; p++) {
        const uint8_t *a = A + p * cap;
        const uint8_t *b = B + p * cap;
        int64_t l = la[p], m = lb[p];
        if (l == 0 || m == 0) {
            out[p] = (l == m) ? 1.0 : 0.0;
            continue;
        }
        if (l == m && memcmp(a, b, (size_t)l) == 0) {
            out[p] = 1.0;
            continue;
        }
        int w = (int)((m + 63) >> 6);
        for (int64_t j = 0; j < m; j++)
            Peq[b[j]][j >> 6] |= 1ULL << (j & 63);
        uint64_t Pv[MAX_W], Mv[MAX_W];
        for (int k = 0; k < w; k++) { Pv[k] = ~0ULL; Mv[k] = 0; }
        int64_t rem = m & 63;
        if (rem) Pv[w - 1] = (1ULL << rem) - 1;
        int64_t score = m;
        int hw = (int)((m - 1) >> 6);
        uint64_t hbit = 1ULL << ((m - 1) & 63);
        for (int64_t i = 0; i < l; i++) {
            const uint64_t *eq = Peq[a[i]];
            uint64_t ph_carry = 1, mh_carry = 0, x_carry = 0;
            for (int k = 0; k < w; k++) {
                uint64_t Eq = eq[k];
                uint64_t pv = Pv[k], mv = Mv[k];
                uint64_t Xv = Eq | mv;
                /* multiword (Eq & pv) + pv with carry chain */
                uint64_t eqpv = Eq & pv;
                uint64_t sum = eqpv + pv + x_carry;
                x_carry = (sum < eqpv || (x_carry && sum == eqpv)) ? 1 : 0;
                uint64_t Xh = (sum ^ pv) | Eq;
                uint64_t Ph = mv | ~(Xh | pv);
                uint64_t Mh = pv & Xh;
                if (k == hw) {
                    if (Ph & hbit) score++;
                    if (Mh & hbit) score--;
                }
                uint64_t ph_hi = Ph >> 63, mh_hi = Mh >> 63;
                Ph = (Ph << 1) | ph_carry;
                Mh = (Mh << 1) | mh_carry;
                ph_carry = ph_hi;
                mh_carry = mh_hi;
                Pv[k] = Mh | ~(Xv | Ph);
                Mv[k] = Ph & Xv;
            }
        }
        /* clear only the Peq entries we set (alphabet of b) */
        for (int64_t j = 0; j < m; j++) {
            Peq[b[j]][0] = 0;
            for (int k = 1; k < w; k++) Peq[b[j]][k] = 0;
        }
        int64_t mx = l > m ? l : m;
        out[p] = 1.0 - (double)score / (double)mx;
    }
}

/* MinHash signatures over pre-hashed shingle groups: one (H,) signature
 * row per group, sig[i] = min over the group's shingles s of a[i]*s + b[i]
 * (intentional uint64 wraparound — identical arithmetic to the numpy
 * fallback). The numpy version materializes an (H, total_shingles) uint64
 * product (~1 GB of DRAM churn per 8k-turn batch); here the running mins
 * live in a 1 KB stack array. */
void batch_minhash(const uint64_t *sh, const int64_t *starts,
                   const int64_t *ends, int64_t n_groups,
                   const uint64_t *a, const uint64_t *b, int64_t H,
                   uint64_t *out)
{
    for (int64_t g = 0; g < n_groups; g++) {
        uint64_t *row = out + g * H;
        for (int64_t i = 0; i < H; i++)
            row[i] = ~0ULL;
        for (int64_t j = starts[g]; j < ends[g]; j++) {
            uint64_t s = sh[j];
            for (int64_t i = 0; i < H; i++) {
                uint64_t v = a[i] * s + b[i];
                if (v < row[i])
                    row[i] = v;
            }
        }
    }
}

/* Jaro-Winkler over uint32 code points, greedy a-order matching with the
 * standard window — semantics identical to the python scalar reference:
 *   w = max(la, lb)/2 - 1 (floor, >= 0)
 *   match window for a[i]: j in [i-w, min(lb, i+w+1))
 *   transpositions = mismatches between a-order and j-order matches / 2
 *   both empty -> 1.0; one empty -> 0.0
 *   prefix boost: common prefix <= 4, applied when jaro > 0.7
 * A, B: (n, cap) zero-padded uint32 matrices; la, lb clipped to cap. */
void batch_jaro_winkler(const uint32_t *A, const int64_t *la,
                        const uint32_t *B, const int64_t *lb,
                        int64_t n, int64_t cap, double pw, double *out)
{
    /* cap is bounded by the caller (<= 512) */
    uint8_t taken[512];
    uint32_t amatch[512], bmatch[512];
    for (int64_t p = 0; p < n; p++) {
        const uint32_t *a = A + p * cap;
        const uint32_t *b = B + p * cap;
        int64_t l = la[p], m = lb[p];
        if (l == 0 && m == 0) { out[p] = 1.0; continue; }
        if (l == 0 || m == 0) { out[p] = 0.0; continue; }
        int64_t mx = l > m ? l : m;
        int64_t w = mx / 2 - 1;
        if (w < 0) w = 0;
        memset(taken, 0, (size_t)m);
        int64_t k = 0;
        for (int64_t i = 0; i < l; i++) {
            int64_t lo = i - w;
            if (lo < 0) lo = 0;
            int64_t hi = i + w + 1;
            if (hi > m) hi = m;
            for (int64_t j = lo; j < hi; j++) {
                if (!taken[j] && b[j] == a[i]) {
                    taken[j] = 1;
                    amatch[k++] = a[i];
                    break;
                }
            }
        }
        double jsim;
        if (k == 0) {
            jsim = 0.0;
        } else {
            int64_t kk = 0;
            for (int64_t j = 0; j < m && kk < k; j++)
                if (taken[j]) bmatch[kk++] = b[j];
            int64_t trans = 0;
            for (int64_t t = 0; t < k; t++)
                if (amatch[t] != bmatch[t]) trans++;
            trans /= 2;
            jsim = ((double)k / (double)l + (double)k / (double)m +
                    (double)(k - trans) / (double)k) / 3.0;
        }
        if (jsim > 0.7) {
            int64_t mn = l < m ? l : m;
            if (mn > 4) mn = 4;
            int64_t pre = 0;
            while (pre < mn && a[pre] == b[pre]) pre++;
            jsim = jsim + (double)pre * pw * (1.0 - jsim);
        }
        out[p] = jsim;
    }
}
