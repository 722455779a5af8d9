/* COCO run-length mask codec, C implementation.
 *
 * The reference data layer decodes instance masks through pycocotools
 * (a C extension; reference: data/datasets.py:327 `mask_utils.decode`,
 * data/datasets.py:77 `mask_utils.encode`).  This is the TPU framework's
 * native equivalent: the LEB128-style counts codec and the column-major
 * run expansion are byte-serial loops that dominate host-side mask
 * materialization when done in Python.  Loaded via ctypes
 * (nerf_from_image_tpu/data/_native/__init__.py); data/coco_mask.py falls
 * back to the pure-numpy implementation when the shared object is absent.
 *
 * Build: scripts/build_native.sh (cc -O2 -shared -fPIC).
 */

#include <stdint.h>
#include <string.h>

#define EXPORT __attribute__((visibility("default")))

/* Decodes pycocotools' compressed counts string into run lengths.
 * Returns the number of runs written, or -1 if `cap` would be exceeded,
 * or -2 on a truncated input. */
EXPORT int64_t rle_decode_counts(const char *s, int64_t n, int64_t *out,
                                 int64_t cap) {
    int64_t i = 0, m = 0;
    while (i < n) {
        int64_t x = 0;
        int k = 0, more = 1;
        while (more) {
            if (i >= n) return -2;
            int64_t c = (int64_t)(unsigned char)s[i] - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (int)(c & 0x20);
            i++;
            if (!more && (c & 0x10)) x |= (int64_t)(-1) << (5 * (k + 1));
            k++;
        }
        if (m > 2) x += out[m - 2];
        if (m >= cap) return -1;
        out[m++] = x;
    }
    return m;
}

/* Encodes run lengths into the compressed counts string.
 * Returns the number of bytes written, or -1 if `cap` would be exceeded. */
EXPORT int64_t rle_encode_counts(const int64_t *counts, int64_t m, char *out,
                                 int64_t cap) {
    int64_t p = 0;
    for (int64_t j = 0; j < m; j++) {
        int64_t x = counts[j];
        if (j > 2) x -= counts[j - 2];
        int more = 1;
        while (more) {
            int64_t c = x & 0x1f;
            x >>= 5;
            more = (c & 0x10) ? (x != -1) : (x != 0);
            if (more) c |= 0x20;
            if (p >= cap) return -1;
            out[p++] = (char)(c + 48);
        }
    }
    return p;
}

/* Expands run lengths into a row-major [h, w] uint8 mask (runs are
 * column-major per the COCO convention; the transpose happens during the
 * write).  `out` must be h*w bytes.  Returns 0, or -1 if the run lengths
 * do not sum to h*w. */
EXPORT int64_t rle_runs_to_mask(const int64_t *counts, int64_t m, int64_t h,
                                int64_t w, uint8_t *out) {
    int64_t total = 0;
    for (int64_t j = 0; j < m; j++) {
        if (counts[j] < 0) return -2; /* malformed: negative run length */
        total += counts[j];
    }
    if (total != h * w || h <= 0 || w <= 0) return -1;
    memset(out, 0, (size_t)(h * w));
    int64_t p = 0;
    for (int64_t j = 0; j < m; j++) {
        int64_t cnt = counts[j];
        if (j & 1) {
            int64_t row = p % h, col = p / h;
            for (int64_t q = 0; q < cnt; q++) {
                out[row * w + col] = 1;
                if (++row == h) {
                    row = 0;
                    col++;
                }
            }
        }
        p += cnt;
    }
    return 0;
}

/* Scans a row-major [h, w] mask into column-major run lengths (leading
 * zero-run included).  Returns the number of runs, or -1 if `cap` would
 * be exceeded. */
EXPORT int64_t rle_mask_to_runs(const uint8_t *mask, int64_t h, int64_t w,
                                int64_t *out, int64_t cap) {
    int64_t m = 0, run = 0;
    uint8_t cur = 0;
    for (int64_t col = 0; col < w; col++) {
        for (int64_t row = 0; row < h; row++) {
            uint8_t v = mask[row * w + col] ? 1 : 0;
            if (v != cur) {
                if (m >= cap) return -1;
                out[m++] = run;
                run = 0;
                cur = v;
            }
            run++;
        }
    }
    if (m >= cap) return -1;
    out[m++] = run;
    return m;
}
