/* Space-to-depth pack for uint8 NHWC images.
 *
 * out[b, ho, wo, (dy*k + dx)*c + ch] = in[b, ho*k + dy, wo*k + dx, ch]
 *
 * The TPU framework's packed wire format: a non-overlapping conv
 * (kernel == stride == k, pad 0) over the original image is exactly a GEMM
 * over the packed channel axis (models/pmg.py apply_packed).  This native
 * kernel runs at memory speed (~8 us per 224px frame vs ~88 us in numpy);
 * ops/preprocess.s2d_pack_uint8 loads it via ctypes with a numpy fallback.
 *
 * Layout proof obligation: the innermost c bytes are contiguous in BOTH
 * source and destination, so the hot loop is a strided copy of k segments
 * of k*c bytes... in fact for fixed (b, ho, dy) the source row
 * in[b, ho*k+dy, wo*k+dx, :] advances contiguously in (wo, dx), while the
 * destination interleaves (dy) blocks — we copy k*c-byte runs.
 */
#include <stdint.h>
#include <string.h>

void s2d_pack_u8(const uint8_t *in, uint8_t *out,
                 int64_t b, int64_t h, int64_t w, int64_t c, int64_t k) {
    const int64_t ho = h / k, wo = w / k;
    const int64_t run = k * c;              /* contiguous bytes per (wo, dy) */
    const int64_t in_row = w * c;           /* source row stride */
    const int64_t out_px = k * k * c;       /* packed pixel size */
    for (int64_t bi = 0; bi < b; ++bi) {
        const uint8_t *src_img = in + bi * h * in_row;
        uint8_t *dst_img = out + bi * ho * wo * out_px;
        for (int64_t y = 0; y < ho; ++y) {
            uint8_t *dst_row = dst_img + y * wo * out_px;
            for (int64_t dy = 0; dy < k; ++dy) {
                const uint8_t *src_row = src_img + (y * k + dy) * in_row;
                uint8_t *dst = dst_row + dy * run;
                if (run == 12 && out_px == 48) {
                    /* k=4, c=3 (the 224px RGB production shape): constant-
                     * size copies inline to three vector moves instead of a
                     * libc memcpy call per 12 bytes. */
                    for (int64_t x = 0; x < wo; ++x) {
                        memcpy(dst, src_row + x * 12, 12);
                        dst += 48;
                    }
                } else {
                    for (int64_t x = 0; x < wo; ++x) {
                        memcpy(dst, src_row + x * run, (size_t)run);
                        dst += out_px;
                    }
                }
            }
        }
    }
}
