/* f32 -> u8/u16 linear quantizers for the device-resident evaluation
 * staging (orcai_tpu/train/evaluate.py).
 *
 * Why native: evaluation uploads the [0, 1] min-max-normalized test
 * spectrograms as uint8 codes (4x fewer link bytes), and the quantize
 * sits on the critical path of a 1-core host — the numpy chain
 * (multiply + rint + clip + astype) makes four full passes over ~258 MB
 * per 512-snippet split (~0.7-3.4 s depending on RPC-drain contention,
 * measured); this single fused pass runs at memory bandwidth. Semantics
 * are EXACTLY numpy's: f32 product, round-half-to-even (nearbyintf under
 * the default FE rounding mode == np.rint), clip to [0, scale] — tests
 * assert bit equality against the numpy fallback.
 *
 * The reference implementation (ethz-tb/orcAI) evaluates via keras
 * model.predict on host (test.py:228-287) and uploads nothing; this is
 * TPU-architecture machinery.
 */

#include <math.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

void orcai_quant_u8(const float *x, int64_t n, uint8_t *out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = nearbyintf(x[i] * 255.0f);
    v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
    out[i] = (uint8_t)v;
  }
}

void orcai_quant_u16(const float *x, int64_t n, uint16_t *out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = nearbyintf(x[i] * 65535.0f);
    v = v < 0.0f ? 0.0f : (v > 65535.0f ? 65535.0f : v);
    out[i] = (uint16_t)v;
  }
}

#ifdef __cplusplus
}
#endif
