/* bmt_native — C-ABI host runtime kernels for bellman_mpc_tpu.
 *
 * The TPU owns the field/curve/NTT/MSM/pairing compute; what remains hot on
 * the host is per-proof witness processing: evaluating every constraint's
 * A/B/C linear combinations against the assignment (the reference does this
 * in Rust: bellman/src/groth16/prover.rs:19-53 inside synthesis).  This file
 * implements that sparse evaluation over 256-bit scalars with unreduced
 * 576-bit accumulation (the single modular reduction per value happens on
 * the Python side with native bigints).
 *
 * Also exports the reference's C-ABI surface names (bellman/src/lib.rs:
 * 156-201): test_bellman and process.
 *
 * Build: cc -O3 -shared -fPIC bmt_native.c -o libbmt_native.so
 */

#include <stdint.h>
#include <string.h>

typedef unsigned __int128 u128;

/* acc (9 x u64, little-endian) += a (4 limbs) * b (4 limbs) */
static void mac_256x256(uint64_t *acc, const uint64_t *a, const uint64_t *b) {
    uint64_t prod[8] = {0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 t = (u128)a[i] * b[j] + prod[i + j] + carry;
            prod[i + j] = (uint64_t)t;
            carry = t >> 64;
        }
        prod[i + 4] = (uint64_t)carry;
    }
    u128 carry = 0;
    for (int k = 0; k < 8; k++) {
        u128 t = (u128)acc[k] + prod[k] + carry;
        acc[k] = (uint64_t)t;
        carry = t >> 64;
    }
    acc[8] += (uint64_t)carry;
}

/* Evaluate sparse linear combinations.
 *
 *   inputs / aux : assignments, 4 u64 limbs (LE) per value
 *   offsets      : n_cons + 1 term offsets
 *   kinds        : per term, 0 = input variable, 1 = aux variable
 *   indices      : per term, variable index
 *   coeffs       : per term, 4 u64 limbs (LE)
 *   out          : n_cons * 9 u64 limbs (LE), unreduced accumulators
 */
void lc_eval(const uint64_t *inputs, const uint64_t *aux,
             const uint32_t *offsets, const uint8_t *kinds,
             const uint32_t *indices, const uint64_t *coeffs,
             uint64_t *out, uint32_t n_cons) {
    for (uint32_t c = 0; c < n_cons; c++) {
        uint64_t *acc = out + (size_t)c * 9;
        memset(acc, 0, 9 * sizeof(uint64_t));
        for (uint32_t t = offsets[c]; t < offsets[c + 1]; t++) {
            const uint64_t *val =
                (kinds[t] == 0 ? inputs : aux) + (size_t)indices[t] * 4;
            mac_256x256(acc, val, coeffs + (size_t)t * 4);
        }
    }
}

/* ------------------------------------------------------------------ FFI
 * parity exports (reference: bellman/src/lib.rs:156-201). */

void test_bellman(void) { /* healthcheck no-op (lib.rs:157-159) */ }

/* 10-worker counting smoke test (lib.rs:180-201), single-threaded here —
 * host threading belongs to the Python layer. */
uint64_t process(void) {
    uint64_t total = 0;
    for (int t = 0; t < 10; t++) {
        volatile uint64_t x = 0;
        for (int i = 0; i < 5000000; i++) x++;
        total += x;
    }
    return total;
}
