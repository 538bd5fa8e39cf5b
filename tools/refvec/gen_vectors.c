/* Reference known-answer-vector generator.
 *
 * Compiles the VENDORED reference libsecp256k1 (the exact code Porla
 * builds into its binaries via `#include "secp256k1.c"`,
 * reference porla/Utils/utils.h:6-10) and dumps ground-truth vectors for
 * the framework's Python/TPU reimplementations:
 *   - the unseeded test-RNG stream (testrand_impl.h:19-105) that derives
 *     the IPA generators (porla/Utils/utils.h:104-124,
 *     porla/Server/Server.hpp:313-327)
 *   - the 129 generator points (128 Pedersen generators + u) and the
 *     client's h_mac (first zero-state draw, Client.hpp:153)
 *   - secp256k1_ecmult / ecmult_const results (ecmult_impl.h:335,
 *     ecmult_const_impl.h:137)
 *   - secp256k1_ecmult_multi_var through both the Strauss (<88 points)
 *     and Pippenger regimes (ecmult_impl.h:55, 814-861)
 *   - the Fiat-Shamir transcript's write-after-finalize SHA-256 quirk
 *     (hash_impl.h:151-168; usage Server.hpp:2306-2432)
 *   - 33-byte compressed point serialization (eckey_impl.h:96)
 *
 * Output: JSON on stdout (committed as tests/vectors/secp256k1_kat.json).
 * Build/run: tools/refvec/run.sh (symlinks the read-only reference tree
 * into a scratch dir so the reconstructed include/ headers resolve).
 */

#include <stdio.h>
#include <string.h>

#include "libsecp256k1-config.h"
#include "secp256k1.c"
#include "testrand_impl.h"

/* --- replicas of the reference's draw helpers (utils.h:104-136) --------- */

static void random_field_element_test(secp256k1_fe *fe) {
    do {
        unsigned char b32[32];
        secp256k1_testrand256_test(b32);
        if (secp256k1_fe_set_b32(fe, b32)) {
            break;
        }
    } while (1);
}

static void random_group_element_test(secp256k1_ge *ge) {
    secp256k1_fe fe;
    do {
        random_field_element_test(&fe);
        if (secp256k1_ge_set_xo_var(ge, &fe, secp256k1_testrand_bits(1))) {
            secp256k1_fe_normalize(&ge->y);
            break;
        }
    } while (1);
    ge->infinity = 0;
}

/* --- printing helpers ---------------------------------------------------- */

static void print_hex(const unsigned char *b, size_t n) {
    size_t i;
    printf("\"");
    for (i = 0; i < n; i++) printf("%02x", b[i]);
    printf("\"");
}

static void print_ge(const secp256k1_ge *ge) {
    unsigned char bx[32], by[32];
    secp256k1_fe x = ge->x, y = ge->y;
    secp256k1_fe_normalize(&x);
    secp256k1_fe_normalize(&y);
    secp256k1_fe_get_b32(bx, &x);
    secp256k1_fe_get_b32(by, &y);
    printf("[");
    print_hex(bx, 32);
    printf(", ");
    print_hex(by, 32);
    printf("]");
}

static void print_gej(const secp256k1_gej *gej) {
    secp256k1_ge ge;
    secp256k1_gej g2 = *gej;
    secp256k1_ge_set_gej(&ge, &g2);
    print_ge(&ge);
}

/* scalar from a little-endian-ish deterministic pattern */
static void scalar_from_u64(secp256k1_scalar *s, uint64_t v) {
    unsigned char b[32];
    int i;
    memset(b, 0, 32);
    for (i = 0; i < 8; i++) b[31 - i] = (unsigned char)(v >> (8 * i));
    secp256k1_scalar_set_b32(s, b, NULL);
}

/* --- ecmult_multi callback (Server.hpp:733-741 pattern) ------------------ */

typedef struct {
    secp256k1_scalar *sc;
    secp256k1_ge *pt;
} md_t;

static int multi_cb(secp256k1_scalar *sc, secp256k1_ge *pt, size_t idx,
                    void *data) {
    md_t *d = (md_t *)data;
    *sc = d->sc[idx];
    *pt = d->pt[idx];
    return 1;
}

#define NGEN 128
#define NMULTI 300

int main(void) {
    secp256k1_context *ctx =
        secp256k1_context_create(SECP256K1_CONTEXT_SIGN |
                                 SECP256K1_CONTEXT_VERIFY);
    secp256k1_ge gens[NGEN + 1];
    secp256k1_ge multi_pts[NMULTI];
    secp256k1_scalar multi_sc[NMULTI];
    secp256k1_gej r;
    secp256k1_scalar na, ng, szero;
    int i;

    printf("{\n");

    /* raw unseeded test-RNG stream: 4x rand256, then 4x rand256_test,
       then 8x bits(5) -- one continuous stream from the zero state */
    {
        unsigned char b32[32];
        printf("  \"testrand_stream\": {\n    \"rand256\": [");
        for (i = 0; i < 4; i++) {
            secp256k1_testrand256(b32);
            if (i) printf(", ");
            print_hex(b32, 32);
        }
        printf("],\n    \"rand256_test\": [");
        for (i = 0; i < 4; i++) {
            secp256k1_testrand256_test(b32);
            if (i) printf(", ");
            print_hex(b32, 32);
        }
        printf("],\n    \"bits5\": [");
        for (i = 0; i < 8; i++) {
            if (i) printf(", ");
            printf("%u", (unsigned)secp256k1_testrand_bits(5));
        }
        printf("]\n  },\n");
    }

    /* NOTE: the draws above consumed RNG state; Porla's generator
       derivation starts from the ZERO state in a fresh process. Reset by
       reconstructing the zero state exactly: the static rng struct is
       zero-initialized C memory. */
    memset(&secp256k1_test_rng, 0, sizeof(secp256k1_test_rng));
    secp256k1_test_rng_precomputed_used = 8;
    secp256k1_test_rng_integer = 0;
    secp256k1_test_rng_integer_bits_left = 0;

    /* 128 generators + u, exactly the server stream (Server.hpp:313-327);
       the client's h_mac equals draw #0 of its own zero-state stream
       (Client.hpp:153) */
    printf("  \"generators\": [");
    for (i = 0; i < NGEN + 1; i++) {
        random_group_element_test(&gens[i]);
        if (i) printf(", ");
        print_ge(&gens[i]);
    }
    printf("],\n");

    /* compressed serialization of the first 4 generators
       (eckey_impl.h:96 via pubkey_serialize; Server.hpp:884-892) */
    printf("  \"compressed\": [");
    for (i = 0; i < 4; i++) {
        secp256k1_pubkey pk;
        unsigned char out[33];
        size_t outlen = 33;
        memcpy(pk.data, &gens[i].x, 32);   /* pubkey_save layout */
        {
            secp256k1_ge tmp = gens[i];
            secp256k1_pubkey_save(&pk, &tmp);
        }
        secp256k1_ec_pubkey_serialize(ctx, out, &outlen, &pk,
                                      SECP256K1_EC_COMPRESSED);
        if (i) printf(", ");
        print_hex(out, 33);
    }
    printf("],\n");

    /* ecmult: r = na*A + ng*G for fixed small/large scalars */
    printf("  \"ecmult\": [");
    for (i = 0; i < 4; i++) {
        secp256k1_gej a;
        secp256k1_gej_set_ge(&a, &gens[i]);
        scalar_from_u64(&na, 0x0123456789abcdefULL * (i + 1));
        scalar_from_u64(&ng, 0xfedcba9876543210ULL * (i + 1));
        secp256k1_ecmult(&r, &a, &na, &ng);
        if (i) printf(", ");
        print_gej(&r);
    }
    printf("],\n");

    /* ecmult_const (constant-time path, used for alpha-blinding and
       complements, Client.hpp:342,437,812) */
    printf("  \"ecmult_const\": [");
    for (i = 0; i < 4; i++) {
        scalar_from_u64(&na, 0x1111111111111111ULL * (i + 1));
        secp256k1_ecmult_const(&r, &gens[i], &na, 256);
        if (i) printf(", ");
        print_gej(&r);
    }
    printf("],\n");

    /* ecmult_multi_var: Strauss regime (N=64 < 88) and Pippenger regime
       (N=300), scalars (i+1)*0x9e3779b97f4a7c15 mod order */
    for (i = 0; i < NMULTI; i++) {
        multi_pts[i] = gens[i % NGEN];
        scalar_from_u64(&multi_sc[i], (uint64_t)(i + 1) *
                        0x9e3779b97f4a7c15ULL);
    }
    secp256k1_scalar_set_int(&szero, 0);
    {
        size_t sizes[2] = {64, NMULTI};
        int k;
        printf("  \"ecmult_multi\": [");
        for (k = 0; k < 2; k++) {
            md_t d;
            secp256k1_scratch *scratch;
            int bw = secp256k1_pippenger_bucket_window(sizes[k]);
            size_t ssz = secp256k1_pippenger_scratch_size(sizes[k], bw);
            scratch = secp256k1_scratch_create(
                &ctx->error_callback,
                ssz + PIPPENGER_SCRATCH_OBJECTS * ALIGNMENT);
            d.sc = multi_sc;
            d.pt = multi_pts;
            secp256k1_ecmult_multi_var(&ctx->error_callback, scratch, &r,
                                       &szero, multi_cb, &d, sizes[k]);
            secp256k1_scratch_destroy(&ctx->error_callback, scratch);
            if (k) printf(", ");
            printf("{\"n\": %d, \"result\": ", (int)sizes[k]);
            print_gej(&r);
            printf("}");
        }
        printf("],\n");
    }

    /* the transcript quirk: ONE sha256 object, finalize, keep writing
       (Server.hpp:2306-2432) */
    {
        secp256k1_sha256 sha;
        unsigned char out1[32], out2[32], out3[32];
        unsigned char seed[32], proof[32];
        memset(seed, 0xAA, 32);
        memset(proof, 0x55, 32);
        secp256k1_sha256_initialize(&sha);
        secp256k1_sha256_write(&sha, seed, 32);
        secp256k1_sha256_write(&sha, proof, 32);
        secp256k1_sha256_finalize(&sha, out1);
        secp256k1_sha256_write(&sha, out1, 32);
        secp256k1_sha256_write(&sha, proof, 32);
        secp256k1_sha256_finalize(&sha, out2);
        secp256k1_sha256_write(&sha, out2, 32);
        secp256k1_sha256_finalize(&sha, out3);
        printf("  \"sha_transcript\": [");
        print_hex(out1, 32);
        printf(", ");
        print_hex(out2, 32);
        printf(", ");
        print_hex(out3, 32);
        printf("]\n");
    }

    printf("}\n");
    secp256k1_context_destroy(ctx);
    return 0;
}
