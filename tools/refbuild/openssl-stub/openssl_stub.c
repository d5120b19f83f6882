/* OpenSSL stub library: every operation fails gracefully. */
#include <openssl/stub_core.h>
#include <stdlib.h>
#include <string.h>

OSSL_PARAM
OSSL_PARAM_construct_utf8_string(const char* key, char* buf, size_t bsize) {
    OSSL_PARAM p = {key, 4, buf, bsize, 0};
    return p;
}

OSSL_PARAM
OSSL_PARAM_construct_octet_string(const char* key, void* buf, size_t bsize) {
    OSSL_PARAM p = {key, 5, buf, bsize, 0};
    return p;
}

OSSL_PARAM
OSSL_PARAM_construct_end(void) {
    OSSL_PARAM p = {NULL, 0, NULL, 0, 0};
    return p;
}

BIGNUM*
BN_bin2bn(const unsigned char* s, int len, BIGNUM* ret) {
    (void)s;
    (void)len;
    (void)ret;
    return NULL;
}

void
BN_free(BIGNUM* a) {
    (void)a;
}

ECDSA_SIG*
ECDSA_SIG_new(void) {
    return NULL;
}

void
ECDSA_SIG_free(ECDSA_SIG* sig) {
    (void)sig;
}

int
ECDSA_SIG_set0(ECDSA_SIG* sig, BIGNUM* r, BIGNUM* s) {
    (void)sig;
    (void)r;
    (void)s;
    return 0;
}

int
i2d_ECDSA_SIG(const ECDSA_SIG* sig, unsigned char** pp) {
    (void)sig;
    (void)pp;
    return -1;
}

EVP_PKEY_CTX*
EVP_PKEY_CTX_new_from_name(OSSL_LIB_CTX* libctx, const char* name, const char* propquery) {
    (void)libctx;
    (void)name;
    (void)propquery;
    return NULL;
}

EVP_PKEY_CTX*
EVP_PKEY_CTX_new(EVP_PKEY* pkey, void* e) {
    (void)pkey;
    (void)e;
    return NULL;
}

void
EVP_PKEY_CTX_free(EVP_PKEY_CTX* ctx) {
    (void)ctx;
}

void
EVP_PKEY_free(EVP_PKEY* pkey) {
    (void)pkey;
}

int
EVP_PKEY_fromdata_init(EVP_PKEY_CTX* ctx) {
    (void)ctx;
    return 0;
}

int
EVP_PKEY_fromdata(EVP_PKEY_CTX* ctx, EVP_PKEY** ppkey, int selection, OSSL_PARAM params[]) {
    (void)ctx;
    (void)ppkey;
    (void)selection;
    (void)params;
    return 0;
}

int
EVP_PKEY_verify_init(EVP_PKEY_CTX* ctx) {
    (void)ctx;
    return 0;
}

int
EVP_PKEY_verify(EVP_PKEY_CTX* ctx, const unsigned char* sig, size_t siglen, const unsigned char* tbs, size_t tbslen) {
    (void)ctx;
    (void)sig;
    (void)siglen;
    (void)tbs;
    (void)tbslen;
    return 0;
}
