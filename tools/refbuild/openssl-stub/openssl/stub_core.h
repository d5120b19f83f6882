/* OpenSSL 3 ABI stub (oracle build only): just enough surface for the
 * reference's M17 ECDSA verify path (src/crypto/crypt-ecdsa.c).  The
 * stub library fails every verification — the oracle is used for
 * protocol text output, not signature checking. */
#ifndef OSSL_STUB_CORE_H
#define OSSL_STUB_CORE_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct bignum_st BIGNUM;
typedef struct ecdsa_sig_st ECDSA_SIG;
typedef struct evp_pkey_st EVP_PKEY;
typedef struct evp_pkey_ctx_st EVP_PKEY_CTX;
typedef struct ossl_lib_ctx_st OSSL_LIB_CTX;

typedef struct ossl_param_st {
    const char* key;
    unsigned int data_type;
    void* data;
    size_t data_size;
    size_t return_size;
} OSSL_PARAM;

#define OSSL_PKEY_PARAM_GROUP_NAME "group"
#define OSSL_PKEY_PARAM_PUB_KEY    "pub"
#define EVP_PKEY_PUBLIC_KEY        0x86

OSSL_PARAM OSSL_PARAM_construct_utf8_string(const char* key, char* buf, size_t bsize);
OSSL_PARAM OSSL_PARAM_construct_octet_string(const char* key, void* buf, size_t bsize);
OSSL_PARAM OSSL_PARAM_construct_end(void);

BIGNUM* BN_bin2bn(const unsigned char* s, int len, BIGNUM* ret);
void BN_free(BIGNUM* a);

ECDSA_SIG* ECDSA_SIG_new(void);
void ECDSA_SIG_free(ECDSA_SIG* sig);
int ECDSA_SIG_set0(ECDSA_SIG* sig, BIGNUM* r, BIGNUM* s);
int i2d_ECDSA_SIG(const ECDSA_SIG* sig, unsigned char** pp);

EVP_PKEY_CTX* EVP_PKEY_CTX_new_from_name(OSSL_LIB_CTX* libctx, const char* name, const char* propquery);
EVP_PKEY_CTX* EVP_PKEY_CTX_new(EVP_PKEY* pkey, void* e);
void EVP_PKEY_CTX_free(EVP_PKEY_CTX* ctx);
void EVP_PKEY_free(EVP_PKEY* pkey);
int EVP_PKEY_fromdata_init(EVP_PKEY_CTX* ctx);
int EVP_PKEY_fromdata(EVP_PKEY_CTX* ctx, EVP_PKEY** ppkey, int selection, OSSL_PARAM params[]);
int EVP_PKEY_verify_init(EVP_PKEY_CTX* ctx);
int EVP_PKEY_verify(EVP_PKEY_CTX* ctx, const unsigned char* sig, size_t siglen, const unsigned char* tbs,
                    size_t tbslen);

#ifdef __cplusplus
}
#endif

#endif
