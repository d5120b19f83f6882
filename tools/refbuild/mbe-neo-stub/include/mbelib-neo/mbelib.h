/* Minimal mbelib-neo ABI stub — used ONLY to build the reference decoder
 * as a protocol-output oracle for parity testing (voice synthesis is
 * replaced by silence; error counts report zero).  Reconstructed from the
 * reference's own compile check (CMakeLists.txt:578-618) and call sites
 * (src/core/vocoder/dsd_mbe.c).  Not shipped; test tooling only. */
#ifndef MBELIB_NEO_STUB_H
#define MBELIB_NEO_STUB_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

#define MBE_NEO_STUB 1

typedef struct mbe_parameters {
    float w0;
    int L;
    int K;
    int Ml[57];
    float gamma;
    int Vl[57];
    float PSIl[57];
    float PHIl[57];
    int swn;
    int repeat;
} mbe_parms;

typedef struct {
    uint8_t bit;
    uint8_t reliability;
} mbe_soft_bit;

typedef struct {
    int status;
    int total_errors;
    int protected_errors;
    int unprotected_errors;
    int c0_errors;
    int c4_errors;
    unsigned int flags;
} mbe_process_result;

enum {
    MBE_STATUS_OK = 0,
    MBE_STATUS_INVALID_ARGUMENT = -1,
    MBE_STATUS_INVALID_BITS = -2,
};

#define MBE_PROCESS_FLAG_C0_VALID   (1u << 0)
#define MBE_PROCESS_FLAG_C4_VALID   (1u << 1)
#define MBE_PROCESS_FLAG_MUTE       (1u << 2)
#define MBE_PROCESS_FLAG_REPEAT     (1u << 3)
#define MBE_PROCESS_FLAG_SOFT_INPUT (1u << 4)

const char* mbe_versionString(void);
void mbe_initMbeParms(mbe_parms* cur_mp, mbe_parms* prev_mp, mbe_parms* prev_mp_enhanced);
void mbe_initProcessResult(mbe_process_result* result);
void mbe_formatProcessResult(char* out, size_t out_size, const mbe_process_result* result);
void mbe_synthesizeSilencef(float* aout_buf);
void mbe_floattoshort(float* float_buf, short* aout_buf);

int mbe_decodeImbe7200x4400Frame(const char imbe_fr[8][23], char* imbe_d, mbe_process_result* result);
int mbe_decodeImbe7100x4400Frame(const char imbe7100_fr[7][24], char* imbe_d, mbe_process_result* result);
int mbe_decodeAmbe3600x2450Frame(const char ambe_fr[4][24], char* ambe_d, mbe_process_result* result);
int mbe_decodeImbe7200x4400SoftFrame(const mbe_soft_bit imbe_fr[8][23], char* imbe_d, mbe_process_result* result);
int mbe_decodeAmbe3600x2450SoftFrame(const mbe_soft_bit ambe_fr[4][24], char* ambe_d, mbe_process_result* result);

int mbe_processImbe4400Dataf(float* aout_buf, mbe_process_result* result, char* imbe_d, mbe_parms* cur_mp,
                             mbe_parms* prev_mp, mbe_parms* prev_mp_enhanced);
int mbe_processAmbe2450Dataf(float* aout_buf, mbe_process_result* result, char* ambe_d, mbe_parms* cur_mp,
                             mbe_parms* prev_mp, mbe_parms* prev_mp_enhanced);
int mbe_processAmbe2400Dataf(float* aout_buf, mbe_process_result* result, char* ambe_d, mbe_parms* cur_mp,
                             mbe_parms* prev_mp, mbe_parms* prev_mp_enhanced);
int mbe_processAmbe3600x2400Framef(float* aout_buf, mbe_process_result* result, const char ambe_fr[4][24],
                                   char* ambe_d, mbe_parms* cur_mp, mbe_parms* prev_mp, mbe_parms* prev_mp_enhanced);
int mbe_processAmbe3600x2450Framef(float* aout_buf, mbe_process_result* result, const char ambe_fr[4][24],
                                   char* ambe_d, mbe_parms* cur_mp, mbe_parms* prev_mp, mbe_parms* prev_mp_enhanced);
int mbe_processAmbe3600x2450SoftFramef(float* aout_buf, mbe_process_result* result, const mbe_soft_bit ambe_fr[4][24],
                                       char* ambe_d, mbe_parms* cur_mp, mbe_parms* prev_mp,
                                       mbe_parms* prev_mp_enhanced);

#ifdef __cplusplus
}
#endif

#endif /* MBELIB_NEO_STUB_H */
