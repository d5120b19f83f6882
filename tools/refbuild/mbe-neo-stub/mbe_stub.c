/* mbelib-neo stub implementation: silence synthesis, zero errors. */
#include <mbelib-neo/mbelib.h>
#include <stdio.h>
#include <string.h>

const char*
mbe_versionString(void) {
    return "2.0.0-stub";
}

void
mbe_initMbeParms(mbe_parms* cur_mp, mbe_parms* prev_mp, mbe_parms* prev_mp_enhanced) {
    if (cur_mp) memset(cur_mp, 0, sizeof(*cur_mp));
    if (prev_mp) memset(prev_mp, 0, sizeof(*prev_mp));
    if (prev_mp_enhanced) memset(prev_mp_enhanced, 0, sizeof(*prev_mp_enhanced));
}

void
mbe_initProcessResult(mbe_process_result* result) {
    if (result) memset(result, 0, sizeof(*result));
}

void
mbe_formatProcessResult(char* out, size_t out_size, const mbe_process_result* result) {
    if (out && out_size) {
        snprintf(out, out_size, "(%d/%d)", result ? result->total_errors : 0,
                 result ? result->protected_errors : 0);
    }
}

void
mbe_synthesizeSilencef(float* aout_buf) {
    if (aout_buf) memset(aout_buf, 0, 160 * sizeof(float));
}

void
mbe_floattoshort(float* float_buf, short* aout_buf) {
    for (int i = 0; i < 160; i++) {
        float v = float_buf[i];
        if (v > 32760.0f) v = 32760.0f;
        if (v < -32760.0f) v = -32760.0f;
        aout_buf[i] = (short)v;
    }
}

static int
ok(mbe_process_result* result) {
    if (result) {
        mbe_initProcessResult(result);
        result->flags = MBE_PROCESS_FLAG_C0_VALID;
    }
    return MBE_STATUS_OK;
}

int
mbe_decodeImbe7200x4400Frame(const char imbe_fr[8][23], char* imbe_d, mbe_process_result* result) {
    (void)imbe_fr;
    if (imbe_d) memset(imbe_d, 0, 88);
    return ok(result);
}

int
mbe_decodeImbe7100x4400Frame(const char imbe7100_fr[7][24], char* imbe_d, mbe_process_result* result) {
    (void)imbe7100_fr;
    if (imbe_d) memset(imbe_d, 0, 88);
    return ok(result);
}

int
mbe_decodeAmbe3600x2450Frame(const char ambe_fr[4][24], char* ambe_d, mbe_process_result* result) {
    (void)ambe_fr;
    if (ambe_d) memset(ambe_d, 0, 49);
    return ok(result);
}

int
mbe_decodeImbe7200x4400SoftFrame(const mbe_soft_bit imbe_fr[8][23], char* imbe_d, mbe_process_result* result) {
    (void)imbe_fr;
    if (imbe_d) memset(imbe_d, 0, 88);
    return ok(result);
}

int
mbe_decodeAmbe3600x2450SoftFrame(const mbe_soft_bit ambe_fr[4][24], char* ambe_d, mbe_process_result* result) {
    (void)ambe_fr;
    if (ambe_d) memset(ambe_d, 0, 49);
    return ok(result);
}

static int
synth(float* aout_buf, mbe_process_result* result) {
    mbe_synthesizeSilencef(aout_buf);
    return ok(result);
}

int
mbe_processImbe4400Dataf(float* aout_buf, mbe_process_result* result, char* imbe_d, mbe_parms* cur_mp,
                         mbe_parms* prev_mp, mbe_parms* prev_mp_enhanced) {
    (void)imbe_d; (void)cur_mp; (void)prev_mp; (void)prev_mp_enhanced;
    return synth(aout_buf, result);
}

int
mbe_processAmbe2450Dataf(float* aout_buf, mbe_process_result* result, char* ambe_d, mbe_parms* cur_mp,
                         mbe_parms* prev_mp, mbe_parms* prev_mp_enhanced) {
    (void)ambe_d; (void)cur_mp; (void)prev_mp; (void)prev_mp_enhanced;
    return synth(aout_buf, result);
}

int
mbe_processAmbe2400Dataf(float* aout_buf, mbe_process_result* result, char* ambe_d, mbe_parms* cur_mp,
                         mbe_parms* prev_mp, mbe_parms* prev_mp_enhanced) {
    (void)ambe_d; (void)cur_mp; (void)prev_mp; (void)prev_mp_enhanced;
    return synth(aout_buf, result);
}

int
mbe_processAmbe3600x2400Framef(float* aout_buf, mbe_process_result* result, const char ambe_fr[4][24], char* ambe_d,
                               mbe_parms* cur_mp, mbe_parms* prev_mp, mbe_parms* prev_mp_enhanced) {
    (void)ambe_fr; (void)ambe_d; (void)cur_mp; (void)prev_mp; (void)prev_mp_enhanced;
    return synth(aout_buf, result);
}

int
mbe_processAmbe3600x2450Framef(float* aout_buf, mbe_process_result* result, const char ambe_fr[4][24], char* ambe_d,
                               mbe_parms* cur_mp, mbe_parms* prev_mp, mbe_parms* prev_mp_enhanced) {
    (void)ambe_fr; (void)ambe_d; (void)cur_mp; (void)prev_mp; (void)prev_mp_enhanced;
    return synth(aout_buf, result);
}

int
mbe_processAmbe3600x2450SoftFramef(float* aout_buf, mbe_process_result* result, const mbe_soft_bit ambe_fr[4][24],
                                   char* ambe_d, mbe_parms* cur_mp, mbe_parms* prev_mp, mbe_parms* prev_mp_enhanced) {
    (void)ambe_fr; (void)ambe_d; (void)cur_mp; (void)prev_mp; (void)prev_mp_enhanced;
    return synth(aout_buf, result);
}
