/* Minimal libsndfile ABI stub for the oracle build (WAV writing replaced
 * by no-ops).  Test tooling only; never shipped. */
#ifndef SNDFILE_STUB_H
#define SNDFILE_STUB_H

#include <stdint.h>
#include <stdio.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int64_t sf_count_t;
typedef struct SNDFILE_tag SNDFILE;

typedef struct {
    sf_count_t frames;
    int samplerate;
    int channels;
    int format;
    int sections;
    int seekable;
} SF_INFO;

enum {
    SFM_READ = 0x10,
    SFM_WRITE = 0x20,
    SFM_RDWR = 0x30,
};

#define SF_FORMAT_WAV      0x010000
#define SF_FORMAT_AU       0x020000
#define SF_FORMAT_RAW      0x040000
#define SF_FORMAT_PCM_S8   0x0001
#define SF_FORMAT_PCM_16   0x0002
#define SF_FORMAT_PCM_24   0x0003
#define SF_FORMAT_PCM_32   0x0004
#define SF_FORMAT_PCM_U8   0x0005
#define SF_FORMAT_FLOAT    0x0006
#define SF_FORMAT_SUBMASK  0x0000FFFF
#define SF_FORMAT_TYPEMASK 0x0FFF0000
#define SF_ENDIAN_FILE     0x00000000
#define SF_ENDIAN_LITTLE   0x10000000
#define SF_ENDIAN_BIG      0x20000000
#define SF_ENDIAN_CPU      0x30000000
#define SF_TRUE  1
#define SF_FALSE 0

enum {
    SF_ERR_NO_ERROR = 0,
    SF_ERR_UNRECOGNISED_FORMAT = 1,
    SF_ERR_SYSTEM = 2,
    SF_ERR_MALFORMED_FILE = 3,
    SF_ERR_UNSUPPORTED_ENCODING = 4,
};

SNDFILE* sf_open(const char* path, int mode, SF_INFO* sfinfo);
SNDFILE* sf_open_fd(int fd, int mode, SF_INFO* sfinfo, int close_desc);
int sf_close(SNDFILE* sndfile);
int sf_error(SNDFILE* sndfile);
const char* sf_strerror(SNDFILE* sndfile);
sf_count_t sf_read_short(SNDFILE* sndfile, short* ptr, sf_count_t items);
sf_count_t sf_write_short(SNDFILE* sndfile, const short* ptr, sf_count_t items);
void sf_write_sync(SNDFILE* sndfile);

#ifdef __cplusplus
}
#endif

#endif /* SNDFILE_STUB_H */
