/* libsndfile stub: accepts opens/writes, produces no files. */
#include "sndfile.h"
#include <stdlib.h>

struct SNDFILE_tag {
    int mode;
};

SNDFILE*
sf_open(const char* path, int mode, SF_INFO* sfinfo) {
    (void)path;
    if (sfinfo && mode == SFM_READ) {
        return NULL;  /* no audio-file inputs in oracle runs */
    }
    SNDFILE* s = (SNDFILE*)malloc(sizeof(SNDFILE));
    if (s) s->mode = mode;
    return s;
}

SNDFILE*
sf_open_fd(int fd, int mode, SF_INFO* sfinfo, int close_desc) {
    (void)fd;
    (void)close_desc;
    return sf_open("fd", mode, sfinfo);
}

int
sf_close(SNDFILE* sndfile) {
    free(sndfile);
    return 0;
}

int
sf_error(SNDFILE* sndfile) {
    (void)sndfile;
    return 0;
}

const char*
sf_strerror(SNDFILE* sndfile) {
    (void)sndfile;
    return "sndfile-stub";
}

sf_count_t
sf_read_short(SNDFILE* sndfile, short* ptr, sf_count_t items) {
    (void)sndfile;
    (void)ptr;
    (void)items;
    return 0;
}

sf_count_t
sf_write_short(SNDFILE* sndfile, const short* ptr, sf_count_t items) {
    (void)sndfile;
    (void)ptr;
    return items;
}

void
sf_write_sync(SNDFILE* sndfile) {
    (void)sndfile;
}
