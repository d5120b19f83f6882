#include <openssl/stub_core.h>
