#!/usr/bin/env bash
# Build the reference decoder as a protocol-output oracle, using local ABI
# stubs for mbelib-neo (silence vocoder) and libsndfile (no-op writer).
# Used only to capture ground-truth decode text for parity tests.
set -euo pipefail

HERE="$(cd "$(dirname "$0")" && pwd)"
REF=${REF:-/root/reference}
WORK=${WORK:-/tmp/dsd-oracle}
PREFIX="$WORK/prefix"

mkdir -p "$WORK"

# 1. mbe-neo stub package
cmake -S "$HERE/mbe-neo-stub" -B "$WORK/mbe-build" -G Ninja \
      -DCMAKE_INSTALL_PREFIX="$PREFIX" -DCMAKE_BUILD_TYPE=Release >/dev/null
cmake --build "$WORK/mbe-build" --target install >/dev/null

# 2. sndfile stub (plain lib + header into the same prefix)
mkdir -p "$PREFIX/include" "$PREFIX/lib"
cp "$HERE/sndfile-stub/sndfile.h" "$PREFIX/include/"
gcc -O2 -fPIC -shared -I"$PREFIX/include" \
    -o "$PREFIX/lib/libsndfile.so" "$HERE/sndfile-stub/sndfile_stub.c"

# 3. openssl stub (headers + libcrypto/libssl into the prefix)
mkdir -p "$PREFIX/include/openssl"
cp "$HERE"/openssl-stub/openssl/*.h "$PREFIX/include/openssl/"
gcc -O2 -fPIC -shared -I"$PREFIX/include" \
    -o "$PREFIX/lib/libcrypto.so" "$HERE/openssl-stub/openssl_stub.c"
cp "$PREFIX/lib/libcrypto.so" "$PREFIX/lib/libssl.so"

# 4. reference decoder
cmake -S "$REF" -B "$WORK/build" -G Ninja \
      -DCMAKE_BUILD_TYPE=Release \
      -DCMAKE_PREFIX_PATH="$PREFIX" \
      -DLIBSNDFILE_INCLUDE_DIR="$PREFIX/include" \
      -DLIBSNDFILE_LIBRARY="$PREFIX/lib/libsndfile.so" \
      -DOPENSSL_ROOT_DIR="$PREFIX" \
      -DOPENSSL_INCLUDE_DIR="$PREFIX/include" \
      -DOPENSSL_CRYPTO_LIBRARY="$PREFIX/lib/libcrypto.so" \
      -DOPENSSL_SSL_LIBRARY="$PREFIX/lib/libssl.so" \
      -DDSD_ENABLE_TERMINAL_UI=OFF \
      -DDSD_ENABLE_RTLSDR=OFF \
      -DDSD_ENABLE_SOAPYSDR=OFF \
      -DDSD_AUDIO_BACKEND=none -DDSD_FORCE_RADIO_PIPELINE=ON \
      -DDSD_WARNINGS_AS_ERRORS=OFF \
      "$@"
cmake --build "$WORK/build" -j"$(nproc)"
echo "oracle binary: $WORK/build/dsd-neo"
