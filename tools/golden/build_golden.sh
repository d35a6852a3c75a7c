#!/bin/sh
# Build the reference's GPU-independent Tier 0 with plain gcc (no meson
# in this image) and dump golden vectors. Regenerate with:
#   sh tools/golden/build_golden.sh [/path/to/reference]
# Writes tests/golden/reference_golden.npz.
set -e
REF=${1:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(cd "$HERE/../.." && pwd)
BUILD=$(mktemp -d)
trap 'rm -rf "$BUILD"' EXIT

mkdir -p "$BUILD/include/libplacebo"

# generate config.h (meson configure_file analog); version from meson.build
MAJOR=$(sed -n "s/.*version:[^']*'\([0-9]*\)\..*/\1/p" "$REF/meson.build" | head -1)
API=$(grep -o "version:[^,]*" "$REF/meson.build" | head -1 | cut -d. -f2)
sed -e "s/@majorver@/${MAJOR:-7}/" \
    -e "s/@apiver@/${API:-365}/" \
    -e "s/@extra_defs@//" \
    "$REF/src/include/libplacebo/config.h.in" \
    > "$BUILD/include/libplacebo/config.h"

cat > "$BUILD/config_internal.h" <<EOF
#pragma once
#define BUILD_API_VER ${API:-365}
#define BUILD_FIX_VER 0
#undef PL_DEBUG_ABORT
#undef PL_HAVE_DBGHELP
#undef PL_HAVE_UNWIND
#undef PL_HAVE_EXECINFO
EOF

# pl_fix_ver/pl_version live in generated version.h + common.c shims
cat > "$BUILD/version.h" <<EOF
#define BUILD_VERSION "golden"
EOF

CFLAGS="-O2 -std=gnu11 -D_GNU_SOURCE -DPL_HAVE_PTHREAD -pthread -I$BUILD -I$REF/src -I$REF/src/include -I$BUILD/include -fno-fast-math"
SRCS="$REF/src/tone_mapping.c $REF/src/filters.c $REF/src/gamut_mapping.c \
      $REF/src/colorspace.c $REF/src/dither.c $REF/src/common.c \
      $REF/src/pl_alloc.c $REF/src/pl_string.c $REF/src/log.c $REF/src/format.c"

# convert.cc is C++20 (float<->string via std::to_chars)
g++ -O2 -std=c++20 -D_GNU_SOURCE -DPL_HAVE_PTHREAD -I"$BUILD" \
    -I"$REF/src" -I"$REF/src/include" -I"$BUILD/include" \
    -c "$REF/src/convert.cc" -o "$BUILD/convert.o"
gcc $CFLAGS "$HERE/dump_golden.c" $SRCS "$BUILD/convert.o" -lm -lstdc++ \
    -o "$BUILD/dump_golden"
"$BUILD/dump_golden" "$BUILD/golden.bin"

# Film-grain synthesis dumpers: each #includes the reference shader .c
# to reach its static CPU-side generators; -ffunction-sections +
# --gc-sections discards the uncalled shader-machinery functions before
# their GPU symbols would need resolving.
GCSEC="-ffunction-sections -fdata-sections -Wl,--gc-sections"
for fam in av1 h274; do
    gcc $CFLAGS $GCSEC "$HERE/dump_grain_$fam.c" $SRCS "$BUILD/convert.o" \
        -lm -lstdc++ -o "$BUILD/dump_grain_$fam"
    "$BUILD/dump_grain_$fam" "$BUILD/grain_$fam.bin"
    cat "$BUILD/grain_$fam.bin" >> "$BUILD/golden.bin"
done

python3 "$HERE/convert_golden.py" "$BUILD/golden.bin" \
    "$REPO/tests/golden/reference_golden.npz"
echo "wrote $REPO/tests/golden/reference_golden.npz"
