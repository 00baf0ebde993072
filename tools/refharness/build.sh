#!/bin/bash
# Build the headless reference-parity harness: compiles the reference's
# OWN DSP core (read-only, from /root/reference) against the Qt/Accelerate
# stubs in ./stubs, plus the harness CLI (refchain.cpp).
#
# Usage: build.sh [outdir]   (default: ./build)
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF="${PEBBLE_REF:-/root/reference}"
OUT="${1:-$HERE/build}"
mkdir -p "$OUT"

CXX="${CXX:-g++}"
FLAGS="-O2 -std=c++17 -w -fpermissive
  -include $HERE/stubs/qt_stub.h
  -I $HERE/stubs
  -I $REF/pebblelib
  -I $REF/application
  -I $REF/application/demod
  -DGLOBAL_H -DPEBBLELIB_GLOBAL_H -DPEBBLELIBSHARED_EXPORT= -DSIMD=0
  -DUSE_FFTOOURA -DFFTW_H -DFFTACCELERATE_H"

SRCS="
$REF/pebblelib/cpx.cpp
$HERE/db_statics.cpp
$REF/pebblelib/fft.cpp
$REF/pebblelib/fftooura.cpp
$REF/pebblelib/windowfunction.cpp
$REF/pebblelib/fir.cpp
$REF/pebblelib/iir.cpp
$REF/pebblelib/mixer.cpp
$REF/pebblelib/decimator.cpp
$REF/pebblelib/downconvert.cpp
$REF/pebblelib/fastfir.cpp
$REF/pebblelib/fractresampler.cpp
$REF/pebblelib/delayline.cpp
$REF/pebblelib/goertzel.cpp
$REF/pebblelib/movingavgfilter.cpp
$REF/pebblelib/firfilter.cpp
$REF/application/processstep.cpp
$REF/application/noiseblanker.cpp
$REF/application/noisefilter.cpp
$REF/application/iqbalance.cpp
$REF/application/agc.cpp
$REF/application/demod/demod_am.cpp
$REF/application/demod/demod_sam.cpp
$REF/application/demod/demod_nfm.cpp
$REF/application/demod/demod_wfm.cpp
$HERE/vdsp_stub.cpp
$HERE/refchain.cpp
"

OBJS=""
for src in $SRCS; do
  obj="$OUT/$(basename "${src%.*}").o"
  if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ] || [ "$HERE/stubs/qt_stub.h" -nt "$obj" ]; then
    $CXX $FLAGS -c "$src" -o "$obj"
  fi
  OBJS="$OBJS $obj"
done
$CXX $OBJS -o "$OUT/refchain" -lm
echo "built: $OUT/refchain"
