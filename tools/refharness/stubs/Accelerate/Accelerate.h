// Minimal, portable implementation of the Apple vDSP double-precision
// surface that the reference's Decimator uses (decimator.cpp/decimator.h):
// split-complex types, interleave/deinterleave, split-complex move,
// real-coefficient dot product, and FIR-decimation (desamp).
//
// Original harness code; semantics follow Apple's public vDSP
// documentation (the exact pseudo-code for vDSP_zrdesampD is quoted in
// the reference's own comments, decimator.cpp:636-648).
#ifndef PEBBLE_ACCELERATE_STUB_H
#define PEBBLE_ACCELERATE_STUB_H

#include <cstddef>

typedef long vDSP_Stride;
typedef unsigned long vDSP_Length;

struct DSPDoubleComplex {
    double real;
    double imag;
};

struct DSPDoubleSplitComplex {
    double *realp;
    double *imagp;
};

extern "C" {
// Interleaved -> split. C stride IC is counted in doubles (2 = contiguous
// complex elements), per Apple's convention.
void vDSP_ctozD(const DSPDoubleComplex *C, vDSP_Stride IC,
                const DSPDoubleSplitComplex *Z, vDSP_Stride IZ, vDSP_Length N);
// Split -> interleaved.
void vDSP_ztocD(const DSPDoubleSplitComplex *Z, vDSP_Stride IZ,
                DSPDoubleComplex *C, vDSP_Stride IC, vDSP_Length N);
// Split-complex vector move.
void vDSP_zvmovD(const DSPDoubleSplitComplex *A, vDSP_Stride IA,
                 const DSPDoubleSplitComplex *C, vDSP_Stride IC, vDSP_Length N);
// Dot product of split-complex vector with real vector; scalar result in
// C->realp[0] / C->imagp[0].
void vDSP_zrdotprD(const DSPDoubleSplitComplex *A, vDSP_Stride IA,
                   const double *B, vDSP_Stride IB,
                   const DSPDoubleSplitComplex *C, vDSP_Length N);
// FIR filter with decimation: C[n] = sum_p A[n*DF+p] * F[p], n in [0,N).
void vDSP_zrdesampD(const DSPDoubleSplitComplex *A, vDSP_Stride DF,
                    const double *F, const DSPDoubleSplitComplex *C,
                    vDSP_Length N, vDSP_Length P);
}

#endif // PEBBLE_ACCELERATE_STUB_H
