// Portable implementations of the vDSP subset declared in
// stubs/Accelerate/Accelerate.h.  See that header for provenance.
#include <Accelerate/Accelerate.h>

extern "C" {

void vDSP_ctozD(const DSPDoubleComplex *C, vDSP_Stride IC,
                const DSPDoubleSplitComplex *Z, vDSP_Stride IZ, vDSP_Length N) {
    for (vDSP_Length n = 0; n < N; ++n) {
        Z->realp[n * IZ] = C[n * IC / 2].real;
        Z->imagp[n * IZ] = C[n * IC / 2].imag;
    }
}

void vDSP_ztocD(const DSPDoubleSplitComplex *Z, vDSP_Stride IZ,
                DSPDoubleComplex *C, vDSP_Stride IC, vDSP_Length N) {
    for (vDSP_Length n = 0; n < N; ++n) {
        C[n * IC / 2].real = Z->realp[n * IZ];
        C[n * IC / 2].imag = Z->imagp[n * IZ];
    }
}

void vDSP_zvmovD(const DSPDoubleSplitComplex *A, vDSP_Stride IA,
                 const DSPDoubleSplitComplex *C, vDSP_Stride IC, vDSP_Length N) {
    for (vDSP_Length n = 0; n < N; ++n) {
        C->realp[n * IC] = A->realp[n * IA];
        C->imagp[n * IC] = A->imagp[n * IA];
    }
}

void vDSP_zrdotprD(const DSPDoubleSplitComplex *A, vDSP_Stride IA,
                   const double *B, vDSP_Stride IB,
                   const DSPDoubleSplitComplex *C, vDSP_Length N) {
    double accRe = 0.0, accIm = 0.0;
    for (vDSP_Length n = 0; n < N; ++n) {
        accRe += A->realp[n * IA] * B[n * IB];
        accIm += A->imagp[n * IA] * B[n * IB];
    }
    C->realp[0] = accRe;
    C->imagp[0] = accIm;
}

void vDSP_zrdesampD(const DSPDoubleSplitComplex *A, vDSP_Stride DF,
                    const double *F, const DSPDoubleSplitComplex *C,
                    vDSP_Length N, vDSP_Length P) {
    for (vDSP_Length n = 0; n < N; ++n) {
        double accRe = 0.0, accIm = 0.0;
        const vDSP_Length base = n * (vDSP_Length)DF;
        for (vDSP_Length p = 0; p < P; ++p) {
            accRe += A->realp[base + p] * F[p];
            accIm += A->imagp[base + p] * F[p];
        }
        C->realp[n] = accRe;
        C->imagp[n] = accIm;
    }
}

} // extern "C"
