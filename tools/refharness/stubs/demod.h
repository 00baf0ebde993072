// Shadow of the reference's application/demod.h for the headless parity
// harness.  The real demod.h drags in Qt widgets (ui_data-band.h), the
// CRdsDecode UI formatter, and the app Global object; the demod
// *subclasses* (demod_am/sam/nfm/wfm.cpp) only ever touch the base's
// sampleRate/numSamples members (set by the Demod(rate, bufSize) ctor).
// This stub provides exactly that base so the subclasses compile
// unmodified; the harness drives the subclass methods directly, the same
// ones Demod::processBlock dispatches to (application/demod.cpp:104-119).
//
// Original harness code (no reference text).
#ifndef PEBBLE_DEMOD_STUB_H
#define PEBBLE_DEMOD_STUB_H

#include "qt_stub.h"
#include "cpx.h"
#include "db.h"
#include "fir.h"
#include "iir.h"

class Demod {
public:
    Demod(quint32 _sampleRate, quint32 _bufferSize)
        : sampleRate(_sampleRate), numSamples(_bufferSize),
          bufferSize(_bufferSize) {
        out = memalign(_bufferSize);
        enabled = false;
    }
    virtual ~Demod() {
        if (out) free(out);
    }

protected:
    quint32 sampleRate;
    quint32 numSamples;
    quint32 bufferSize;
    CPX *out;
    bool enabled;
};

#endif // PEBBLE_DEMOD_STUB_H
