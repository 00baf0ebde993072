// refchain — headless CLI that drives the REFERENCE's own DSP core
// (compiled unmodified from /root/reference) through the same receive
// chain Receiver::processIQData runs (application/receiver.cpp:758-1009):
//
//   narrowband (am/sam/fmn/usb/lsb):
//     Mixer -> Decimator(30 kHz protect) -> accumulate to framesPerBuffer
//     -> decimation-gain restore (receiver.cpp:933-938) -> CFastFIR bandpass
//     -> AGC -> demod subclass (the method Demod::processBlock dispatches
//     to, application/demod.cpp:104-119) -> optional CFractResampler
//   wide FM (fmm/fms):
//     Mixer -> Decimator(200 kHz protect) -> accumulate ->
//     Demod_WFM::processDataMono/Stereo -> optional CFractResampler
//
// Input:  raw interleaved float64 I,Q from --in
// Output: raw interleaved float64 (left,right) demod audio to --out
// This file is original harness code; only the classes it calls are the
// reference's.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "cpx.h"
#include "mixer.h"
#include "decimator.h"
#include "fastfir.h"
#include "fractresampler.h"
#include "agc.h"
#include "demod_am.h"
#include "demod_sam.h"
#include "demod_nfm.h"
#include "demod_wfm.h"
#include "goertzel.h"
#include "noiseblanker.h"
#include "noisefilter.h"
#include "iqbalance.h"

static void die(const char *msg) {
    fprintf(stderr, "refchain: %s\n", msg);
    exit(1);
}

int main(int argc, char **argv) {
    std::string mode = "am", inPath, outPath, rdsPath, prePath;
    double rate = 2048000.0, tune = 0.0, lo = -8000.0, hi = 8000.0;
    double toneFreq = 1000.0;
    int toneN = 512;
    double audioRate = 0.0; // 0 = emit at demod rate (no fractional resample)
    int frames = 2048;
    std::string agcMode = "off";
    int agcThresh = 20;
    int nb1 = 0;  // run the reference NoiseBlanker NB1 (spike blanker)
    int nb2 = 0;  // run the reference NoiseBlanker NB2 (average substitution)
    int anf = 0;  // run the reference NoiseFilter (dttsp LMS adaptive filter)
    int iqbal = 0;                         // run the reference IQBalance
    double iqGain = 1.0, iqPhase = 0.0;    // its static correction factors

    for (int i = 1; i < argc; i++) {
        std::string a = argv[i];
        auto next = [&]() -> const char * {
            if (i + 1 >= argc) die("missing arg value");
            return argv[++i];
        };
        if (a == "--mode") mode = next();
        else if (a == "--rate") rate = atof(next());
        else if (a == "--tune") tune = atof(next());
        else if (a == "--frames") frames = atoi(next());
        else if (a == "--lo") lo = atof(next());
        else if (a == "--hi") hi = atof(next());
        else if (a == "--agc") agcMode = next();
        else if (a == "--agc-thresh") agcThresh = atoi(next());
        else if (a == "--nb1") nb1 = atoi(next());
        else if (a == "--nb2") nb2 = atoi(next());
        else if (a == "--anf") anf = atoi(next());
        else if (a == "--iqbal-gain") { iqbal = 1; iqGain = atof(next()); }
        else if (a == "--iqbal-phase") { iqbal = 1; iqPhase = atof(next()); }
        else if (a == "--audio-rate") audioRate = atof(next());
        else if (a == "--in") inPath = next();
        else if (a == "--out") outPath = next();
        else if (a == "--rds-out") rdsPath = next();
        else if (a == "--predemod-out") prePath = next();
        else if (a == "--tone-freq") toneFreq = atof(next());
        else if (a == "--tone-n") toneN = atoi(next());
        else die(("unknown arg: " + a).c_str());
    }
    if (inPath.empty() || outPath.empty()) die("--in and --out required");

    FILE *fin = fopen(inPath.c_str(), "rb");
    if (!fin) die("cannot open --in");
    FILE *fout = fopen(outPath.c_str(), "wb");
    if (!fout) die("cannot open --out");

    if (mode == "tone") {
        // Reference Goertzel tone detector (pebblelib/goertzel.cpp
        // Goertzel::setFreq/processSample): real audio in the I lane of
        // the f64 stream; one power per N samples out.
        Goertzel g;
        g.setFreq((qint32)toneFreq, (quint32)toneN, (quint32)rate);
        double v[2];
        while (fread(v, sizeof(double), 2, fin) == 2) {
            if (g.processSample(v[0])) {
                double p = g.m_power;
                fwrite(&p, sizeof(double), 1, fout);
            }
        }
        fclose(fin);
        fclose(fout);
        return 0;
    }

    const bool isWfm = (mode == "fmm" || mode == "fms");
    const quint32 protectBw = isWfm ? 200000 : 30000;

    Decimator decim((quint32)rate, (quint32)frames);
    double demodRate = decim.buildDecimationChain((quint32)rate, protectBw);
    fprintf(stderr, "refchain: demodRate=%f decBy2Stages=%u\n", demodRate,
            decim.decBy2Stages());

    Mixer mixer((quint32)rate, (quint32)frames);
    mixer.setFrequency(tune);

    // Device-rate blankers, pre-mixer like receiver.cpp:822-823 (the
    // receiver always calls both; disabled passes are identity)
    NoiseBlanker nb((quint32)rate, (quint32)frames);
    if (nb1) nb.setNbEnabled(true);
    if (nb2) nb.setNb2Enabled(true);

    // Device-rate IQ balance, before the blankers (receiver.cpp:819):
    // static gain/phase correction + the dttsp N4HY adaptive recurrence
    IQBalance iqb((quint32)rate, (quint32)frames);
    if (iqbal) {
        iqb.enableStep(true);
        iqb.setAutomatic(false);
        iqb.setGainFactor(iqGain);
        iqb.setPhaseFactor(iqPhase);
    }

    // Demod-rate ANF between bandpass and AGC (receiver.cpp:974)
    NoiseFilter nf((quint32)demodRate, (quint32)frames);
    if (anf) nf.enableStep(true);

    CFastFIR bp;
    bp.SetupParameters(lo, hi, 0, demodRate);

    AGC agc((quint32)demodRate, (quint32)frames);
    AGC::AgcMode am = AGC::AGC_OFF;
    if (agcMode == "fast") am = AGC::ACG_FAST;
    else if (agcMode == "med") am = AGC::AGC_MED;
    else if (agcMode == "slow") am = AGC::AGC_SLOW;
    else if (agcMode == "long") am = AGC::AGC_LONG;
    agc.setAgcMode(am, agcThresh);

    Demod_AM demodAm((int)demodRate, frames);
    demodAm.setBandwidth(hi - lo); // Receiver::filterChanged (receiver.cpp:663)
    Demod_SAM demodSam((int)demodRate, frames);
    Demod_NFM demodNfm((int)demodRate, frames);
    Demod_WFM demodWfm((int)demodRate, frames);

    CFractResampler resamp;
    resamp.Init(frames);

    std::vector<CPX> inBuf(frames), workBuf(frames), sampleBuf(2 * frames),
        demodOut(2 * frames), audioBuf(4 * frames);
    quint32 sampleBufLen = 0;
    std::vector<double> raw(2 * frames);

    FILE *frds = rdsPath.empty() ? nullptr : fopen(rdsPath.c_str(), "wb");
    FILE *fpre = prePath.empty() ? nullptr : fopen(prePath.c_str(), "wb");

    while (fread(raw.data(), sizeof(double), 2 * frames, fin) ==
           (size_t)(2 * frames)) {
        for (int i = 0; i < frames; i++) {
            inBuf[i].real(raw[2 * i]);
            inBuf[i].imag(raw[2 * i + 1]);
        }
        CPX *nextStep = inBuf.data();
        if (iqbal) nextStep = iqb.ProcessBlock(nextStep);
        if (nb1) nextStep = nb.ProcessBlock(nextStep);
        if (nb2) nextStep = nb.ProcessBlock2(nextStep);
        nextStep = mixer.processBlock(nextStep);
        quint32 n = decim.process(nextStep, workBuf.data(), frames);
        for (quint32 i = 0; i < n; i++)
            sampleBuf[sampleBufLen++] = workBuf[i];
        if (sampleBufLen < (quint32)frames)
            continue;
        sampleBufLen = 0;
        quint32 numStepSamples = frames;
        nextStep = sampleBuf.data();

        if (isWfm) {
            int outN;
            if (mode == "fms")
                outN = demodWfm.processDataStereo(numStepSamples, nextStep,
                                                  demodOut.data());
            else
                outN = demodWfm.processDataMono(numStepSamples, nextStep,
                                                demodOut.data());
            if (frds) {
                tRDS_GROUPS g;
                while (demodWfm.getNextRdsGroupData(&g)) {
                    quint16 blocks[4] = {g.BlockA, g.BlockB, g.BlockC,
                                         g.BlockD};
                    fwrite(blocks, sizeof(quint16), 4, frds);
                }
            }
            numStepSamples = (quint32)outN;
        } else {
            // Restore gain lost in decimation, 2 dB per /2 stage
            // (receiver.cpp:933-938)
            scaleCPX(nextStep, nextStep,
                     DB::dBToAmplitude(decim.decBy2Stages() * 2),
                     numStepSamples);
            int bpN = bp.ProcessData(numStepSamples, nextStep, workBuf.data());
            nextStep = workBuf.data();
            numStepSamples = (quint32)bpN;
            if (anf) nextStep = nf.ProcessBlock(nextStep);
            nextStep = agc.processBlock(nextStep);
            if (fpre)
                for (quint32 i = 0; i < numStepSamples; i++) {
                    double v[2] = {nextStep[i].real(), nextStep[i].imag()};
                    fwrite(v, sizeof(double), 2, fpre);
                }
            if (mode == "am")
                demodAm.processBlockFiltered(nextStep, demodOut.data(),
                                             numStepSamples);
            else if (mode == "sam")
                demodSam.processBlock(nextStep, demodOut.data(),
                                      numStepSamples);
            else if (mode == "fmn")
                demodNfm.processBlockNCO(nextStep, demodOut.data(),
                                         numStepSamples);
            else if (mode == "usb" || mode == "lsb") {
                // Demod::simpleUSB/simpleLSB equivalents
                // (application/demod.cpp): audio = re +/- im.
                for (quint32 i = 0; i < numStepSamples; i++) {
                    double v = (mode == "usb")
                                   ? nextStep[i].real() + nextStep[i].imag()
                                   : nextStep[i].real() - nextStep[i].imag();
                    demodOut[i].real(v);
                    demodOut[i].imag(v);
                }
            } else if (mode == "dsb") {
                // Demod::processBlock default case (demod.cpp:135-138):
                // DSB/DIGx/NONE pass the bandpassed IQ through undemodulated.
                for (quint32 i = 0; i < numStepSamples; i++)
                    demodOut[i] = nextStep[i];
            } else {
                die("unknown --mode");
            }
        }

        CPX *audio = demodOut.data();
        quint32 audioN = numStepSamples;
        if (audioRate > 0.0) {
            double resampRate = demodRate / audioRate;
            audioN = resamp.Resample((int)numStepSamples, resampRate,
                                     demodOut.data(), audioBuf.data());
            audio = audioBuf.data();
        }
        for (quint32 i = 0; i < audioN; i++) {
            double lr[2] = {audio[i].real(), audio[i].imag()};
            fwrite(lr, sizeof(double), 2, fout);
        }
    }

    if (frds) fclose(frds);
    if (fpre) fclose(fpre);
    fclose(fin);
    fclose(fout);
    return 0;
}
