// Native runtime for pebblesdr_tpu: IQ ring buffer + wire-format decode.
//
// Capability parity with the reference's C++ runtime layer:
//   * ProducerConsumer (pebblelib/producerconsumer.{h,cpp}): N fixed-size
//     buffers cycled between a producer thread (device/socket IO) and a
//     consumer (the DSP chain feeder), free/filled semaphores, overrun
//     accounting.  Here: std::mutex + condition_variable ring exposed
//     through a C ABI for ctypes.
//   * DeviceInterfaceBase::normalizeIQ (pebblelib/deviceinterfacebase.h:
//     105-117) wire formats: interleaved u8/i8/u16/i16/f32 -> deinterleaved
//     float32 re/im planes (the layout the TPU transport wants), with
//     optional I/Q swap — the host-side hot path of the input pipeline.
//
// Build: make -C pebblesdr_tpu/runtime   (-> libpebble_runtime.so)

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

struct Ring {
    size_t n_buffers;
    size_t buf_bytes;
    std::vector<std::vector<uint8_t>> buffers;
    // indices into `buffers`; [tail, head) are filled
    size_t head = 0;   // next write slot
    size_t tail = 0;   // next read slot
    size_t filled = 0;
    uint64_t overruns = 0;
    uint64_t produced = 0;
    uint64_t consumed = 0;
    bool write_held = false;
    bool read_held = false;
    std::mutex mu;
    std::condition_variable cv_free;
    std::condition_variable cv_filled;
};

}  // namespace

extern "C" {

Ring* ring_create(size_t n_buffers, size_t buf_bytes) {
    Ring* r = new Ring();
    r->n_buffers = n_buffers;
    r->buf_bytes = buf_bytes;
    r->buffers.resize(n_buffers);
    for (auto& b : r->buffers) b.resize(buf_bytes);
    return r;
}

void ring_destroy(Ring* r) { delete r; }

// Producer: get a pointer to the next free buffer.  timeout_ms < 0 blocks
// forever; on timeout with drop_oldest != 0, the oldest filled buffer is
// dropped (overrun semantics of the reference's POLL mode) and its slot
// reused.  Returns nullptr on timeout without drop.
void* ring_acquire_write(Ring* r, int timeout_ms, int drop_oldest) {
    std::unique_lock<std::mutex> lk(r->mu);
    auto free_slot = [&] { return r->filled < r->n_buffers && !r->write_held; };
    if (timeout_ms < 0) {
        r->cv_free.wait(lk, free_slot);
    } else if (!r->cv_free.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                                    free_slot)) {
        if (!drop_oldest || r->read_held) return nullptr;
        // drop oldest filled
        r->tail = (r->tail + 1) % r->n_buffers;
        r->filled--;
        r->overruns++;
    }
    r->write_held = true;
    return r->buffers[r->head].data();
}

void ring_commit_write(Ring* r) {
    std::lock_guard<std::mutex> lk(r->mu);
    if (!r->write_held) return;
    r->write_held = false;
    r->head = (r->head + 1) % r->n_buffers;
    r->filled++;
    r->produced++;
    r->cv_filled.notify_one();
}

void* ring_acquire_read(Ring* r, int timeout_ms) {
    std::unique_lock<std::mutex> lk(r->mu);
    auto have = [&] { return r->filled > 0 && !r->read_held; };
    if (timeout_ms < 0) {
        r->cv_filled.wait(lk, have);
    } else if (!r->cv_filled.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                                      have)) {
        return nullptr;
    }
    r->read_held = true;
    return r->buffers[r->tail].data();
}

void ring_release_read(Ring* r) {
    std::lock_guard<std::mutex> lk(r->mu);
    if (!r->read_held) return;
    r->read_held = false;
    r->tail = (r->tail + 1) % r->n_buffers;
    r->filled--;
    r->consumed++;
    r->cv_free.notify_one();
}

size_t ring_filled(Ring* r) {
    std::lock_guard<std::mutex> lk(r->mu);
    return r->filled;
}

uint64_t ring_overruns(Ring* r) {
    std::lock_guard<std::mutex> lk(r->mu);
    return r->overruns;
}

// ---------------------------------------------------------------- decode
// Interleaved wire formats -> deinterleaved float32 re/im planes.
// n = number of complex samples.  swap_iq exchanges the I/Q order.

#define DECODE_LOOP(READ_I, READ_Q)            \
    if (swap_iq) {                             \
        for (size_t k = 0; k < n; ++k) {       \
            re[k] = (READ_Q);                  \
            im[k] = (READ_I);                  \
        }                                      \
    } else {                                   \
        for (size_t k = 0; k < n; ++k) {       \
            re[k] = (READ_I);                  \
            im[k] = (READ_Q);                  \
        }                                      \
    }

void decode_u8(const uint8_t* in, size_t n, float* re, float* im, int swap_iq) {
    constexpr float s = 1.0f / 128.0f;
    DECODE_LOOP((in[2 * k] - 128.0f) * s, (in[2 * k + 1] - 128.0f) * s)
}

void decode_i8(const int8_t* in, size_t n, float* re, float* im, int swap_iq) {
    constexpr float s = 1.0f / 128.0f;
    DECODE_LOOP(in[2 * k] * s, in[2 * k + 1] * s)
}

void decode_i16(const int16_t* in, size_t n, float* re, float* im, int swap_iq) {
    constexpr float s = 1.0f / 32768.0f;
    DECODE_LOOP(in[2 * k] * s, in[2 * k + 1] * s)
}

void decode_u16(const uint16_t* in, size_t n, float* re, float* im, int swap_iq) {
    constexpr float s = 1.0f / 32768.0f;
    DECODE_LOOP((in[2 * k] - 32768.0f) * s, (in[2 * k + 1] - 32768.0f) * s)
}

void decode_f32(const float* in, size_t n, float* re, float* im, int swap_iq) {
    DECODE_LOOP(in[2 * k], in[2 * k + 1])
}

// Audio encode: float32 [-1,1] mono/stereo planes -> interleaved int16 PCM.
void encode_pcm16(const float* const* chans, size_t n_chan, size_t n,
                  int16_t* out) {
    for (size_t k = 0; k < n; ++k) {
        for (size_t c = 0; c < n_chan; ++c) {
            float v = chans[c][k] * 32767.0f;
            if (v > 32767.0f) v = 32767.0f;
            if (v < -32768.0f) v = -32768.0f;
            out[k * n_chan + c] = (int16_t)(v >= 0 ? v + 0.5f : v - 0.5f);
        }
    }
}

}  // extern "C"
