// knaster_rt: native realtime support for knaster_tpu.
//
// TPU-native counterpart of the reference's lock-free control<->audio thread
// machinery (rtrb SPSC rings, knaster_graph/src/graph.rs:225-231, and the
// CPAL/JACK callback plumbing in audio_backend/). The device renders blocks
// ahead of time; this ring decouples the Python render thread (producer)
// from a realtime audio consumer (callback / device thread) with no locks on
// the consumer side, and tracks under/overruns like a real audio backend.
//
// Single-producer single-consumer; wait-free on both sides.
//
// Build: make (g++ -O2 -shared -fPIC).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <new>

namespace {

struct RingBuf {
    float *data;                 // capacity_frames * channels interleaved
    uint32_t capacity_frames;    // power-of-two rounded
    uint32_t mask;
    uint32_t channels;
    alignas(64) std::atomic<uint64_t> head;  // write position (frames)
    alignas(64) std::atomic<uint64_t> tail;  // read position (frames)
    alignas(64) std::atomic<uint64_t> underruns;
    std::atomic<uint64_t> overruns;
    std::atomic<uint64_t> frames_written;
    std::atomic<uint64_t> frames_read;
};

static uint32_t round_pow2(uint32_t x) {
    uint32_t p = 1;
    while (p < x) p <<= 1;
    return p;
}

}  // namespace

extern "C" {

RingBuf *kn_ring_new(uint32_t capacity_frames, uint32_t channels) {
    if (channels == 0 || capacity_frames == 0) return nullptr;
    auto *rb = new (std::nothrow) RingBuf();
    if (!rb) return nullptr;
    rb->capacity_frames = round_pow2(capacity_frames);
    rb->mask = rb->capacity_frames - 1;
    rb->channels = channels;
    rb->data = new (std::nothrow) float[(size_t)rb->capacity_frames * channels]();
    if (!rb->data) {
        delete rb;
        return nullptr;
    }
    rb->head.store(0);
    rb->tail.store(0);
    rb->underruns.store(0);
    rb->overruns.store(0);
    rb->frames_written.store(0);
    rb->frames_read.store(0);
    return rb;
}

void kn_ring_destroy(RingBuf *rb) {
    if (!rb) return;
    delete[] rb->data;
    delete rb;
}

uint32_t kn_ring_capacity(const RingBuf *rb) { return rb->capacity_frames; }
uint32_t kn_ring_channels(const RingBuf *rb) { return rb->channels; }

uint32_t kn_ring_available_read(const RingBuf *rb) {
    uint64_t h = rb->head.load(std::memory_order_acquire);
    uint64_t t = rb->tail.load(std::memory_order_acquire);
    return (uint32_t)(h - t);
}

uint32_t kn_ring_available_write(const RingBuf *rb) {
    uint64_t h = rb->head.load(std::memory_order_acquire);
    uint64_t t = rb->tail.load(std::memory_order_acquire);
    return rb->capacity_frames - (uint32_t)(h - t);
}

// Producer side: write interleaved frames. Returns frames actually written
// (0..frames). Never blocks; on full ring, counts an overrun.
uint32_t kn_ring_write(RingBuf *rb, const float *interleaved, uint32_t frames) {
    uint64_t h = rb->head.load(std::memory_order_relaxed);
    uint64_t t = rb->tail.load(std::memory_order_acquire);
    uint32_t free_frames = rb->capacity_frames - (uint32_t)(h - t);
    uint32_t n = frames < free_frames ? frames : free_frames;
    if (n < frames) rb->overruns.fetch_add(1, std::memory_order_relaxed);
    const uint32_t ch = rb->channels;
    for (uint32_t i = 0; i < n; ++i) {
        uint32_t slot = (uint32_t)((h + i) & rb->mask);
        std::memcpy(rb->data + (size_t)slot * ch, interleaved + (size_t)i * ch,
                    ch * sizeof(float));
    }
    rb->head.store(h + n, std::memory_order_release);
    rb->frames_written.fetch_add(n, std::memory_order_relaxed);
    return n;
}

// Consumer side: read interleaved frames. Missing frames are zero-filled and
// counted as an underrun (realtime callbacks must always fill the buffer).
uint32_t kn_ring_read(RingBuf *rb, float *out, uint32_t frames) {
    uint64_t t = rb->tail.load(std::memory_order_relaxed);
    uint64_t h = rb->head.load(std::memory_order_acquire);
    uint32_t avail = (uint32_t)(h - t);
    uint32_t n = frames < avail ? frames : avail;
    const uint32_t ch = rb->channels;
    for (uint32_t i = 0; i < n; ++i) {
        uint32_t slot = (uint32_t)((t + i) & rb->mask);
        std::memcpy(out + (size_t)i * ch, rb->data + (size_t)slot * ch,
                    ch * sizeof(float));
    }
    if (n < frames) {
        std::memset(out + (size_t)n * ch, 0, (size_t)(frames - n) * ch * sizeof(float));
        rb->underruns.fetch_add(1, std::memory_order_relaxed);
    }
    rb->tail.store(t + n, std::memory_order_release);
    rb->frames_read.fetch_add(n, std::memory_order_relaxed);
    return n;
}

uint64_t kn_ring_underruns(const RingBuf *rb) {
    return rb->underruns.load(std::memory_order_relaxed);
}
uint64_t kn_ring_overruns(const RingBuf *rb) {
    return rb->overruns.load(std::memory_order_relaxed);
}
uint64_t kn_ring_frames_written(const RingBuf *rb) {
    return rb->frames_written.load(std::memory_order_relaxed);
}
uint64_t kn_ring_frames_read(const RingBuf *rb) {
    return rb->frames_read.load(std::memory_order_relaxed);
}

}  // extern "C"
