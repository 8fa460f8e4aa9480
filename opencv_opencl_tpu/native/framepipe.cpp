// framepipe.cpp — native frame-transport runtime for the TPU feeder.
//
// The TPU-native counterpart of the reference's C/C++ L2 transport:
// GAsyncQueue + preallocated GstBuffers + the binary-only ProcessedFrame
// resequencer (reference OpenCVequalHist.cpp:71-98, improvement ELF).
// Python-level per-frame work (slicing, memcpy, dict bookkeeping) costs
// real milliseconds at 4K60; these pieces run in C++ with the GIL released
// (ctypes releases it around foreign calls).
//
// Components:
//   fp_ring   — fixed-capacity leaky ring of preallocated frame slots
//               (drop-oldest under overload, like queue leaky=downstream).
//               Producers memcpy into a slot; the feeder assembles a batch
//               into one contiguous staging buffer for device_put.
//   fp_reseq  — out-of-order sequence reorderer with late-drop (the
//               std::map<uint64_t, ProcessedFrame*> of the improvement ELF).
//   nv12 ops  — interleave/deinterleave UV, gray-fill, plane splits.
//
// Build: g++ -O3 -march=native -shared -fPIC framepipe.cpp -o libframepipe.so
// (done automatically by opencv_opencl_tpu.native.build)

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <map>
#include <mutex>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- ring ----

struct FpRingEntry {
    uint64_t seq;
    size_t slot;
    int32_t prio;  // QoS class; overflow evicts the oldest lowest-prio
};

struct FpRing {
    size_t frame_bytes;
    size_t capacity;
    std::vector<uint8_t> storage;          // capacity * frame_bytes
    std::deque<FpRingEntry> queue;
    std::deque<size_t> free_slots;
    std::mutex mu;
    std::condition_variable cv;
    std::atomic<uint64_t> dropped{0};
    std::atomic<uint64_t> pushed{0};
    bool closed = false;
};

FpRing* fp_ring_new(size_t capacity, size_t frame_bytes) {
    auto* r = new FpRing();
    r->frame_bytes = frame_bytes;
    r->capacity = capacity;
    r->storage.resize(capacity * frame_bytes);
    for (size_t i = 0; i < capacity; ++i) r->free_slots.push_back(i);
    return r;
}

void fp_ring_free(FpRing* r) { delete r; }

// Priority-aware push (the QoS serving hook: StreamMux premium streams
// keep the GIL-free staging path).  On overflow the OLDEST entry among
// those with the LOWEST priority is evicted — the PriorityLeakyQueue
// policy, GIL-free; equal priorities degrade to plain drop-oldest.  The
// evicted frame's seq is written to *evicted_seq_out so per-stream drop
// accounting stays attributable (the round-2 FIFO ring could not say
// WHOSE frame it evicted).
// Returns: 0 = queued, no drop; 1 = queued, old frame evicted (seq in
// *evicted_seq_out); 2 = incoming frame itself rejected (ranks below
// everything queued — not copied); -1 = closed.
int fp_ring_push_prio(FpRing* r, const uint8_t* data, uint64_t seq,
                      int32_t prio, uint64_t* evicted_seq_out) {
    size_t slot;
    int rc = 0;
    {
        std::lock_guard<std::mutex> lk(r->mu);
        if (r->closed) return -1;
        if (r->free_slots.empty()) {
            if (r->queue.empty()) {
                // every slot is in flight between producers' memcpy and
                // re-queue (or inside pop_batch): nothing to evict.
                // Reject the incoming frame — reading queue.front() here
                // would be UB on an empty deque.
                r->dropped.fetch_add(1, std::memory_order_relaxed);
                return 2;
            }
            // oldest entry of the lowest priority class (bounded scan:
            // capacity is small by design, like PriorityLeakyQueue)
            size_t idx = 0;
            int32_t pmin = r->queue.front().prio;
            for (size_t i = 1; i < r->queue.size(); ++i) {
                if (r->queue[i].prio < pmin) {
                    pmin = r->queue[i].prio;
                    idx = i;
                }
            }
            r->dropped.fetch_add(1, std::memory_order_relaxed);
            if (pmin <= prio) {
                if (evicted_seq_out) *evicted_seq_out = r->queue[idx].seq;
                slot = r->queue[idx].slot;
                r->queue.erase(r->queue.begin() + idx);
                rc = 1;
            } else {
                return 2;  // incoming ranks below the whole queue
            }
        } else {
            slot = r->free_slots.front();
            r->free_slots.pop_front();
        }
    }
    std::memcpy(&r->storage[slot * r->frame_bytes], data, r->frame_bytes);
    {
        std::lock_guard<std::mutex> lk(r->mu);
        r->queue.push_back({seq, slot, prio});
        r->pushed.fetch_add(1, std::memory_order_relaxed);
    }
    r->cv.notify_one();
    return rc;
}

// Push one frame (memcpy into a slot). Returns 0 when queued with no
// drop, 1 when A frame was dropped (usually the oldest queued one; on a
// ring mixed with higher-priority push_prio frames, or in the transient
// where every slot is in flight, the dropped frame is the INCOMING one),
// -1 if closed.
int fp_ring_push(FpRing* r, const uint8_t* data, uint64_t seq) {
    int rc = fp_ring_push_prio(r, data, seq, 0, nullptr);
    return rc == 2 ? 1 : rc;
}

// Pop up to max_frames frames into the contiguous batch buffer (batch
// assembly for device_put). Blocks up to timeout_ms for the first frame.
// Writes their seqs into seqs_out. Returns the number of frames copied
// (0 on timeout, -1 if closed and drained).
int64_t fp_ring_pop_batch(FpRing* r, uint8_t* batch_out, uint64_t* seqs_out,
                          size_t max_frames, int64_t timeout_ms) {
    std::vector<size_t> slots;
    {
        std::unique_lock<std::mutex> lk(r->mu);
        if (r->queue.empty()) {
            if (r->closed) return -1;
            r->cv.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                           [&] { return !r->queue.empty() || r->closed; });
            if (r->queue.empty()) return r->closed ? -1 : 0;
        }
        size_t n = std::min(max_frames, r->queue.size());
        slots.reserve(n);
        for (size_t i = 0; i < n; ++i) {
            FpRingEntry e = r->queue.front();
            r->queue.pop_front();
            seqs_out[i] = e.seq;
            slots.push_back(e.slot);
        }
    }
    for (size_t i = 0; i < slots.size(); ++i) {
        std::memcpy(batch_out + i * r->frame_bytes,
                    &r->storage[slots[i] * r->frame_bytes], r->frame_bytes);
    }
    {
        std::lock_guard<std::mutex> lk(r->mu);
        for (size_t s : slots) r->free_slots.push_back(s);
    }
    return static_cast<int64_t>(slots.size());
}

int64_t fp_ring_len(FpRing* r) {
    std::lock_guard<std::mutex> lk(r->mu);
    return static_cast<int64_t>(r->queue.size());
}

uint64_t fp_ring_dropped(FpRing* r) { return r->dropped.load(); }

void fp_ring_close(FpRing* r) {
    std::lock_guard<std::mutex> lk(r->mu);
    r->closed = true;
    r->cv.notify_all();
}

// ---------------------------------------------------------- resequencer ----

struct FpReseq {
    std::map<uint64_t, std::vector<uint8_t>> pending;
    uint64_t next_seq = 0;
    size_t max_pending;
    size_t frame_bytes;
    std::atomic<uint64_t> dropped_late{0};
    std::atomic<uint64_t> frames_lost{0};
    std::mutex mu;
};

FpReseq* fp_reseq_new(size_t max_pending, size_t frame_bytes) {
    auto* q = new FpReseq();
    q->max_pending = max_pending;
    q->frame_bytes = frame_bytes;
    return q;
}

void fp_reseq_free(FpReseq* q) { delete q; }

// Push frame with sequence number. Returns number of frames now ready to
// emit in order (fetch with fp_reseq_emit). Late frames are counted+dropped.
int64_t fp_reseq_push(FpReseq* q, uint64_t seq, const uint8_t* data) {
    std::lock_guard<std::mutex> lk(q->mu);
    if (seq < q->next_seq) {
        q->dropped_late.fetch_add(1, std::memory_order_relaxed);
        return 0;
    }
    q->pending.emplace(seq, std::vector<uint8_t>(data, data + q->frame_bytes));
    if (q->pending.size() > q->max_pending) {
        uint64_t oldest = q->pending.begin()->first;
        if (oldest > q->next_seq) {
            q->frames_lost.fetch_add(oldest - q->next_seq,
                                     std::memory_order_relaxed);
            q->next_seq = oldest;
        }
    }
    int64_t ready = 0;
    uint64_t s = q->next_seq;
    for (auto it = q->pending.find(s); it != q->pending.end();
         it = q->pending.find(++s))
        ++ready;
    return ready;
}

// Emit the next in-order frame into out. Returns its seq, or -1 if the next
// frame is not ready.
int64_t fp_reseq_emit(FpReseq* q, uint8_t* out) {
    std::lock_guard<std::mutex> lk(q->mu);
    auto it = q->pending.find(q->next_seq);
    if (it == q->pending.end()) return -1;
    std::memcpy(out, it->second.data(), q->frame_bytes);
    int64_t seq = static_cast<int64_t>(it->first);
    q->pending.erase(it);
    q->next_seq = seq + 1;
    return seq;
}

uint64_t fp_reseq_dropped_late(FpReseq* q) { return q->dropped_late.load(); }
uint64_t fp_reseq_frames_lost(FpReseq* q) { return q->frames_lost.load(); }

int64_t fp_reseq_pending(FpReseq* q) {
    std::lock_guard<std::mutex> lk(q->mu);
    return static_cast<int64_t>(q->pending.size());
}

// ------------------------------------------------------------- nv12 ops ----

// Interleave separate U and V quarter-planes into NV12 UV rows.
void fp_uv_interleave(const uint8_t* u, const uint8_t* v, uint8_t* uv,
                      size_t half_h, size_t half_w) {
    for (size_t r = 0; r < half_h; ++r) {
        const uint8_t* ur = u + r * half_w;
        const uint8_t* vr = v + r * half_w;
        uint8_t* o = uv + r * 2 * half_w;
        for (size_t c = 0; c < half_w; ++c) {
            o[2 * c] = ur[c];
            o[2 * c + 1] = vr[c];
        }
    }
}

void fp_uv_deinterleave(const uint8_t* uv, uint8_t* u, uint8_t* v,
                        size_t half_h, size_t half_w) {
    for (size_t r = 0; r < half_h; ++r) {
        const uint8_t* in = uv + r * 2 * half_w;
        uint8_t* ur = u + r * half_w;
        uint8_t* vr = v + r * half_w;
        for (size_t c = 0; c < half_w; ++c) {
            ur[c] = in[2 * c];
            vr[c] = in[2 * c + 1];
        }
    }
}

// The reference's gray chroma policy: memset(uv, 128, size)
// (OpenCVequalHist.cpp:162).
void fp_uv_gray(uint8_t* uv, size_t bytes) { std::memset(uv, 128, bytes); }

}  // extern "C"

// ---------------------------------------------------------------- rtp ----
// Raw NV12 line packetizer + sender (io/rtp.py RawNv12Payloader wire
// format: 12 B RTP header, 2 B extended seq (0), one 6 B SRD
// (length, line, offset), payload). Python-side per-packet loops cost
// ~10k syscalls+pack calls per 4K frame; here headers are built in an
// arena, payloads ride zero-copy iovecs into sendmmsg batches, GIL-free.
// The reference analogue is udpsink's socket loop (OpenCVequalHist.cpp:316).

#include <sys/socket.h>
#include <sys/uio.h>
#include <netinet/in.h>
#include <arpa/inet.h>

namespace {
inline void put16(uint8_t* p, uint16_t v) {
    p[0] = uint8_t(v >> 8);
    p[1] = uint8_t(v);
}
inline void put32(uint8_t* p, uint32_t v) {
    p[0] = uint8_t(v >> 24);
    p[1] = uint8_t(v >> 16);
    p[2] = uint8_t(v >> 8);
    p[3] = uint8_t(v);
}
}  // namespace

// Generic pre-built-packet batch sender: `data` holds n packets
// back-to-back with lengths in `lens`; sendmmsg in batches of 64,
// GIL-free via ctypes.  Serves every native RTP sink (JPEG/H.26x/raw
// fallback) — the Python per-packet sendto loop costs ~33 ms for a
// 10k-packet 4K PCM access unit; this is one join + a few syscalls.
// Failure encoding matches fp_rtp_send_raw: -(sent+1).
extern "C" int64_t fp_send_packets(int fd, const uint8_t* data,
                                   const uint64_t* lens, uint64_t n,
                                   const char* host, uint16_t port) {
    sockaddr_in dest{};
    dest.sin_family = AF_INET;
    dest.sin_port = htons(port);
    if (inet_pton(AF_INET, host, &dest.sin_addr) != 1) return -1;
    constexpr size_t kBatch = 64;
    mmsghdr msgs[kBatch];
    iovec iovs[kBatch];
    const uint8_t* p = data;
    int64_t sent = 0;
    uint64_t i = 0;
    while (i < n) {
        size_t m = 0;
        for (; m < kBatch && i < n; ++m, ++i) {
            iovs[m] = {const_cast<uint8_t*>(p), size_t(lens[i])};
            msghdr& h = msgs[m].msg_hdr;
            h = msghdr{};
            h.msg_name = &dest;
            h.msg_namelen = sizeof(dest);
            h.msg_iov = &iovs[m];
            h.msg_iovlen = 1;
            msgs[m].msg_len = 0;
            p += lens[i];
        }
        size_t done = 0;
        while (done < m) {
            int r = sendmmsg(fd, msgs + done, unsigned(m - done), 0);
            if (r <= 0) return -(sent + int64_t(done)) - 1;
            done += size_t(r);
        }
        sent += int64_t(m);
    }
    return sent;
}

extern "C" int64_t fp_rtp_send_raw(int fd, const uint8_t* frame,
                                   uint64_t rows, uint64_t width,
                                   uint64_t mtu, uint32_t seq0, uint32_t ts,
                                   uint32_t ssrc, uint8_t pt,
                                   const char* host, uint16_t port) {
    if (mtu <= 20 || rows == 0 || width == 0) return -1;  // = -(0+1): 0 sent
    sockaddr_in dest{};
    dest.sin_family = AF_INET;
    dest.sin_port = htons(port);
    if (inet_pton(AF_INET, host, &dest.sin_addr) != 1) return -1;
    const uint64_t room = mtu - 12 - 2 - 6;
    constexpr size_t kBatch = 64;
    constexpr size_t kHdr = 20;
    uint8_t arena[kBatch * kHdr];
    mmsghdr msgs[kBatch];
    iovec iovs[kBatch][2];
    uint16_t seq = uint16_t(seq0);
    int64_t sent = 0;
    size_t n_in_batch = 0;
    auto flush = [&]() -> bool {
        size_t done = 0;
        while (done < n_in_batch) {
            int r = sendmmsg(fd, msgs + done, unsigned(n_in_batch - done), 0);
            if (r <= 0) {
                sent += int64_t(done);
                return false;
            }
            done += size_t(r);
        }
        sent += int64_t(n_in_batch);
        n_in_batch = 0;
        return true;
    };
    for (uint64_t line = 0; line < rows; ++line) {
        for (uint64_t off = 0; off < width;) {
            uint64_t n = width - off;
            if (n > room) n = room;
            bool marker = (line == rows - 1) && (off + n >= width);
            uint8_t* h = arena + n_in_batch * kHdr;
            h[0] = 0x80;  // v=2
            h[1] = uint8_t((marker ? 0x80 : 0) | (pt & 0x7F));
            put16(h + 2, seq);
            put32(h + 4, ts);
            put32(h + 8, ssrc);
            h[12] = 0; h[13] = 0;                      // extended seq
            put16(h + 14, uint16_t(n));                // SRD length
            put16(h + 16, uint16_t(line));             // SRD line
            put16(h + 18, uint16_t(off));              // SRD offset
            iovs[n_in_batch][0] = {h, kHdr};
            iovs[n_in_batch][1] = {
                const_cast<uint8_t*>(frame + line * width + off), size_t(n)};
            msghdr& m = msgs[n_in_batch].msg_hdr;
            m = msghdr{};
            m.msg_name = &dest;
            m.msg_namelen = sizeof(dest);
            m.msg_iov = iovs[n_in_batch];
            m.msg_iovlen = 2;
            msgs[n_in_batch].msg_len = 0;
            ++n_in_batch;
            seq = uint16_t(seq + 1);
            off += n;
            // failure encoding: -(sent+1) — the caller must advance its
            // RTP sequence by `sent` so no stale seq is ever re-used
            if (n_in_batch == kBatch && !flush()) return -sent - 1;
        }
    }
    if (n_in_batch && !flush()) return -sent - 1;
    return sent;
}

