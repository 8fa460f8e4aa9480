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
#include <thread>
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

// ---------------------------------------------------------- h264 i_pcm ----
// Native fast path for the in-repo lossless H.264 I_PCM encoder
// (io/h264_pcm.py — the always-available backend of the relay's encoder
// boundary, standing in for the reference's omxh264enc at
// OpenCVequalHist.cpp:308-332).  The per-frame work is pure byte
// assembly: macroblock sample fill (edge-replicated to the 16-px grid)
// and the §7.4.1.1 emulation-prevention escape scan over ~1.5x the frame
// size.  Python/numpy pays ~45 ms per 4K frame for this; here it is a
// strided memcpy pass plus a memchr-accelerated sequential state machine,
// GIL-free, and each slice band is independent so real multi-core hosts
// parallelize with std::thread (this container has one core).
//
// Bitstream layout is produced by the PYTHON side (slice heads with
// ue-coded first_mb_in_slice etc. are a few bytes and stay in the tested
// _BitWriter); C++ gets the head bytes verbatim and owns only the hot
// loop.  Output is REQUIRED to be byte-identical to the Python encoder —
// tests/test_native_pcm.py diffs the two paths across geometries.

namespace {

// Streaming emulation prevention (ITU-T H.264 §7.4.1.1): insert 0x03
// after any 00 00 pair followed by a byte <= 3.  State (the pending
// zero count, always 0..2) carries across feed() chunks, so the band is
// escaped in ONE pass while it is generated — no full-size unescaped
// scratch, half the memory traffic of a fill-then-escape design.
// memchr skips the (typical) long nonzero spans.
struct EscState {
    uint8_t* dst;
    size_t o = 0;
    int zeros = 0;

    explicit EscState(uint8_t* d) : dst(d) {}

    void feed(const uint8_t* src, size_t n) {
        size_t i = 0;
        while (i < n) {
            uint8_t b = src[i];
            if (zeros == 2 && b <= 3) {
                dst[o++] = 3;
                zeros = 0;
            }
            if (b != 0) {
                const uint8_t* z = static_cast<const uint8_t*>(
                    memchr(src + i, 0, n - i));
                size_t end = z ? size_t(z - src) : n;
                std::memcpy(dst + o, src + i, end - i);
                o += end - i;
                zeros = 0;
                i = end;
            } else {
                dst[o++] = 0;
                ++zeros;
                ++i;
            }
        }
    }
};

// Generate-and-escape one slice band: [head][MB ...] where every
// macroblock is [0x0D 0x00 prefix][256 luma][64 Cb][64 Cr], the FIRST
// MB's prefix/alignment living inside the head, and a trailing 0x80 —
// the exact byte stream of h264_pcm.encode_frame_pcm_slices, escaped on
// the fly.  Each MB is staged in an L1-resident 384-byte buffer
// (interior MBs take fixed-size copy loops; frame-edge MBs go through
// the clamped edge-replication path).
void pcm_encode_band(const uint8_t* nv12, size_t width, size_t height,
                     size_t mb_row0, size_t mb_rows, size_t mb_w,
                     const uint8_t* head, size_t head_len, uint8_t* out,
                     uint64_t* len_out) {
    EscState st(out);
    st.feed(head, head_len);
    const size_t half_h = height / 2, half_w = width / 2;
    static const uint8_t kPrefix[2] = {0x0D, 0x00};
    uint8_t buf[384];
    for (size_t r = 0; r < mb_rows; ++r) {
        const size_t row16 = (mb_row0 + r) * 16;
        const size_t row8 = (mb_row0 + r) * 8;
        const bool rows_ok = row16 + 16 <= height;  // => row8+8 <= half_h
        for (size_t c = 0; c < mb_w; ++c) {
            const size_t col0 = c * 16;
            if (rows_ok && col0 + 16 <= width) {
                const uint8_t* s = nv12 + row16 * width + col0;
                for (size_t y = 0; y < 16; ++y)
                    std::memcpy(buf + y * 16, s + y * width, 16);
                const uint8_t* u = nv12 + (height + row8) * width + col0;
                for (size_t y = 0; y < 8; ++y) {
                    const uint8_t* row = u + y * width;
                    for (size_t x = 0; x < 8; ++x) {
                        buf[256 + y * 8 + x] = row[2 * x];
                        buf[320 + y * 8 + x] = row[2 * x + 1];
                    }
                }
            } else {
                // frame edge: replicate the last row/column to the grid
                size_t avail = width - col0;  // col0 < width always
                if (avail > 16) avail = 16;
                for (size_t y = 0; y < 16; ++y) {
                    size_t srow = row16 + y;
                    if (srow >= height) srow = height - 1;
                    const uint8_t* s = nv12 + srow * width + col0;
                    std::memcpy(buf + y * 16, s, avail);
                    for (size_t x = avail; x < 16; ++x)
                        buf[y * 16 + x] = s[avail - 1];
                }
                for (size_t y = 0; y < 8; ++y) {
                    size_t srow = row8 + y;
                    if (srow >= half_h) srow = half_h - 1;
                    const uint8_t* s = nv12 + (height + srow) * width;
                    for (size_t x = 0; x < 8; ++x) {
                        size_t cx = c * 8 + x;
                        if (cx >= half_w) cx = half_w - 1;
                        buf[256 + y * 8 + x] = s[2 * cx];
                        buf[320 + y * 8 + x] = s[2 * cx + 1];
                    }
                }
            }
            if (r != 0 || c != 0) st.feed(kPrefix, 2);
            st.feed(buf, 384);
        }
    }
    const uint8_t tail = 0x80;  // rbsp_slice_trailing_bits
    st.feed(&tail, 1);
    *len_out = st.o;
}

}  // namespace

// Encode one NV12 frame as `nslices` I_PCM IDR slice NALs (no start
// codes).  heads_blob holds the nslices pre-built slice heads
// back-to-back (lengths in head_lens); row_bounds has nslices+1 MB-row
// boundaries.  Slice i is written at out + i*slice_stride, its length in
// out_lens[i].  threads > 1 runs slice bands on std::threads (each band
// is fully independent).  Returns 0, or -1 on bad args / a slice
// exceeding slice_stride (caller sizes stride to the 1.5x escape bound).
extern "C" int64_t fp_pcm_encode(const uint8_t* nv12, uint64_t width,
                                 uint64_t height, const uint8_t* heads_blob,
                                 const uint64_t* head_lens,
                                 const uint64_t* row_bounds,
                                 uint64_t nslices, int threads, uint8_t* out,
                                 uint64_t slice_stride, uint64_t* out_lens) {
    if (width == 0 || height == 0 || (width & 1) || (height & 1) ||
        nslices == 0)
        return -1;
    const size_t mb_w = (width + 15) / 16;
    std::vector<const uint8_t*> heads(nslices);
    {
        const uint8_t* p = heads_blob;
        for (uint64_t i = 0; i < nslices; ++i) {
            heads[i] = p;
            p += head_lens[i];
        }
    }
    std::atomic<int> failed{0};
    auto one = [&](uint64_t i) {
        size_t r0 = row_bounds[i], r1 = row_bounds[i + 1];
        size_t band = (r1 - r0) * mb_w;
        size_t head_len = head_lens[i];
        size_t raw = head_len - 2 + band * 386 + 1;
        if ((raw + 1) / 2 * 3 > slice_stride) {  // 1.5x escape worst case
            failed.store(1, std::memory_order_relaxed);
            return;
        }
        pcm_encode_band(nv12, width, height, r0, r1 - r0, mb_w, heads[i],
                        head_len, out + i * slice_stride, &out_lens[i]);
    };
    if (threads > 1 && nslices > 1) {
        std::vector<std::thread> pool;
        std::atomic<uint64_t> next{0};
        unsigned n_workers =
            std::min<uint64_t>(nslices, uint64_t(threads));
        for (unsigned w = 0; w < n_workers; ++w)
            pool.emplace_back([&] {
                for (uint64_t i = next.fetch_add(1); i < nslices;
                     i = next.fetch_add(1))
                    one(i);
            });
        for (auto& t : pool) t.join();
    } else {
        for (uint64_t i = 0; i < nslices; ++i) one(i);
    }
    return failed.load() ? -1 : 0;
}

// Assemble one COMPLETE Annex-B access unit into `out`:
// [prelude][00 00 00 01][slice0][00 00 00 01][slice1]... where `prelude`
// is the pre-escaped SPS+PPS block (start codes included) and each slice
// is generated+escaped in place.  This exists because the Python-side
// equivalent (`sc + nal` per slice, join, prepend prelude) costs three
// extra full-size copies — ~15 ms per 4K frame, 5x the encode itself.
// Single-threaded: slices are written back-to-back directly.  threads>1:
// slices land at stride offsets in parallel, then one compaction pass
// closes the gaps (still GIL-free; a real multi-core host wins overall).
// Returns the AU's total byte length, or -1 on bad args / overflow.
extern "C" int64_t fp_pcm_encode_au(
    const uint8_t* nv12, uint64_t width, uint64_t height,
    const uint8_t* prelude, uint64_t prelude_len, const uint8_t* heads_blob,
    const uint64_t* head_lens, const uint64_t* row_bounds, uint64_t nslices,
    int threads, uint8_t* out, uint64_t out_cap) {
    if (width == 0 || height == 0 || (width & 1) || (height & 1) ||
        nslices == 0)
        return -1;
    const size_t mb_w = (width + 15) / 16;
    static const uint8_t kStart[4] = {0, 0, 0, 1};
    std::vector<const uint8_t*> heads(nslices);
    {
        const uint8_t* p = heads_blob;
        for (uint64_t i = 0; i < nslices; ++i) {
            heads[i] = p;
            p += head_lens[i];
        }
    }
    // per-slice worst case (1.5x escape bound) sizes the layout
    std::vector<size_t> cap(nslices);
    size_t need = prelude_len;
    for (uint64_t i = 0; i < nslices; ++i) {
        size_t raw = head_lens[i] - 2 +
                     (row_bounds[i + 1] - row_bounds[i]) * mb_w * 386 + 1;
        cap[i] = 4 + (raw + 1) / 2 * 3;
        need += cap[i];
    }
    if (need > out_cap) return -1;
    std::memcpy(out, prelude, prelude_len);
    if (threads > 1 && nslices > 1) {
        std::vector<size_t> offs(nslices), lens(nslices);
        size_t off = prelude_len;
        for (uint64_t i = 0; i < nslices; ++i) {
            offs[i] = off;
            off += cap[i];
        }
        std::vector<std::thread> pool;
        std::atomic<uint64_t> next{0};
        unsigned n_workers = std::min<uint64_t>(nslices, uint64_t(threads));
        for (unsigned w = 0; w < n_workers; ++w)
            pool.emplace_back([&] {
                for (uint64_t i = next.fetch_add(1); i < nslices;
                     i = next.fetch_add(1)) {
                    uint8_t* dst = out + offs[i];
                    std::memcpy(dst, kStart, 4);
                    uint64_t n = 0;
                    pcm_encode_band(nv12, width, height, row_bounds[i],
                                    row_bounds[i + 1] - row_bounds[i], mb_w,
                                    heads[i], head_lens[i], dst + 4, &n);
                    lens[i] = size_t(n) + 4;
                }
            });
        for (auto& t : pool) t.join();
        size_t o = prelude_len + lens[0];  // slice 0 is already in place
        for (uint64_t i = 1; i < nslices; ++i) {
            std::memmove(out + o, out + offs[i], lens[i]);
            o += lens[i];
        }
        return int64_t(o);
    }
    size_t o = prelude_len;
    for (uint64_t i = 0; i < nslices; ++i) {
        std::memcpy(out + o, kStart, 4);
        uint64_t n = 0;
        pcm_encode_band(nv12, width, height, row_bounds[i],
                        row_bounds[i + 1] - row_bounds[i], mb_w, heads[i],
                        head_lens[i], out + o + 4, &n);
        o += size_t(n) + 4;
    }
    return int64_t(o);
}

