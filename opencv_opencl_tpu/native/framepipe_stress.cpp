// framepipe_stress.cpp — sanitizer stress harness for the native runtime.
//
// The reference had no race detection (SURVEY §5); this harness runs the
// ring + resequencer under heavy multi-producer/consumer contention and is
// built with -fsanitize=thread by native/build_stress.sh, making the
// native transport's thread-safety machine-checked rather than asserted.
//
// Exit code 0 = all invariants held (TSAN reports races on stderr and
// returns non-zero via halt_on_error).

#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <set>
#include <thread>
#include <vector>

#include "framepipe.cpp"  // single-TU build: the library is header-free

static constexpr size_t FRAME = 4096;
static constexpr int PRODUCERS = 4;
static constexpr int PER_PRODUCER = 2000;

int main() {
    FpRing* ring = fp_ring_new(32, FRAME);
    FpReseq* rs = fp_reseq_new(16, FRAME);
    std::atomic<bool> done{false};
    std::atomic<uint64_t> consumed{0};

    auto producer = [&](int pid) {
        std::vector<uint8_t> frame(FRAME);
        for (int i = 0; i < PER_PRODUCER; ++i) {
            std::memset(frame.data(), (pid * 37 + i) & 0xff, FRAME);
            fp_ring_push(ring, frame.data(), (uint64_t)pid * 1000000 + i);
        }
    };

    std::thread consumer([&] {
        std::vector<uint8_t> batch(8 * FRAME);
        std::vector<uint64_t> seqs(8);
        std::vector<uint8_t> out(FRAME);
        std::set<uint64_t> seen;
        uint64_t emit_seq = 0;
        while (true) {
            int64_t n = fp_ring_pop_batch(ring, batch.data(), seqs.data(), 8,
                                          10);
            if (n < 0) break;
            if (n == 0) {
                if (done.load()) {
                    // drain whatever remains then exit via closed ring
                    fp_ring_close(ring);
                }
                continue;
            }
            for (int64_t i = 0; i < n; ++i) {
                if (!seen.insert(seqs[i]).second) {
                    std::fprintf(stderr, "DUPLICATE seq %llu\n",
                                 (unsigned long long)seqs[i]);
                    std::exit(2);
                }
                // exercise the resequencer with a dense remapped sequence
                fp_reseq_push(rs, emit_seq++, batch.data() + i * FRAME);
                while (fp_reseq_emit(rs, out.data()) >= 0) {
                }
                consumed.fetch_add(1);
            }
        }
    });

    std::vector<std::thread> producers;
    for (int p = 0; p < PRODUCERS; ++p) producers.emplace_back(producer, p);
    for (auto& t : producers) t.join();
    done.store(true);
    consumer.join();

    uint64_t total = (uint64_t)PRODUCERS * PER_PRODUCER;
    uint64_t dropped = fp_ring_dropped(ring);
    if (consumed.load() + dropped != total) {
        std::fprintf(stderr, "ACCOUNTING: consumed %llu + dropped %llu != %llu\n",
                     (unsigned long long)consumed.load(),
                     (unsigned long long)dropped, (unsigned long long)total);
        return 3;
    }
    std::printf("stress OK: %llu consumed, %llu dropped (leaky), 0 dupes\n",
                (unsigned long long)consumed.load(),
                (unsigned long long)dropped);
    fp_reseq_free(rs);
    fp_ring_free(ring);
    return 0;
}
