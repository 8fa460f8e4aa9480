#!/bin/sh
# Build and run the native runtime stress harness under ThreadSanitizer,
# then under AddressSanitizer (leaks + memory errors).
set -e
cd "$(dirname "$0")"
g++ -O1 -g -std=c++17 -fsanitize=thread -pthread \
    framepipe_stress.cpp -o /tmp/framepipe_stress_tsan
TSAN_OPTIONS="halt_on_error=1" /tmp/framepipe_stress_tsan
echo "TSAN: no data races detected"
g++ -O1 -g -std=c++17 -fsanitize=address,undefined -pthread \
    framepipe_stress.cpp -o /tmp/framepipe_stress_asan
ASAN_OPTIONS="detect_leaks=1:halt_on_error=1" /tmp/framepipe_stress_asan
echo "ASAN/UBSAN: clean"
