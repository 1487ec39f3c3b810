// pc_native: native runtime for point_cloud_tpu.
//
// The reference implements its runtime concurrency in a native crate
// (reference: thread-pool/src/lib.rs — fixed worker pool over one shared
// MPMC channel, graceful terminate+join on Drop). This library is the
// TPU-framework equivalent: a C-ABI thread pool specialized for the
// converter's store I/O so cell write-back and read-ahead overlap the
// device pipeline instead of blocking it (Python-side file writes serialize
// on the interpreter; these workers never touch the GIL).
//
// Exposed C ABI (see point_cloud_tpu/native/__init__.py for the ctypes
// binding):
//   pc_pool_create(n_threads)            -> handle
//   pc_pool_submit_write(pool, path, data, len)  (data copied; enqueue)
//   pc_pool_read_file(path, &len)        -> malloc'd buffer (sync helper)
//   pc_pool_pending(pool)                -> jobs not yet completed
//   pc_pool_error_count(pool)            -> failed writes so far
//   pc_pool_flush(pool)                  (block until queue drains)
//   pc_pool_destroy(pool)                (flush + join)
//   pc_free(ptr)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "pc_io.h"

namespace {

struct WriteJob {
    std::string path;
    std::vector<uint8_t> data;
};

class Pool {
  public:
    explicit Pool(int n_threads) : stop_(false), pending_(0), errors_(0) {
        if (n_threads < 1) n_threads = 1;
        for (int i = 0; i < n_threads; ++i) {
            workers_.emplace_back([this] { this->run(); });
        }
    }

    ~Pool() {
        {
            std::unique_lock<std::mutex> lock(mu_);
            stop_ = true;
        }
        cv_.notify_all();
        for (auto& t : workers_) t.join();
    }

    void submit(WriteJob job) {
        {
            std::unique_lock<std::mutex> lock(mu_);
            pending_.fetch_add(1, std::memory_order_relaxed);
            queue_.push_back(std::move(job));
        }
        cv_.notify_one();
    }

    void flush() {
        std::unique_lock<std::mutex> lock(mu_);
        done_cv_.wait(lock, [this] {
            return pending_.load(std::memory_order_acquire) == 0;
        });
    }

    int64_t pending() const {
        return pending_.load(std::memory_order_acquire);
    }

    int64_t errors() const {
        return errors_.load(std::memory_order_acquire);
    }

  private:
    void run() {
        for (;;) {
            WriteJob job;
            {
                std::unique_lock<std::mutex> lock(mu_);
                cv_.wait(lock, [this] { return stop_ || !queue_.empty(); });
                if (queue_.empty()) {
                    if (stop_) return;
                    continue;
                }
                job = std::move(queue_.front());
                queue_.pop_front();
            }
            if (!write_file(job)) {
                errors_.fetch_add(1, std::memory_order_relaxed);
            }
            // decrement under mu_ and notify while holding it: a bare
            // decrement+notify can land between flush()'s predicate check
            // and its block (missed wakeup -> flush sleeps forever)
            {
                std::unique_lock<std::mutex> lock(mu_);
                pending_.fetch_sub(1, std::memory_order_acq_rel);
                if (pending_.load(std::memory_order_acquire) == 0) {
                    done_cv_.notify_all();
                }
            }
        }
    }

    static bool write_file(const WriteJob& job) {
        return pcio::atomic_write_file(job.path, job.data.data(),
                                       job.data.size());
    }

    std::vector<std::thread> workers_;
    std::deque<WriteJob> queue_;
    std::mutex mu_;
    std::condition_variable cv_;
    std::condition_variable done_cv_;
    bool stop_;
    std::atomic<int64_t> pending_;
    std::atomic<int64_t> errors_;
};

}  // namespace

extern "C" {

void* pc_pool_create(int n_threads) { return new Pool(n_threads); }

void pc_pool_submit_write(void* pool, const char* path, const uint8_t* data,
                          int64_t len) {
    WriteJob job;
    job.path = path;
    job.data.assign(data, data + len);
    static_cast<Pool*>(pool)->submit(std::move(job));
}

int64_t pc_pool_pending(void* pool) {
    return static_cast<Pool*>(pool)->pending();
}

int64_t pc_pool_error_count(void* pool) {
    return static_cast<Pool*>(pool)->errors();
}

void pc_pool_flush(void* pool) { static_cast<Pool*>(pool)->flush(); }

void pc_pool_destroy(void* pool) {
    Pool* p = static_cast<Pool*>(pool);
    p->flush();
    delete p;
}

uint8_t* pc_read_file(const char* path, int64_t* out_len) {
    *out_len = -1;
    FILE* f = std::fopen(path, "rb");
    if (f == nullptr) return nullptr;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (size < 0) {
        std::fclose(f);
        return nullptr;
    }
    uint8_t* buf = static_cast<uint8_t*>(std::malloc(size ? size : 1));
    if (buf == nullptr) {
        std::fclose(f);
        return nullptr;
    }
    size_t got = std::fread(buf, 1, size, f);
    std::fclose(f);
    if (got != static_cast<size_t>(size)) {
        std::free(buf);
        return nullptr;
    }
    *out_len = size;
    return buf;
}

void pc_free(void* ptr) { std::free(ptr); }

}  // extern "C"

// ---------------------------------------------------------------------------
// Host staging kernels for the conversion pipeline.
//
// These mirror the NumPy staging math bit-for-bit (core/hex.py,
// core/metadata.py both follow IEEE f32 semantics, which plain C++ floats
// give without -ffast-math) and replace the per-batch NumPy passes with
// multi-threaded loops. Parity is enforced by tests/test_native.py.

#include <algorithm>
#include <cmath>
#include <limits>

#include "pc_hex.h"

namespace {

using pchex::hex_quantize;
using pchex::sat_i32;

struct HexJob {
    const float* positions;  // (n, 3)
    int64_t n;
    float cell_size;
    float sub_radius;      // sub_cell_size / 2
    float next_cell_size;  // cell_size / 2
    int32_t* cell_idx;     // (n, 3)
    int32_t* sub_idx;      // (n, 3)
    float* dist;           // (n,)
    int32_t* next_idx;     // (n, 3)
};

void hex_keys_range(const HexJob& job, int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
        const float px = job.positions[3 * i + 0];
        const float py = job.positions[3 * i + 1];
        const float pz = job.positions[3 * i + 2];

        job.cell_idx[3 * i + 0] = pchex::cell_coord(px, job.cell_size);
        job.cell_idx[3 * i + 1] = pchex::cell_coord(py, job.cell_size);
        job.cell_idx[3 * i + 2] = pchex::cell_coord(pz, job.cell_size);
        job.next_idx[3 * i + 0] = pchex::cell_coord(px, job.next_cell_size);
        job.next_idx[3 * i + 1] = pchex::cell_coord(py, job.next_cell_size);
        job.next_idx[3 * i + 2] = pchex::cell_coord(pz, job.next_cell_size);

        const pchex::HexResult hr =
            hex_quantize(px, py, pz, job.sub_radius);
        job.sub_idx[3 * i + 0] = hr.sub[0];
        job.sub_idx[3 * i + 1] = hr.sub[1];
        job.sub_idx[3 * i + 2] = hr.sub[2];
        job.dist[i] = hr.dist;
    }
}

}  // namespace

extern "C" {

void pc_hex_keys(const float* positions, int64_t n, float cell_size,
                 float sub_radius, float next_cell_size, int32_t* cell_idx,
                 int32_t* sub_idx, float* dist, int32_t* next_idx,
                 int n_threads) {
    HexJob job{positions, n,       cell_size, sub_radius,
               next_cell_size, cell_idx, sub_idx,  dist, next_idx};
    if (n_threads <= 1 || n < (1 << 14)) {
        hex_keys_range(job, 0, n);
        return;
    }
    std::vector<std::thread> workers;
    const int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        const int64_t lo = t * chunk;
        const int64_t hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        workers.emplace_back([&job, lo, hi] { hex_keys_range(job, lo, hi); });
    }
    for (auto& w : workers) w.join();
}

// Sort row indices by (cell_key, next_key, pos bits x/y/z, rgba) — the
// device converter's overflow-staging order (convert/device.py step 4).
void pc_staging_sort(const int64_t* cell_key, const int64_t* next_key,
                     const int32_t* pos_bits,  // (n, 3) f32 bit patterns
                     const uint32_t* color_key, int64_t n, int64_t* order) {
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    std::sort(order, order + n, [&](int64_t a, int64_t b) {
        if (cell_key[a] != cell_key[b]) return cell_key[a] < cell_key[b];
        if (next_key[a] != next_key[b]) return next_key[a] < next_key[b];
        if (pos_bits[3 * a] != pos_bits[3 * b])
            return pos_bits[3 * a] < pos_bits[3 * b];
        if (pos_bits[3 * a + 1] != pos_bits[3 * b + 1])
            return pos_bits[3 * a + 1] < pos_bits[3 * b + 1];
        if (pos_bits[3 * a + 2] != pos_bits[3 * b + 2])
            return pos_bits[3 * a + 2] < pos_bits[3 * b + 2];
        return color_key[a] < color_key[b];
    });
}

}  // extern "C"

extern "C" {

// Probe LSM segments for incumbent slots (core/cell.py merge_winners):
// for each query key, search every segment's sorted key array; at most one
// valid row per key exists across segments (the LSM invariant). Outputs
// the incumbent's distance (+inf when absent), segment ordinal and row.
void pc_lsm_probe(const int64_t* seg_keys,     // concatenated sorted keys
                  const uint8_t* seg_valid,    // concatenated bitmaps
                  const float* seg_dist,       // concatenated distances
                  const int64_t* seg_offsets,  // (n_segments + 1,)
                  int64_t n_segments,
                  const int64_t* queries, int64_t n_queries,
                  float* inc_dist, int32_t* inc_seg, int64_t* inc_loc,
                  int n_threads) {
    auto worker = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const int64_t key = queries[i];
            float best = std::numeric_limits<float>::infinity();
            int32_t best_seg = -1;
            int64_t best_loc = 0;
            for (int64_t s = 0; s < n_segments; ++s) {
                const int64_t begin = seg_offsets[s];
                const int64_t end = seg_offsets[s + 1];
                const int64_t* first = seg_keys + begin;
                const int64_t* last = seg_keys + end;
                const int64_t* it = std::lower_bound(first, last, key);
                if (it != last && *it == key) {
                    const int64_t loc = it - seg_keys;
                    if (seg_valid[loc]) {
                        best = seg_dist[loc];
                        best_seg = static_cast<int32_t>(s);
                        best_loc = loc - begin;
                        break;  // LSM invariant: only one valid row per key
                    }
                }
            }
            inc_dist[i] = best;
            inc_seg[i] = best_seg;
            inc_loc[i] = best_loc;
        }
    };
    if (n_threads <= 1 || n_queries < (1 << 13)) {
        worker(0, n_queries);
        return;
    }
    std::vector<std::thread> workers;
    const int64_t chunk = (n_queries + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        const int64_t lo = t * chunk;
        const int64_t hi = std::min(n_queries, lo + chunk);
        if (lo >= hi) break;
        workers.emplace_back([&worker, lo, hi] { worker(lo, hi); });
    }
    for (auto& w : workers) w.join();
}

// Per-axis min/max of an (n, 3) f32 batch — the per-batch bounding-box
// fold every converter runs (core/aabb.py Aabb.from_points). min/max are
// exact and order-independent in IEEE f32, so any evaluation order is
// bit-identical to NumPy's reduce; NumPy's axis-0 reduction over 3-wide
// rows vectorizes poorly (measured ~14 ms per 2^18-point batch — 10% of
// the engine conversion wall), while this flat three-accumulator SSE scan
// runs at memory speed. Returns 0 on success; 1 when the result is not
// provably bit-identical to NumPy's and the caller must fall back:
// a NaN was seen (NumPy propagates NaN through min/max, SSE does not),
// or a result component is a zero (min(-0.0, +0.0) is order-dependent
// in IEEE and in NumPy's own reduce, so only nonzero extrema are
// uniquely determined).
int pc_bbox_f32(const float* pos, int64_t n, float* out_min,
                float* out_max) {
    if (n <= 0) return 1;
    const int64_t total = 3 * n;
    int64_t i = 0;
    float mn[3] = {pos[0], pos[1], pos[2]};
    float mx[3] = {pos[0], pos[1], pos[2]};
    bool nan_seen = false;
#ifdef PC_HEX_SIMD
    if (total >= 24) {
        // three rotating accumulators over the flat array: lane l of
        // accumulator a holds component (4a + l) mod 3
        __m128 amn[3], amx[3], unord = _mm_setzero_ps();
        for (int a = 0; a < 3; ++a) {
            amn[a] = amx[a] = _mm_loadu_ps(pos + 4 * a);
            unord = _mm_or_ps(unord, _mm_cmpunord_ps(amn[a], amn[a]));
        }
        for (i = 12; i + 12 <= total; i += 12) {
            for (int a = 0; a < 3; ++a) {
                const __m128 v = _mm_loadu_ps(pos + i + 4 * a);
                unord = _mm_or_ps(unord, _mm_cmpunord_ps(v, v));
                amn[a] = _mm_min_ps(amn[a], v);
                amx[a] = _mm_max_ps(amx[a], v);
            }
        }
        nan_seen = _mm_movemask_ps(unord) != 0;
        alignas(16) float lanes[4];
        for (int a = 0; a < 3; ++a) {
            _mm_store_ps(lanes, amn[a]);
            for (int l = 0; l < 4; ++l) {
                const int c = (4 * a + l) % 3;
                mn[c] = lanes[l] < mn[c] ? lanes[l] : mn[c];
            }
            _mm_store_ps(lanes, amx[a]);
            for (int l = 0; l < 4; ++l) {
                const int c = (4 * a + l) % 3;
                mx[c] = lanes[l] > mx[c] ? lanes[l] : mx[c];
            }
        }
    }
#endif
    for (; i < total; ++i) {
        const float v = pos[i];
        nan_seen |= v != v;
        const int c = static_cast<int>(i % 3);
        mn[c] = v < mn[c] ? v : mn[c];
        mx[c] = v > mx[c] ? v : mx[c];
    }
    bool zero_result = false;
    for (int c = 0; c < 3; ++c) {
        zero_result |= mn[c] == 0.0f || mx[c] == 0.0f;
    }
    std::memcpy(out_min, mn, 12);
    std::memcpy(out_max, mx, 12);
    return (nan_seen || zero_result) ? 1 : 0;
}

}  // extern "C"
