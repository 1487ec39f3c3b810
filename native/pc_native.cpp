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
            if (pending_.fetch_sub(1, std::memory_order_acq_rel) == 1) {
                done_cv_.notify_all();
            }
        }
    }

    static bool write_file(const WriteJob& job) {
        // write to a sibling temp file + rename: readers never observe a
        // partially written cell (the converter's crash-resume contract —
        // the store itself is the checkpoint, SURVEY.md section 5)
        std::string tmp = job.path + ".tmp";
        FILE* f = std::fopen(tmp.c_str(), "wb");
        if (f == nullptr) return false;
        bool ok = true;
        if (!job.data.empty()) {
            ok = std::fwrite(job.data.data(), 1, job.data.size(), f) ==
                 job.data.size();
        }
        ok = (std::fclose(f) == 0) && ok;
        if (ok) ok = std::rename(tmp.c_str(), job.path.c_str()) == 0;
        if (!ok) std::remove(tmp.c_str());
        return ok;
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
