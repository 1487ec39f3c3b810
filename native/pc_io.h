// Shared atomic file write for the native runtime.
//
// Crash-consistency contract (SURVEY.md section 5: the store itself is
// the checkpoint): readers must never observe a partially written cell,
// so every write lands in a per-job-unique temp file and renames into
// place. The temp name is unique per write — two in-flight writes to the
// same path must not share a temp file (one would rename the other's
// half-written bytes away; caught by native/pc_stress_test.cpp under
// ThreadSanitizer). Both the async I/O pool (pc_native.cpp) and the
// engine's save path (pc_engine.cpp) must use this one implementation.

#ifndef PC_IO_H_
#define PC_IO_H_

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <string>

namespace pcio {

inline bool atomic_write_file(const std::string& path, const void* data,
                              size_t len) {
    static std::atomic<uint64_t> seq{0};
    const std::string tmp =
        path + ".tmp" + std::to_string(seq.fetch_add(1));
    FILE* f = std::fopen(tmp.c_str(), "wb");
    if (f == nullptr) return false;
    bool ok = true;
    if (len != 0) {
        ok = std::fwrite(data, 1, len, f) == len;
    }
    ok = (std::fclose(f) == 0) && ok;
    if (ok) ok = std::rename(tmp.c_str(), path.c_str()) == 0;
    if (!ok) std::remove(tmp.c_str());
    return ok;
}

}  // namespace pcio

#endif  // PC_IO_H_
