// pc_engine: native conversion engine — the C++ runtime equivalent of the
// reference's offline converter hot loop (point-converter/src/converter.rs
// :106-139 + cell.rs:70-153), built for host-side throughput when the
// accelerator link is thin (see PERF.md "tunnel caveat").
//
// Semantics contract (bit-for-bit store parity with the Python oracle
// convert/converter.py + core/cell.py, enforced by tests/test_native_engine
// .py):
//   - hex dedup: one point per hexagonal-prism sub-grid slot; a newcomer
//     displaces the incumbent only if strictly closer to the slot center
//     (cell.rs:80 `new < old` — f32 compare, same op order as core/hex.py),
//   - losers stage per (cell, next-hierarchy cell) group in canonical
//     record order (bit-pattern sort — core/cell.py
//     _canonical_overflow_order), with the overflow-limit accounting of
//     cell.rs:108-153 (buffer <= limit on first insert, flush + tombstone
//     at old+new >= limit, tombstones pass straight through),
//   - flushed groups feed the next hierarchy in global (cell, next)
//     lexicographic order (the same sequence the device pipeline stages),
//   - cell files serialize points sorted by sub-grid index and overflow
//     entries sorted by key — byte-identical to core/cell.py to_bytes.
//
// State model: the engine owns every touched cell in RAM (slot grids are
// open-addressing flat tables, ~32 B per stored point). This trades memory
// for zero per-batch disk churn; the Python converters keep the LRU path
// for bounded-memory conversions.

#include <algorithm>
#include <array>
#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <memory>
#include <set>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <sys/stat.h>
#include <sys/types.h>

#include "pc_hex.h"
#include "pc_io.h"

namespace {

// PC_ENGINE_PROFILE=1: per-destroy stderr breakdown of where batch time
// goes (insert loop vs staging vs flush concat), plus level-row counts.
// PC_ENGINE_PROFILE=2 adds a per-hierarchy-level row/insert-time table
// (aggregated across batches) to localize insert cost by level.
struct Profile {
    int enabled = [] {
        const char* v = std::getenv("PC_ENGINE_PROFILE");
        return v == nullptr ? 0 : std::atoi(v) > 1 ? 2 : 1;
    }();
    double t_keys = 0, t_insert = 0, t_stage = 0, t_concat = 0,
           t_save = 0;
    int64_t level_rows = 0, input_rows = 0;
    std::array<double, 32> t_insert_h{};
    std::array<int64_t, 32> rows_h{};

    static double now() {
        return std::chrono::duration<double>(
                   std::chrono::steady_clock::now().time_since_epoch())
            .count();
    }
    void level(int32_t h, int64_t rows, double t) {
        if (enabled > 1 && h >= 0 && h < 32) {
            t_insert_h[h] += t;
            rows_h[h] += rows;
        }
    }
    void dump() const {
        if (!enabled) return;
        std::fprintf(stderr,
                     "[pc_engine] rows: input=%lld level-total=%lld "
                     "(%.2fx)  keys=%.3fs insert=%.3fs stage=%.3fs "
                     "concat=%.3fs save=%.3fs\n",
                     static_cast<long long>(input_rows),
                     static_cast<long long>(level_rows),
                     input_rows ? double(level_rows) / input_rows : 0.0,
                     t_keys, t_insert, t_stage, t_concat, t_save);
        if (enabled > 1) {
            for (int h = 0; h < 32; ++h) {
                if (rows_h[h] == 0) continue;
                std::fprintf(
                    stderr, "[pc_engine]   h=%-2d rows=%-9lld insert=%.3fs "
                            "(%.1f ns/row)\n",
                    h, static_cast<long long>(rows_h[h]), t_insert_h[h],
                    1e9 * t_insert_h[h] / rows_h[h]);
            }
        }
    }
};

}  // namespace

namespace {

struct Point {
    float p[3];
    uint8_t rgba[4];

    uint32_t color_u32() const {
        uint32_t v;
        std::memcpy(&v, rgba, 4);
        return v;  // little-endian hosts: r | g<<8 | b<<16 | a<<24
    }
    int32_t bits(int axis) const {
        int32_t v;
        std::memcpy(&v, &p[axis], 4);
        return v;
    }
};
static_assert(sizeof(Point) == 16, "Point must match the 16-byte codec");

// canonical staged-overflow record order (core/cell.py
// _canonical_overflow_order): position bit patterns as signed i32 x,y,z,
// then the RGBA bytes as one LE u32. Signed i32 compare == unsigned
// compare after flipping the sign bit, so two u64 loads decide it.
inline uint64_t rec_key_hi(const Point& pt) {
    uint32_t x, y;
    std::memcpy(&x, &pt.p[0], 4);
    std::memcpy(&y, &pt.p[1], 4);
    return (static_cast<uint64_t>(x ^ 0x80000000u) << 32) |
           (y ^ 0x80000000u);
}
inline uint64_t rec_key_lo(const Point& pt) {
    uint32_t z;
    std::memcpy(&z, &pt.p[2], 4);
    return (static_cast<uint64_t>(z ^ 0x80000000u) << 32) | pt.color_u32();
}
inline bool record_less(const Point& a, const Point& b) {
    const uint64_t ah = rec_key_hi(a), bh = rec_key_hi(b);
    if (ah != bh) return ah < bh;
    return rec_key_lo(a) < rec_key_lo(b);
}

using Key3 = std::array<int32_t, 3>;

// a Point plus its row index into the current batch's device-resident
// buffer (-1 = foreign: displaced incumbent or staged by an earlier
// batch). Only the in-flight staging path carries src; persisted
// overflow groups store plain Points (their src dies with the batch).
struct SrcPoint {
    Point pt;
    int32_t src;
};

struct Key3Hash {
    size_t operator()(const Key3& k) const {
        uint64_t h = 0x9E3779B97F4A7C15ull;
        for (int32_t v : k) {
            h ^= static_cast<uint64_t>(static_cast<uint32_t>(v));
            h *= 0xBF58476D1CE4E5B9ull;
            h ^= h >> 29;
        }
        return static_cast<size_t>(h);
    }
};

constexpr int64_t kKeyBias = 1 << 20;  // core/cell.py _KEY_BIAS
constexpr int64_t kEmptyKey = -1;

inline bool pack_slot_key(const Key3& sub, int64_t* out) {
    for (int32_t v : sub) {
        if (v < -kKeyBias || v >= kKeyBias) return false;
    }
    *out = ((static_cast<int64_t>(sub[0]) + kKeyBias) << 42) |
           ((static_cast<int64_t>(sub[1]) + kKeyBias) << 21) |
           (static_cast<int64_t>(sub[2]) + kKeyBias);
    return true;
}

inline Key3 unpack_slot_key(int64_t key) {
    return Key3{
        static_cast<int32_t>((key >> 42) - kKeyBias),
        static_cast<int32_t>(((key >> 21) & ((1 << 21) - 1)) - kKeyBias),
        static_cast<int32_t>((key & ((1 << 21) - 1)) - kKeyBias),
    };
}

inline uint64_t mix64(uint64_t x) {
    x ^= x >> 33;
    x *= 0xFF51AFD7ED558CCDull;
    x ^= x >> 33;
    x *= 0xC4CEB9FE1A85EC53ull;
    x ^= x >> 33;
    return x;
}

// open-addressing slot grid: one entry per occupied hex slot. Split
// layout: the probe array holds (key, dist) in 16 B — 4 entries per cache
// line — and the point payloads live in a parallel array touched only on
// claim/displace.
struct SlotKD {
    int64_t key;  // packed sub index, kEmptyKey when vacant
    float dist;
    uint32_t pad;
};
static_assert(sizeof(SlotKD) == 16, "probe entries must stay 16 B");

class SlotMap {
  public:
    SlotMap() { rehash(64); }

    // index of the occupied entry for key, or of a vacant entry (key ==
    // kEmptyKey) the caller may claim via `claim`
    size_t find_or_vacant(int64_t key) {
        if ((size_ + 1) * 2 >= cap_) grow();
        size_t i = mix64(static_cast<uint64_t>(key)) & (cap_ - 1);
        for (;;) {
            const SlotKD& e = kd_[i];
            if (e.key == key || e.key == kEmptyKey) return i;
            i = (i + 1) & (cap_ - 1);
        }
    }

    int64_t key_at(size_t i) const { return kd_[i].key; }
    float dist_at(size_t i) const { return kd_[i].dist; }
    void set_dist(size_t i, float d) { kd_[i].dist = d; }
    Point& pt_at(size_t i) { return pts_[i]; }
    const Point& pt_at(size_t i) const { return pts_[i]; }

    void claim(size_t i, int64_t key, float dist, const Point& pt) {
        kd_[i].key = key;
        kd_[i].dist = dist;
        pts_[i] = pt;
        ++size_;
    }

    size_t size() const { return size_; }
    size_t capacity() const { return cap_; }

    void prefetch(int64_t key) const {
        const size_t i = mix64(static_cast<uint64_t>(key)) & (cap_ - 1);
        __builtin_prefetch(&kd_[i]);
        // the payload line is written on every claim/displace; the first
        // probe is usually final, so this speculative line pays off on
        // claim-heavy (deep) levels
        __builtin_prefetch(&pts_[i], 1);
    }

  private:
    void grow() { rehash(cap_ * 2); }

    void rehash(size_t new_cap) {
        std::vector<SlotKD> old_kd = std::move(kd_);
        std::vector<Point> old_pts = std::move(pts_);
        cap_ = new_cap;
        kd_.assign(cap_, SlotKD{kEmptyKey, 0.0f, 0});
        pts_.resize(cap_);
        for (size_t j = 0; j < old_kd.size(); ++j) {
            const SlotKD& e = old_kd[j];
            if (e.key == kEmptyKey) continue;
            size_t i = mix64(static_cast<uint64_t>(e.key)) & (cap_ - 1);
            while (kd_[i].key != kEmptyKey) i = (i + 1) & (cap_ - 1);
            kd_[i] = e;
            pts_[i] = old_pts[j];
        }
    }

    std::vector<SlotKD> kd_;
    std::vector<Point> pts_;
    size_t cap_ = 0;
    size_t size_ = 0;
};

struct OverflowGroup {
    bool tombstone = false;
    std::vector<Point> pts;  // arrival order (per-batch canonical chunks)
};

struct CellState {
    int32_t h;
    Key3 idx;
    float size;           // cell_size(h), header field
    float sub_cell_size;  // size / sub_grid_dimension
    float radius;         // sub_cell_size / 2 (hex quantization radius)
    float pos[3];         // cell center, header field

    uint32_t total_points = 0;
    uint32_t n_points = 0;
    uint32_t n_overflow = 0;
    uint64_t last_touch = 0;  // batch stamp for spill eviction order
    // false while the in-RAM state still serializes to exactly the bytes
    // it was parsed from (our own writer's canonical form round-trips):
    // clean cells skip the store write on save/spill — an incremental
    // merge only rewrites the cells it actually changed
    bool dirty = true;

    SlotMap slots;
    // slots whose sub index exceeds the packed-key range (rare)
    std::map<Key3, std::pair<float, Point>> slots_oor;
    std::unordered_map<Key3, OverflowGroup, Key3Hash> overflow;
    // per-level loser staging, cleared after accounting
    std::unordered_map<Key3, std::vector<SrcPoint>, Key3Hash> pending;
};

struct CellKey {
    int32_t h;
    Key3 idx;
    bool operator==(const CellKey& o) const {
        return h == o.h && idx == o.idx;
    }
};

struct CellKeyHash {
    size_t operator()(const CellKey& k) const {
        uint64_t v = Key3Hash()(k.idx);
        return static_cast<size_t>(
            mix64(v ^ static_cast<uint32_t>(k.h)));
    }
};

struct FlushGroup {
    Key3 cell;
    Key3 next;
    std::vector<SrcPoint> pts;
};

// run f(lo, hi, worker) over [0, m) chunks; inline below the thread-spawn
// break-even (results are identical either way — workers touch disjoint
// index ranges / disjoint cell shards)
template <typename F>
void run_parallel(size_t n_workers, size_t m, const F& f) {
    if (n_workers <= 1 || m < (1 << 13)) {
        f(0, m, 0);
        return;
    }
    std::vector<std::thread> ts;
    const size_t chunk = (m + n_workers - 1) / n_workers;
    for (size_t t = 0; t < n_workers; ++t) {
        const size_t lo = t * chunk;
        const size_t hi = std::min(m, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([&f, lo, hi, t] { f(lo, hi, t); });
    }
    for (auto& th : ts) th.join();
}

template <typename F>
void run_sharded(size_t n_workers, size_t total_work, const F& f) {
    if (n_workers <= 1 || total_work < (1 << 13)) {
        for (size_t t = 0; t < n_workers; ++t) f(t);
        return;
    }
    std::vector<std::thread> ts;
    for (size_t t = 0; t < n_workers; ++t) {
        ts.emplace_back([&f, t] { f(t); });
    }
    for (auto& th : ts) th.join();
}

class Engine {
  public:
    Engine(int64_t overflow_limit, float max_cell_size, int sub_grid_dim,
           int n_threads)
        : limit_(overflow_limit),
          max_cell_size_(max_cell_size),
          sub_grid_dim_(static_cast<float>(sub_grid_dim)),
          shards_(n_threads < 1 ? 1 : n_threads) {}

    // deterministic cell ownership: each cell belongs to exactly one
    // shard/worker, so per-cell arrival order (the dedup tie-break,
    // cell.rs:80) is preserved under parallel execution
    size_t owner(int32_t h, const Key3& idx) const {
        return CellKeyHash()(CellKey{h, idx}) % shards_.size();
    }

    // f32 grid quantities, same op order as core/metadata.py
    float cell_size(int32_t h) const {
        // numpy: f32(max) / f32(u32(2) ** u32(h)) — u32 wraps at h >= 32
        const uint32_t denom =
            static_cast<uint32_t>(1ull << (static_cast<uint32_t>(h) & 63));
        return max_cell_size_ / static_cast<float>(denom);
    }

    // cell spilling: with a store directory + budget set, cells evict to
    // their store files between batches (coldest first) and reload
    // lazily on the next touch — the engine's equivalent of the Python
    // converters' save-on-evict LRU (results identical: cells round-trip
    // losslessly through the codec, only disk traffic changes)
    void set_spill(const std::string& dir, int64_t budget) {
        store_dir_ = dir;
        cell_budget_ = budget;
    }

    std::string cell_path(int32_t h, const Key3& idx) const {
        return store_dir_ + "/h_" + std::to_string(h) + "/c_" +
               std::to_string(idx[0]) + "_" + std::to_string(idx[1]) +
               "_" + std::to_string(idx[2]) + ".bin";
    }

    CellState* create_empty(int32_t h, const Key3& idx) {
        auto cell = std::make_unique<CellState>();
        cell->h = h;
        cell->idx = idx;
        const float size = cell_size(h);
        cell->size = size;
        cell->sub_cell_size = size / sub_grid_dim_;
        cell->radius = cell->sub_cell_size / 2.0f;
        const float half = size / 2.0f;
        for (int ax = 0; ax < 3; ++ax) {
            cell->pos[ax] = static_cast<float>(idx[ax]) * size + half;
        }
        cell->last_touch = batch_seq_;
        CellState* raw = cell.get();
        shards_[owner(h, idx)].emplace(CellKey{h, idx}, std::move(cell));
        return raw;
    }

    CellState* get_or_create(int32_t h, const Key3& idx) {
        const CellKey key{h, idx};
        auto& cells_ = shards_[owner(h, idx)];
        auto it = cells_.find(key);
        if (it != cells_.end()) {
            it->second->last_touch = batch_seq_;
            return it->second.get();
        }
        if (!store_dir_.empty()) {
            // lazily pull a spilled / pre-existing cell from the store;
            // an unreadable / corrupt / mismatched file LATCHES an error
            // instead of silently starting an empty cell that would later
            // overwrite the existing store file (round-2 review finding)
            const std::string path = cell_path(h, idx);
            FILE* f = std::fopen(path.c_str(), "rb");
            if (f != nullptr) {
                std::fseek(f, 0, SEEK_END);
                const long size = std::ftell(f);
                std::fseek(f, 0, SEEK_SET);
                std::vector<uint8_t> buf(size > 0 ? size : 0);
                const bool ok =
                    size >= 0 &&
                    std::fread(buf.data(), 1, buf.size(), f) == buf.size();
                std::fclose(f);
                auto cell =
                    ok ? parse_cell(buf.data(), buf.size(), &key) : nullptr;
                if (!cell) {
                    load_error_.store(true, std::memory_order_release);
                    // keep the returned pointer valid for the in-flight
                    // level; the latched error aborts the batch and
                    // blocks every store write (see add_batch/save_all)
                    return create_empty(h, idx);
                }
                cell->last_touch = batch_seq_;
                CellState* raw = cell.get();
                cells_.emplace(key, std::move(cell));
                return raw;
            }
        }
        return create_empty(h, idx);
    }

    // evict the coldest cells down to the budget; only safe between
    // batches (levels hold raw CellState pointers)
    void maybe_spill() {
        if (cell_budget_ < 0 || store_dir_.empty()) return;
        if (load_error_.load(std::memory_order_acquire)) return;
        int64_t n = num_cells();
        if (n <= cell_budget_) return;
        std::vector<std::pair<uint64_t, CellKey>> order;
        order.reserve(n);
        for (const auto& shard : shards_) {
            for (const auto& [key, cell] : shard) {
                order.emplace_back(cell->last_touch, key);
            }
        }
        const int64_t excess = n - cell_budget_;
        std::nth_element(
            order.begin(), order.begin() + excess, order.end(),
            [](const auto& a, const auto& b) { return a.first < b.first; });
        std::string buf;
        for (int64_t i = 0; i < excess; ++i) {
            const CellKey key = order[i].second;
            auto& shard = shards_[owner(key.h, key.idx)];
            auto it = shard.find(key);
            if (it == shard.end()) continue;
            if (!it->second->dirty) {
                // clean: the store file already holds these bytes
                shard.erase(it);
                continue;
            }
            if (!serialize_cell(*it->second, &buf)) {
                ++spill_errors_;
                continue;  // unserializable cells stay resident
            }
            const std::string path = cell_path(key.h, key.idx);
            if (!pcio::atomic_write_file(path, buf.data(), buf.size())) {
                // first failure is usually a missing h_<n> directory
                const std::string dir =
                    store_dir_ + "/h_" + std::to_string(key.h);
                ::mkdir(dir.c_str(), 0777);
                if (!pcio::atomic_write_file(path, buf.data(),
                                             buf.size())) {
                    ++spill_errors_;
                    continue;
                }
            }
            shard.erase(it);
        }
    }

    int64_t spill_errors() const { return spill_errors_; }

    // group a cell-interleaved level's rows by cell-hash bucket (stable
    // counting sort, 1024 buckets). Level-0 input arrives point-
    // interleaved across cells, which defeats pass C's last-cell cache,
    // the same-cell slot prefetch, and slot-table locality (measured
    // 146 ns/row vs 57-91 for the cell-grouped deeper levels); deeper
    // levels arrive grouped from the flush concat, so a cheap
    // switch-count pre-scan skips them. Stability preserves per-cell
    // arrival order — the dedup tie-break — so stores stay
    // byte-identical (tests/test_native_engine.py).
    static bool group_rows_by_cell(int32_t h, const std::vector<Key3>& cidx,
                                   std::vector<int64_t>* order) {
        const size_t m = cidx.size();
        if (m < (1 << 14)) return false;
        size_t switches = 0;
        for (size_t i = 1; i < m; ++i) {
            switches += !(cidx[i] == cidx[i - 1]);
        }
        if (switches <= (m >> 6)) return false;  // already well-grouped
        constexpr size_t kBuckets = 1024;
        std::vector<uint32_t> bucket(m);
        std::array<int64_t, kBuckets + 1> starts{};
        for (size_t i = 0; i < m; ++i) {
            const uint32_t b =
                static_cast<uint32_t>(CellKeyHash()(CellKey{h, cidx[i]})) &
                (kBuckets - 1);
            bucket[i] = b;
            starts[b + 1]++;
        }
        for (size_t b = 0; b < kBuckets; ++b) starts[b + 1] += starts[b];
        order->resize(m);
        for (size_t i = 0; i < m; ++i) {
            (*order)[starts[bucket[i]]++] = static_cast<int64_t>(i);
        }
        return true;
    }

    // insert one point into a cell's slot grid (arrival order matters:
    // cell.rs:70-94 sequential semantics). Returns true + *loser when a
    // point (the displaced incumbent or the newcomer) must stage.
    // key/dist are precomputed by the level's key pass; key == INT64_MIN
    // flags a slot index beyond the packed range (rare).
    bool insert_keyed(CellState* c, const Point& pt, int64_t key,
                      float dist, Point* loser) {
        if (key != INT64_MIN) {
            const size_t i = c->slots.find_or_vacant(key);
            if (c->slots.key_at(i) == kEmptyKey) {
                c->slots.claim(i, key, dist, pt);
                c->total_points += 1;
                c->n_points += 1;
                c->dirty = true;
                return false;
            }
            if (dist < c->slots.dist_at(i)) {  // strict: ties keep incumbent
                *loser = c->slots.pt_at(i);
                c->slots.set_dist(i, dist);
                c->slots.pt_at(i) = pt;
                c->dirty = true;
            } else {
                *loser = pt;  // cell state untouched: stays clean
            }
            return true;
        }
        const pchex::HexResult hr =
            pchex::hex_quantize(pt.p[0], pt.p[1], pt.p[2], c->radius);
        const Key3 sub{hr.sub[0], hr.sub[1], hr.sub[2]};
        auto [it, inserted] =
            c->slots_oor.try_emplace(sub, hr.dist, pt);
        if (inserted) {
            c->total_points += 1;
            c->n_points += 1;
            c->dirty = true;
            return false;
        }
        if (hr.dist < it->second.first) {
            *loser = it->second.second;
            it->second = {hr.dist, pt};
            c->dirty = true;
        } else {
            *loser = pt;
        }
        return true;
    }

    // one full cascade over all hierarchy levels; returns the number of
    // levels entered (max hierarchy + 1)
    int32_t add_batch(const float* pos, const uint8_t* col, int64_t n) {
        const int32_t levels = cascade_from(0, pos, col, n);
        if (end_batch() < 0) return -1;
        return levels;
    }

    // end-of-batch bookkeeping shared by add_batch and the device-merge
    // flow (pc_engine_merge_level callers invoke this once per outer
    // batch); returns -1 when a lazy-load error latched during the batch
    int32_t end_batch() {
        ++batch_seq_;
        if (load_error_.load(std::memory_order_acquire)) {
            return -1;  // corrupt store cell encountered during lazy load
        }
        maybe_spill();
        return 0;
    }

    // the cascade body, entered at hierarchy ``h0`` (the device-merge
    // flow hands its sub-threshold tail here); does NOT end the batch
    int32_t cascade_from(int32_t h0, const float* pos, const uint8_t* col,
                         int64_t n) {
        std::vector<Point> level;
        level.resize(n);
        for (int64_t i = 0; i < n; ++i) {
            std::memcpy(level[i].p, pos + 3 * i, 12);
            std::memcpy(level[i].rgba, col + 4 * i, 4);
        }

        if (h0 == 0) prof_.input_rows += n;
        const size_t n_workers = shards_.size();
        int32_t h = h0;
        std::vector<Key3> cidx, nidx;
        std::vector<int64_t> skey;
        std::vector<float> sdist;
        std::vector<uint8_t> own;
        std::vector<int64_t> order;
        while (!level.empty() && h < 64) {
            const float cs = cell_size(h);
            const float next_cs = cs / 2.0f;
            const size_t m = level.size();
            prof_.level_rows += m;
            const double t0 = Profile::now();

            // pass A (parallel): per-point cell index, packed slot key,
            // slot distance, and next-hierarchy cell index. A flat array
            // loop the compiler can pipeline (the divides dominate); the
            // insert loop below then does pure table work.
            cidx.resize(m);
            skey.resize(m);
            sdist.resize(m);
            nidx.resize(m);
            run_parallel(n_workers, m, [&](size_t lo, size_t hi, size_t) {
                // per-level grid scalars are uniform, so the hex radius is
                // a constant here: radius = (cell_size/96)/2 in f32
                const float sub_size = cs / sub_grid_dim_;
                const float radius = sub_size / 2.0f;
                size_t i = lo;
#ifdef PC_HEX_SIMD
                alignas(16) float xs[4], ys[4], zs[4];
                const __m128 vcs = _mm_set1_ps(cs);
                const __m128 vncs = _mm_set1_ps(next_cs);
                for (; i + 4 <= hi; i += 4) {
                    for (int j = 0; j < 4; ++j) {
                        const Point& pt = level[i + j];
                        xs[j] = pt.p[0];
                        ys[j] = pt.p[1];
                        zs[j] = pt.p[2];
                    }
                    const __m128 vx = _mm_load_ps(xs);
                    const __m128 vy = _mm_load_ps(ys);
                    const __m128 vz = _mm_load_ps(zs);
                    alignas(16) int32_t cx[4], cy[4], cz[4];
                    alignas(16) int32_t nx[4], ny[4], nz[4];
                    _mm_store_si128(reinterpret_cast<__m128i*>(cx),
                                    pchex::cell_coord_x4(vx, vcs));
                    _mm_store_si128(reinterpret_cast<__m128i*>(cy),
                                    pchex::cell_coord_x4(vy, vcs));
                    _mm_store_si128(reinterpret_cast<__m128i*>(cz),
                                    pchex::cell_coord_x4(vz, vcs));
                    _mm_store_si128(reinterpret_cast<__m128i*>(nx),
                                    pchex::cell_coord_x4(vx, vncs));
                    _mm_store_si128(reinterpret_cast<__m128i*>(ny),
                                    pchex::cell_coord_x4(vy, vncs));
                    _mm_store_si128(reinterpret_cast<__m128i*>(nz),
                                    pchex::cell_coord_x4(vz, vncs));
                    pchex::HexResultX4 hx;
                    pchex::hex_quantize_x4(xs, ys, zs, radius, &hx);
                    for (int j = 0; j < 4; ++j) {
                        cidx[i + j] = Key3{cx[j], cy[j], cz[j]};
                        nidx[i + j] = Key3{nx[j], ny[j], nz[j]};
                        const Key3 sub{hx.sub0[j], hx.sub1[j], hx.sub2[j]};
                        int64_t key;
                        skey[i + j] =
                            pack_slot_key(sub, &key) ? key : INT64_MIN;
                        sdist[i + j] = hx.dist[j];
                    }
                }
#endif
                for (; i < hi; ++i) {
                    const Point& pt = level[i];
                    cidx[i] = Key3{pchex::cell_coord(pt.p[0], cs),
                                   pchex::cell_coord(pt.p[1], cs),
                                   pchex::cell_coord(pt.p[2], cs)};
                    nidx[i] = Key3{pchex::cell_coord(pt.p[0], next_cs),
                                   pchex::cell_coord(pt.p[1], next_cs),
                                   pchex::cell_coord(pt.p[2], next_cs)};
                    const pchex::HexResult hr = pchex::hex_quantize(
                        pt.p[0], pt.p[1], pt.p[2], radius);
                    const Key3 sub{hr.sub[0], hr.sub[1], hr.sub[2]};
                    int64_t key;
                    skey[i] = pack_slot_key(sub, &key) ? key : INT64_MIN;
                    sdist[i] = hr.dist;
                }
            });

            const double t0b = Profile::now();
            prof_.t_keys += t0b - t0;

            // pass B: stable partition of point indices by owner (keeps
            // per-cell arrival order — the dedup tie-break); a single
            // shard groups cell-interleaved levels by cell-hash bucket
            // (see group_rows_by_cell) or walks rows directly
            std::array<int64_t, 257> offsets{};
            bool have_order = false;
            if (n_workers == 1) {
                have_order = group_rows_by_cell(h, cidx, &order);
            }
            if (n_workers > 1) {
                own.resize(m);
                run_parallel(
                    n_workers, m, [&](size_t lo, size_t hi, size_t) {
                        for (size_t i = lo; i < hi; ++i) {
                            own[i] = static_cast<uint8_t>(
                                owner(h, cidx[i]));
                        }
                    });
                std::array<int64_t, 256> counts{};
                for (size_t i = 0; i < m; ++i) counts[own[i]]++;
                for (size_t t = 0; t < n_workers; ++t) {
                    offsets[t + 1] = offsets[t] + counts[t];
                }
                std::array<int64_t, 256> cursor{};
                for (size_t t = 0; t < n_workers; ++t) {
                    cursor[t] = offsets[t];
                }
                order.resize(m);
                for (size_t i = 0; i < m; ++i) {
                    order[cursor[own[i]]++] = static_cast<int64_t>(i);
                }
            } else {
                offsets[1] = static_cast<int64_t>(m);
            }

            // pass C (parallel): sequential inserts per owned cell.
            // Deeper levels arrive cell-grouped (the flush concat), so a
            // last-cell cache resolves most rows and same-cell prefetch
            // covers the cache-cold slot tables; level 0 has few cells
            // whose tables stay hot, so its cross-cell prefetch misses
            // don't matter.
            std::vector<std::vector<CellState*>> touched(n_workers);
            run_sharded(n_workers, m, [&](size_t t) {
                constexpr int64_t kPD = 16;  // slot-probe prefetch depth
                const bool direct = n_workers == 1 && !have_order;
                CellState* last_cell = nullptr;
                Key3 last_idx{};
                std::vector<SrcPoint>* last_pending = nullptr;
                Key3 last_pending_key{};
                for (int64_t k = offsets[t]; k < offsets[t + 1]; ++k) {
                    const int64_t i = direct ? k : order[k];
                    const Point& pt = level[i];
                    if (last_cell == nullptr || !(cidx[i] == last_idx)) {
                        last_cell = get_or_create(h, cidx[i]);
                        last_idx = cidx[i];
                        last_pending = nullptr;
                    }
                    CellState* c = last_cell;
                    if (k + kPD < offsets[t + 1]) {
                        const int64_t j = direct ? k + kPD : order[k + kPD];
                        if (skey[j] != INT64_MIN && cidx[j] == last_idx) {
                            c->slots.prefetch(skey[j]);
                        }
                    }
                    Point loser;
                    if (insert_keyed(c, pt, skey[i], sdist[i], &loser)) {
                        // the displaced incumbent's next index differs
                        // from the newcomer's; recompute only then
                        const Key3 nk =
                            loser.bits(0) == pt.bits(0) &&
                                    loser.bits(1) == pt.bits(1) &&
                                    loser.bits(2) == pt.bits(2)
                                ? nidx[i]
                                : Key3{pchex::cell_coord(loser.p[0],
                                                         next_cs),
                                       pchex::cell_coord(loser.p[1],
                                                         next_cs),
                                       pchex::cell_coord(loser.p[2],
                                                         next_cs)};
                        if (last_pending != nullptr &&
                            nk == last_pending_key) {
                            last_pending->push_back({loser, -1});
                            continue;
                        }
                        auto [it, fresh] = c->pending.try_emplace(nk);
                        if (c->pending.size() == 1 && fresh) {
                            touched[t].push_back(c);
                        }
                        it->second.push_back({loser, -1});
                        last_pending = &it->second;
                        last_pending_key = nk;
                    }
                }
            });

            const double t1 = Profile::now();
            prof_.t_insert += t1 - t0b;
            prof_.level(h, static_cast<int64_t>(m), t1 - t0b);

            stage_and_flush(touched, m, &level);
            ++h;
        }
        max_level_ = std::max(max_level_, h);
        return h;
    }

    // pass D + flush: stage each touched cell's pending losers (each
    // group sorted to canonical record order), then build the next
    // level's input rows in global (cell, next) order. ``m`` (the level's
    // row count) gates the thread-spawn break-even.
    void stage_and_flush(std::vector<std::vector<CellState*>>& touched,
                         size_t m, std::vector<Point>* out) {
        // host-cascade variant: src is untracked; strip it
        std::vector<SrcPoint> tmp;
        stage_and_flush(touched, m, &tmp);
        out->clear();
        out->reserve(tmp.size());
        for (const SrcPoint& sp : tmp) out->push_back(sp.pt);
    }

    void stage_and_flush(std::vector<std::vector<CellState*>>& touched,
                         size_t m, std::vector<SrcPoint>* out) {
        const size_t n_workers = shards_.size();
        const double t1 = Profile::now();
        // pass D (parallel): overflow accounting per (cell, group) —
        // once per level, each group in canonical record order (equal
        // records are byte-interchangeable, so the non-stable sort
        // ordering of their src fields cannot affect output bytes)
        std::vector<std::vector<FlushGroup>> flushed_per(n_workers);
        run_sharded(n_workers, m, [&](size_t t) {
            for (CellState* c : touched[t]) {
                for (auto& [nidx, vec] : c->pending) {
                    std::sort(vec.begin(), vec.end(),
                              [](const SrcPoint& a, const SrcPoint& b) {
                                  return record_less(a.pt, b.pt);
                              });
                    stage_group(c, nidx, std::move(vec), &flushed_per[t]);
                }
                c->pending.clear();
            }
        });
        const double t2 = Profile::now();
        prof_.t_stage += t2 - t1;

        // next level input: groups in global (cell, next) order
        std::vector<FlushGroup> flushed;
        for (auto& fg : flushed_per) {
            for (FlushGroup& g : fg) flushed.push_back(std::move(g));
        }
        std::sort(flushed.begin(), flushed.end(),
                  [](const FlushGroup& a, const FlushGroup& b) {
                      if (a.cell != b.cell) return a.cell < b.cell;
                      return a.next < b.next;
                  });
        out->clear();
        for (FlushGroup& g : flushed) {
            out->insert(out->end(), g.pts.begin(), g.pts.end());
        }
        prof_.t_concat += Profile::now() - t2;
    }

    // one device-deduped level: rows arrive in the device pass's sorted
    // order (cell-grouped) with precomputed keys and batch-winner flags
    // (convert/device.py step 1-2); winners LSM-merge against the stored
    // slot grids (the strict-< displace rule of cell.rs:80), batch losers
    // and displaced incumbents stage through the overflow accounting, and
    // the flushed groups become the next level's input (readable via
    // take_level). Returns the flushed row count, or -1 when a lazy-load
    // error latched. The caller owns batch boundaries: call end_batch()
    // once per outer batch (spill + error check).
    int64_t merge_level(int32_t h, int64_t n, const float* pos,
                        const uint8_t* col, const int32_t* cell_idx,
                        const int32_t* sub_idx, const float* dist,
                        const uint8_t* winner, const int32_t* next_idx,
                        const int32_t* src_in) {
        const size_t m = static_cast<size_t>(n);
        prof_.level_rows += n;
        if (h == 0) prof_.input_rows += n;
        const size_t n_workers = shards_.size();

        std::vector<Point> level(m);
        std::vector<Key3> cidx(m), nidx(m);
        std::vector<int64_t> skey(m);
        const double t0 = Profile::now();
        run_parallel(n_workers, m, [&](size_t lo, size_t hi, size_t) {
            for (size_t i = lo; i < hi; ++i) {
                std::memcpy(level[i].p, pos + 3 * i, 12);
                std::memcpy(level[i].rgba, col + 4 * i, 4);
                cidx[i] = Key3{cell_idx[3 * i], cell_idx[3 * i + 1],
                               cell_idx[3 * i + 2]};
                nidx[i] = Key3{next_idx[3 * i], next_idx[3 * i + 1],
                               next_idx[3 * i + 2]};
                const Key3 sub{sub_idx[3 * i], sub_idx[3 * i + 1],
                               sub_idx[3 * i + 2]};
                int64_t key;
                skey[i] = pack_slot_key(sub, &key) ? key : INT64_MIN;
            }
        });
        prof_.t_keys += Profile::now() - t0;
        return merge_level_core(h, level, cidx, nidx, skey, dist, winner,
                                src_in);
    }

    // fused device-merge entry: consumes the device pass's packed output
    // (perm | winner<<30 | suspect<<29 per sorted row, ops/dedup.py
    // _dedup_light_body) together with the UNSORTED level inputs, and does
    // the permutation gather, the hex-key recompute (bit-identical pchex
    // math — the same kernel hex_keys_native wraps, lockstep-gated at
    // engine construction), and the exact hash-collision re-dedup
    // (ops/dedup.py resolve_suspects_host) in one parallel C++ pass.
    // Replaces convert/native_device.py's NumPy host_rebuild plus three
    // host perm-gathers; byte parity with that path is enforced by the
    // store-comparison suites (tests/test_native_engine.py).
    int64_t merge_level_raw(int32_t h, int64_t n, const float* pos,
                            const uint8_t* col, const int32_t* src_in,
                            const int32_t* packed) {
        const size_t m = static_cast<size_t>(n);
        prof_.level_rows += n;
        if (h == 0) prof_.input_rows += n;
        const float cs = cell_size(h);
        const float next_cs = cs / 2.0f;
        const size_t n_workers = shards_.size();

        std::vector<Point> level(m);
        std::vector<Key3> cidx(m), nidx(m);
        std::vector<int64_t> skey(m);
        std::vector<float> sdist(m);
        std::vector<uint8_t> winner(m);
        std::vector<int32_t> perm(m);
        std::vector<uint8_t> suspect(m);
        std::vector<int32_t> srcv(src_in != nullptr ? m : 0);
        std::atomic<bool> has_suspect{false};
        const double t0 = Profile::now();
        run_parallel(n_workers, m, [&](size_t lo, size_t hi, size_t) {
            const float sub_size = cs / sub_grid_dim_;
            const float radius = sub_size / 2.0f;
            bool any = false;
            for (size_t i = lo; i < hi; ++i) {
                const uint32_t pk = static_cast<uint32_t>(packed[i]);
                const size_t p = pk & ((1u << 29) - 1u);
                perm[i] = static_cast<int32_t>(p);
                winner[i] = static_cast<uint8_t>((pk >> 30) & 1u);
                const uint8_t s = static_cast<uint8_t>((pk >> 29) & 1u);
                suspect[i] = s;
                any |= s != 0;
                std::memcpy(level[i].p, pos + 3 * p, 12);
                std::memcpy(level[i].rgba, col + 4 * p, 4);
                if (src_in != nullptr) srcv[i] = src_in[p];
            }
            size_t i = lo;
#ifdef PC_HEX_SIMD
            alignas(16) float xs[4], ys[4], zs[4];
            const __m128 vcs = _mm_set1_ps(cs);
            const __m128 vncs = _mm_set1_ps(next_cs);
            for (; i + 4 <= hi; i += 4) {
                for (int j = 0; j < 4; ++j) {
                    const Point& pt = level[i + j];
                    xs[j] = pt.p[0];
                    ys[j] = pt.p[1];
                    zs[j] = pt.p[2];
                }
                const __m128 vx = _mm_load_ps(xs);
                const __m128 vy = _mm_load_ps(ys);
                const __m128 vz = _mm_load_ps(zs);
                alignas(16) int32_t cx[4], cy[4], cz[4];
                alignas(16) int32_t nx[4], ny[4], nz[4];
                _mm_store_si128(reinterpret_cast<__m128i*>(cx),
                                pchex::cell_coord_x4(vx, vcs));
                _mm_store_si128(reinterpret_cast<__m128i*>(cy),
                                pchex::cell_coord_x4(vy, vcs));
                _mm_store_si128(reinterpret_cast<__m128i*>(cz),
                                pchex::cell_coord_x4(vz, vcs));
                _mm_store_si128(reinterpret_cast<__m128i*>(nx),
                                pchex::cell_coord_x4(vx, vncs));
                _mm_store_si128(reinterpret_cast<__m128i*>(ny),
                                pchex::cell_coord_x4(vy, vncs));
                _mm_store_si128(reinterpret_cast<__m128i*>(nz),
                                pchex::cell_coord_x4(vz, vncs));
                pchex::HexResultX4 hx;
                pchex::hex_quantize_x4(xs, ys, zs, radius, &hx);
                for (int j = 0; j < 4; ++j) {
                    cidx[i + j] = Key3{cx[j], cy[j], cz[j]};
                    nidx[i + j] = Key3{nx[j], ny[j], nz[j]};
                    const Key3 sub{hx.sub0[j], hx.sub1[j], hx.sub2[j]};
                    int64_t key;
                    skey[i + j] =
                        pack_slot_key(sub, &key) ? key : INT64_MIN;
                    sdist[i + j] = hx.dist[j];
                }
            }
#endif
            for (; i < hi; ++i) {
                const Point& pt = level[i];
                cidx[i] = Key3{pchex::cell_coord(pt.p[0], cs),
                               pchex::cell_coord(pt.p[1], cs),
                               pchex::cell_coord(pt.p[2], cs)};
                nidx[i] = Key3{pchex::cell_coord(pt.p[0], next_cs),
                               pchex::cell_coord(pt.p[1], next_cs),
                               pchex::cell_coord(pt.p[2], next_cs)};
                const pchex::HexResult hr = pchex::hex_quantize(
                    pt.p[0], pt.p[1], pt.p[2], radius);
                const Key3 sub{hr.sub[0], hr.sub[1], hr.sub[2]};
                int64_t key;
                skey[i] = pack_slot_key(sub, &key) ? key : INT64_MIN;
                sdist[i] = hr.dist;
            }
            if (any) has_suspect.store(true, std::memory_order_relaxed);
        });
        const bool audited = audit_runs(cidx, skey, winner, suspect);
        if (audited || has_suspect.load(std::memory_order_relaxed)) {
            resolve_suspects(h, level, cidx, sdist, perm, suspect,
                             winner.data());
        }
        prof_.t_keys += Profile::now() - t0;
        return merge_level_core(
            h, level, cidx, nidx, skey, sdist.data(), winner.data(),
            src_in != nullptr ? srcv.data() : nullptr);
    }

    // exact re-dedup of hash-collision runs, NumPy-identical semantics
    // host-key audit of the device run structure (ops/dedup.py
    // audit_device_runs, round-5 fuzz finding): the on-device audits
    // compare device-recomputed keys, which carry the same backend
    // fma-contraction drift as the sort keys, so a boundary-exact
    // coordinate whose quantization flipped on the device looks
    // self-consistent there. With the exact keys recomputed above:
    // (1) a run boundary (winner flag) must coincide with a true-key
    // change, and (2) no true key may carry two winners (a mis-slotted
    // row forming its own clean run under the wrong hash is invisible
    // to any run-local check). Every row of an affected key becomes
    // suspect; resolve_suspects then re-decides those keys exactly.
    bool audit_runs(const std::vector<Key3>& cidx,
                    const std::vector<int64_t>& skey,
                    const std::vector<uint8_t>& winner,
                    std::vector<uint8_t>& suspect) {
        const size_t m = cidx.size();
        if (m == 0) return false;
        std::vector<uint8_t> bad(m, 0);
        bool any_bad = false;
        for (size_t i = 1; i < m; ++i) {
            const bool change =
                cidx[i] != cidx[i - 1] || skey[i] != skey[i - 1];
            if ((winner[i] != 0) != change) {
                bad[i] = 1;
                bad[i - 1] = 1;
                any_bad = true;
            }
        }
        std::vector<int64_t> wrows;
        wrows.reserve(m / 4);
        for (size_t i = 0; i < m; ++i)
            if (winner[i]) wrows.push_back(static_cast<int64_t>(i));
        std::sort(wrows.begin(), wrows.end(),
                  [&](int64_t a, int64_t b) {
                      if (cidx[a] != cidx[b]) return cidx[a] < cidx[b];
                      return skey[a] < skey[b];
                  });
        for (size_t k = 1; k < wrows.size(); ++k) {
            if (cidx[wrows[k]] == cidx[wrows[k - 1]] &&
                skey[wrows[k]] == skey[wrows[k - 1]]) {
                bad[wrows[k]] = 1;
                bad[wrows[k - 1]] = 1;
                any_bad = true;
            }
        }
        if (!any_bad) return false;
        std::set<std::pair<Key3, int64_t>> conflicted;
        for (size_t i = 0; i < m; ++i)
            if (bad[i]) conflicted.emplace(cidx[i], skey[i]);
        bool extended = false;
        for (size_t i = 0; i < m; ++i) {
            if (!suspect[i] && conflicted.count({cidx[i], skey[i]})) {
                suspect[i] = 1;
                extended = true;
            }
            if (bad[i] && !suspect[i]) {
                suspect[i] = 1;
                extended = true;
            }
        }
        return extended;
    }

    // (ops/dedup.py resolve_suspects_host): suspect rows lexsorted by
    // (cell_idx, sub_idx, dist, arrival); the first row of each distinct
    // 6-int key wins, every other suspect row loses
    void resolve_suspects(int32_t h, const std::vector<Point>& level,
                          const std::vector<Key3>& cidx,
                          const std::vector<float>& dist,
                          const std::vector<int32_t>& perm,
                          const std::vector<uint8_t>& suspect,
                          uint8_t* winner) {
        const float sub_size = cell_size(h) / sub_grid_dim_;
        const float radius = sub_size / 2.0f;
        struct Row {
            Key3 cell;
            Key3 sub;
            float dist;
            int32_t arrival;
            int64_t idx;
        };
        std::vector<Row> rows;
        for (size_t i = 0; i < level.size(); ++i) {
            if (!suspect[i]) continue;
            // suspects are rare (hash-collision runs only): recompute the
            // true sub index here instead of storing it for every row
            const pchex::HexResult hr = pchex::hex_quantize(
                level[i].p[0], level[i].p[1], level[i].p[2], radius);
            rows.push_back(Row{cidx[i],
                               Key3{hr.sub[0], hr.sub[1], hr.sub[2]},
                               dist[i], perm[i],
                               static_cast<int64_t>(i)});
        }
        if (rows.empty()) return;
        // NumPy sort order for floats puts NaN last; a strict weak order
        const auto fless = [](float a, float b) {
            if (a < b) return true;
            return !std::isnan(a) && std::isnan(b);
        };
        std::sort(rows.begin(), rows.end(),
                  [&fless](const Row& a, const Row& b) {
                      if (a.cell != b.cell) return a.cell < b.cell;
                      if (a.sub != b.sub) return a.sub < b.sub;
                      if (fless(a.dist, b.dist)) return true;
                      if (fless(b.dist, a.dist)) return false;
                      return a.arrival < b.arrival;  // unique: total order
                  });
        for (size_t k = 0; k < rows.size(); ++k) {
            const bool first = k == 0 || rows[k].cell != rows[k - 1].cell ||
                               rows[k].sub != rows[k - 1].sub;
            winner[rows[k].idx] = first ? 1 : 0;
        }
    }

    // the shared back half of merge_level / merge_level_raw: owner
    // partition, winner merge + loser staging, overflow flush
    int64_t merge_level_core(int32_t h, std::vector<Point>& level,
                             std::vector<Key3>& cidx,
                             std::vector<Key3>& nidx,
                             std::vector<int64_t>& skey, const float* dist,
                             const uint8_t* winner,
                             const int32_t* src_in) {
        out_level_.clear();
        const size_t m = level.size();
        const float cs = cell_size(h);
        const float next_cs = cs / 2.0f;
        const size_t n_workers = shards_.size();
        const double t0b = Profile::now();

        // owner partition (same as cascade pass B)
        std::vector<uint8_t> own;
        std::vector<int64_t> order;
        std::array<int64_t, 257> offsets{};
        if (n_workers > 1) {
            own.resize(m);
            run_parallel(n_workers, m, [&](size_t lo, size_t hi, size_t) {
                for (size_t i = lo; i < hi; ++i) {
                    own[i] = static_cast<uint8_t>(owner(h, cidx[i]));
                }
            });
            std::array<int64_t, 256> counts{};
            for (size_t i = 0; i < m; ++i) counts[own[i]]++;
            for (size_t t = 0; t < n_workers; ++t) {
                offsets[t + 1] = offsets[t] + counts[t];
            }
            std::array<int64_t, 256> cursor{};
            for (size_t t = 0; t < n_workers; ++t) cursor[t] = offsets[t];
            order.resize(m);
            for (size_t i = 0; i < m; ++i) {
                order[cursor[own[i]]++] = static_cast<int64_t>(i);
            }
        } else {
            offsets[1] = static_cast<int64_t>(m);
        }

        // winner merge + loser staging (pass C variant: only winners
        // probe the slot tables; dist comes from the device, bit-identical
        // to pchex — PERF.md "numerical parity")
        std::vector<std::vector<CellState*>> touched(n_workers);
        run_sharded(n_workers, m, [&](size_t t) {
            constexpr int64_t kPD = 16;  // slot-probe prefetch depth
            const bool direct = n_workers == 1;
            CellState* last_cell = nullptr;
            Key3 last_idx{};
            std::vector<SrcPoint>* last_pending = nullptr;
            Key3 last_pending_key{};
            for (int64_t k = offsets[t]; k < offsets[t + 1]; ++k) {
                const int64_t i = direct ? k : order[k];
                const Point& pt = level[i];
                if (last_cell == nullptr || !(cidx[i] == last_idx)) {
                    last_cell = get_or_create(h, cidx[i]);
                    last_idx = cidx[i];
                    last_pending = nullptr;
                }
                CellState* c = last_cell;
                if (k + kPD < offsets[t + 1]) {
                    const int64_t j = direct ? k + kPD : order[k + kPD];
                    if (winner[j] && skey[j] != INT64_MIN &&
                        cidx[j] == last_idx) {
                        c->slots.prefetch(skey[j]);
                    }
                }
                Point loser;
                Key3 nk;
                int32_t lsrc;
                if (winner[i]) {
                    if (!insert_keyed(c, pt, skey[i], dist[i], &loser)) {
                        continue;  // claimed a vacant slot: no loser
                    }
                    // a displaced incumbent's next index differs from the
                    // newcomer's; recompute only then. Its src is always
                    // foreign: the incumbent was inserted by an earlier
                    // batch or earlier level (one winner per slot per
                    // level), so its row is not in the resident buffer
                    // at this level's identity
                    const bool same =
                        loser.bits(0) == pt.bits(0) &&
                        loser.bits(1) == pt.bits(1) &&
                        loser.bits(2) == pt.bits(2);
                    nk = same
                             ? nidx[i]
                             : Key3{pchex::cell_coord(loser.p[0], next_cs),
                                    pchex::cell_coord(loser.p[1], next_cs),
                                    pchex::cell_coord(loser.p[2], next_cs)};
                    // identical record bits: the newcomer's src serves
                    // (same position -> same device gather)
                    lsrc = same && src_in != nullptr ? src_in[i] : -1;
                } else {
                    loser = pt;  // batch loser: straight to staging
                    nk = nidx[i];
                    lsrc = src_in != nullptr ? src_in[i] : -1;
                }
                if (last_pending != nullptr && nk == last_pending_key) {
                    last_pending->push_back({loser, lsrc});
                    continue;
                }
                auto [it, fresh] = c->pending.try_emplace(nk);
                if (c->pending.size() == 1 && fresh) {
                    touched[t].push_back(c);
                }
                it->second.push_back({loser, lsrc});
                last_pending = &it->second;
                last_pending_key = nk;
            }
        });
        const double t1 = Profile::now();
        prof_.t_insert += t1 - t0b;

        stage_and_flush(touched, m, &out_level_);
        max_level_ = std::max(max_level_, h + 1);
        if (load_error_.load(std::memory_order_acquire)) return -1;
        return static_cast<int64_t>(out_level_.size());
    }

    // copy out (and release) the rows merge_level flushed; ``src`` (when
    // non-null) receives each row's resident-buffer index or -1
    int64_t take_level(float* pos, uint8_t* col, int32_t* src) {
        const int64_t n = static_cast<int64_t>(out_level_.size());
        for (int64_t i = 0; i < n; ++i) {
            std::memcpy(pos + 3 * i, out_level_[i].pt.p, 12);
            std::memcpy(col + 4 * i, out_level_[i].pt.rgba, 4);
            if (src != nullptr) src[i] = out_level_[i].src;
        }
        out_level_.clear();
        out_level_.shrink_to_fit();
        return n;
    }

    // cell.rs:108-153 / core/cell.py add_points_in_overflow, exactly.
    // Persisted groups store plain Points (src dies with the batch); a
    // flush emits [old rows, src=-1] ++ [this level's rows with src].
    void stage_group(CellState* c, const Key3& nidx,
                     std::vector<SrcPoint>&& pts,
                     std::vector<FlushGroup>* flushed) {
        auto it = c->overflow.find(nidx);
        if (it == c->overflow.end()) {
            c->dirty = true;  // both branches add an overflow entry
            if (static_cast<int64_t>(pts.size()) <= limit_) {
                c->total_points += pts.size();
                c->n_overflow += pts.size();
                std::vector<Point> stored;
                stored.reserve(pts.size());
                for (const SrcPoint& sp : pts) stored.push_back(sp.pt);
                c->overflow.emplace(
                    nidx, OverflowGroup{false, std::move(stored)});
            } else {
                c->overflow.emplace(nidx, OverflowGroup{true, {}});
                flushed->push_back({c->idx, nidx, std::move(pts)});
            }
            return;
        }
        OverflowGroup& g = it->second;
        if (g.tombstone) {
            // pass-through: the cell's serialized state is unchanged
            flushed->push_back({c->idx, nidx, std::move(pts)});
            return;
        }
        c->dirty = true;  // append or flush+tombstone below
        const int64_t old_len = static_cast<int64_t>(g.pts.size());
        if (old_len + static_cast<int64_t>(pts.size()) < limit_) {
            c->total_points += pts.size();
            c->n_overflow += pts.size();
            g.pts.reserve(g.pts.size() + pts.size());
            for (const SrcPoint& sp : pts) g.pts.push_back(sp.pt);
        } else {
            c->total_points -= old_len;
            c->n_overflow -= old_len;
            std::vector<SrcPoint> out;
            out.reserve(old_len + pts.size());
            for (const Point& pt : g.pts) out.push_back({pt, -1});
            out.insert(out.end(), pts.begin(), pts.end());
            g.tombstone = true;
            g.pts.clear();
            g.pts.shrink_to_fit();
            flushed->push_back({c->idx, nidx, std::move(out)});
        }
    }

    // --- serialization (core/cell.py to_bytes, byte-identical) ----------

    bool serialize_cell(const CellState& c, std::string* out) const {
        out->clear();
        // header <IiiiIIIfffff (48 bytes)
        auto put = [out](const void* p, size_t n) {
            out->append(static_cast<const char*>(p), n);
        };
        const uint32_t h32 = static_cast<uint32_t>(c.h);
        put(&h32, 4);
        put(c.idx.data(), 12);
        put(&c.total_points, 4);
        put(&c.n_points, 4);
        put(&c.n_overflow, 4);
        put(&c.size, 4);
        put(&c.sub_cell_size, 4);
        put(c.pos, 12);

        // points sorted by sub-grid index (x, y, z): packed int64 key
        // order == Key3 lexicographic order inside the packed range, so
        // the common case is one flat int64 sort; the rare out-of-range
        // rows (std::map, already Key3-sorted) merge in afterwards
        std::vector<std::pair<int64_t, const Point*>> rows;
        rows.reserve(c.slots.size());
        for (size_t i = 0; i < c.slots.capacity(); ++i) {
            if (c.slots.key_at(i) != kEmptyKey) {
                rows.emplace_back(c.slots.key_at(i), &c.slots.pt_at(i));
            }
        }
        std::sort(rows.begin(), rows.end(),
                  [](const auto& a, const auto& b) {
                      return a.first < b.first;
                  });
        if (c.slots_oor.empty()) {
            for (const auto& [key, pt] : rows) put(pt, 16);
        } else {
            auto oit = c.slots_oor.begin();
            const auto oend = c.slots_oor.end();
            for (const auto& [key, pt] : rows) {
                const Key3 sub = unpack_slot_key(key);
                while (oit != oend && oit->first < sub) {
                    put(&oit->second.second, 16);
                    ++oit;
                }
                put(pt, 16);
            }
            for (; oit != oend; ++oit) put(&oit->second.second, 16);
        }

        // overflow entries sorted by key; count is a u8 (codec contract)
        if (c.overflow.size() > 255) return false;
        std::vector<const Key3*> keys;
        keys.reserve(c.overflow.size());
        for (const auto& [k, g] : c.overflow) keys.push_back(&k);
        std::sort(keys.begin(), keys.end(),
                  [](const Key3* a, const Key3* b) { return *a < *b; });
        const uint8_t n_entries = static_cast<uint8_t>(keys.size());
        put(&n_entries, 1);
        for (const Key3* k : keys) {
            const OverflowGroup& g = c.overflow.at(*k);
            put(k->data(), 12);
            const uint32_t len = g.tombstone
                                     ? 0u
                                     : static_cast<uint32_t>(g.pts.size());
            put(&len, 4);
            for (const Point& pt : g.pts) put(&pt, 16);
        }
        return true;
    }

    // --- loading (core/cell.py from_bytes) -------------------------------

    // Parse one cell file into a standalone CellState; the cell only
    // enters the registry on full success (a partial parse must never
    // leave a half-built cell behind — and must never dangle, see the
    // round-2 review's use-after-free finding). When ``expect`` is set,
    // the file's (h, idx) must match it: a mismatched file would
    // otherwise mutate another worker's shard from a pass-C thread.
    std::unique_ptr<CellState> parse_cell(const uint8_t* data, int64_t len,
                                          const CellKey* expect) {
        if (len < 48) return nullptr;
        int64_t off = 0;
        auto get = [&](void* p, size_t n) -> bool {
            if (off + static_cast<int64_t>(n) > len) return false;
            std::memcpy(p, data + off, n);
            off += n;
            return true;
        };
        uint32_t h32, total, n_pts, n_overflow;
        Key3 idx;
        float size, sub, pos[3];
        if (!get(&h32, 4) || !get(idx.data(), 12) || !get(&total, 4) ||
            !get(&n_pts, 4) || !get(&n_overflow, 4) || !get(&size, 4) ||
            !get(&sub, 4) || !get(pos, 12)) {
            return nullptr;
        }
        if (expect != nullptr &&
            !(static_cast<int32_t>(h32) == expect->h &&
              idx == expect->idx)) {
            return nullptr;
        }
        auto cell = std::make_unique<CellState>();
        CellState* c = cell.get();
        c->h = static_cast<int32_t>(h32);
        c->idx = idx;
        c->last_touch = batch_seq_;
        c->size = size;
        c->sub_cell_size = sub;
        c->radius = sub / 2.0f;
        std::memcpy(c->pos, pos, 12);
        c->total_points = total;
        c->n_points = n_pts;
        c->n_overflow = n_overflow;

        // bulk-read the point block, then re-derive slot + distance from
        // the positions (cell.rs:189-195). The quantization runs in SIMD
        // blocks — lazy cell loads during an incremental merge used to
        // spend most of their time in the scalar per-point path here.
        std::vector<Point> pts(n_pts);
        if (n_pts > 0 && !get(pts.data(), 16ull * n_pts)) return nullptr;
        uint32_t i = 0;
        auto claim_point = [c](const Point& pt, const Key3& s, float d) {
            int64_t key;
            if (pack_slot_key(s, &key)) {
                const size_t slot = c->slots.find_or_vacant(key);
                if (c->slots.key_at(slot) == kEmptyKey) {
                    c->slots.claim(slot, key, d, pt);
                }
            } else {
                c->slots_oor.try_emplace(s, d, pt);
            }
        };
#ifdef PC_HEX_SIMD
        alignas(16) float xs[4], ys[4], zs[4];
        for (; i + 4 <= n_pts; i += 4) {
            for (int j = 0; j < 4; ++j) {
                xs[j] = pts[i + j].p[0];
                ys[j] = pts[i + j].p[1];
                zs[j] = pts[i + j].p[2];
            }
            pchex::HexResultX4 hx;
            pchex::hex_quantize_x4(xs, ys, zs, c->radius, &hx);
            for (int j = 0; j < 4; ++j) {
                claim_point(pts[i + j],
                            Key3{hx.sub0[j], hx.sub1[j], hx.sub2[j]},
                            hx.dist[j]);
            }
        }
#endif
        for (; i < n_pts; ++i) {
            const pchex::HexResult hr = pchex::hex_quantize(
                pts[i].p[0], pts[i].p[1], pts[i].p[2], c->radius);
            claim_point(pts[i], Key3{hr.sub[0], hr.sub[1], hr.sub[2]},
                        hr.dist);
        }
        uint8_t n_entries;
        if (!get(&n_entries, 1)) return nullptr;
        for (uint8_t i = 0; i < n_entries; ++i) {
            Key3 k;
            uint32_t count;
            if (!get(k.data(), 12) || !get(&count, 4)) return nullptr;
            OverflowGroup g;
            if (count == 0) {
                g.tombstone = true;
            } else {
                g.pts.resize(count);
                if (!get(g.pts.data(), 16ull * count)) return nullptr;
            }
            c->overflow.emplace(k, std::move(g));
        }
        c->dirty = false;  // serializes back to exactly these bytes
        return cell;
    }

    // C-ABI initial load (single-threaded callers): keyed by the file's
    // own header; replaces any resident cell with that key. Marked dirty:
    // the bytes came from the caller, not necessarily from this store's
    // cell file, so save_all must not skip the write.
    bool load_cell(const uint8_t* data, int64_t len) {
        auto cell = parse_cell(data, len, nullptr);
        if (!cell) return false;
        cell->dirty = true;
        const CellKey key{cell->h, cell->idx};
        shards_[owner(key.h, key.idx)][key] = std::move(cell);
        return true;
    }

    // --- store writing ----------------------------------------------------

    int64_t save_all(const std::string& dir, int n_threads) {
        if (load_error_.load(std::memory_order_acquire)) {
            return -1;  // never overwrite a store we failed to read
        }
        const double t0 = Profile::now();
        std::vector<CellState*> cells;
        int32_t max_h = -1;
        for (const auto& shard : shards_) {
            for (const auto& [key, cell] : shard) {
                cells.push_back(cell.get());
                max_h = std::max(max_h, key.h);
            }
        }
        for (int32_t h = 0; h <= max_h; ++h) {
            const std::string d = dir + "/h_" + std::to_string(h);
            ::mkdir(d.c_str(), 0777);  // EEXIST is fine
        }
        std::atomic<int64_t> errors{0};
        std::atomic<size_t> next{0};
        auto worker = [&] {
            std::string buf;
            for (;;) {
                const size_t i = next.fetch_add(1);
                if (i >= cells.size()) return;
                CellState& c = *cells[i];
                if (!c.dirty) continue;  // file already holds these bytes
                if (!serialize_cell(c, &buf)) {
                    errors.fetch_add(1);
                    continue;
                }
                const std::string path =
                    dir + "/h_" + std::to_string(c.h) + "/c_" +
                    std::to_string(c.idx[0]) + "_" +
                    std::to_string(c.idx[1]) + "_" +
                    std::to_string(c.idx[2]) + ".bin";
                if (!pcio::atomic_write_file(path, buf.data(),
                                             buf.size())) {
                    errors.fetch_add(1);
                } else {
                    c.dirty = false;
                }
            }
        };
        if (n_threads <= 1 || cells.size() < 16) {
            worker();
        } else {
            std::vector<std::thread> threads;
            for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
            for (auto& t : threads) t.join();
        }
        prof_.t_save += Profile::now() - t0;
        return errors.load();
    }

    int32_t max_level() const { return max_level_; }
    int64_t num_cells() const {
        int64_t n = 0;
        for (const auto& shard : shards_) n += shard.size();
        return n;
    }

    ~Engine() { prof_.dump(); }

  private:
    int64_t limit_;
    float max_cell_size_;
    float sub_grid_dim_;
    int32_t max_level_ = 0;
    std::string store_dir_;
    int64_t cell_budget_ = -1;  // < 0: unlimited (keep all cells in RAM)
    uint64_t batch_seq_ = 0;
    int64_t spill_errors_ = 0;
    std::vector<SrcPoint> out_level_;  // merge_level -> take_level handoff
    std::atomic<bool> load_error_{false};
    Profile prof_;
    // the cell registry, sharded by deterministic ownership so insert
    // workers never contend (and never rehash each other's tables)
    std::vector<
        std::unordered_map<CellKey, std::unique_ptr<CellState>, CellKeyHash>>
        shards_;
};

}  // namespace

extern "C" {

void* pc_engine_create(int64_t overflow_limit, float max_cell_size,
                       int sub_grid_dim, int n_threads) {
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 64) n_threads = 64;  // owner fits a uint8 shard id
    return new Engine(overflow_limit, max_cell_size, sub_grid_dim,
                      n_threads);
}

void pc_engine_destroy(void* e) { delete static_cast<Engine*>(e); }

int32_t pc_engine_add_batch(void* e, const float* pos, const uint8_t* col,
                            int64_t n) {
    return static_cast<Engine*>(e)->add_batch(pos, col, n);
}

int pc_engine_load_cell(void* e, const uint8_t* data, int64_t len) {
    return static_cast<Engine*>(e)->load_cell(data, len) ? 0 : 1;
}

int64_t pc_engine_save_all(void* e, const char* dir, int n_threads) {
    return static_cast<Engine*>(e)->save_all(dir, n_threads);
}

int32_t pc_engine_max_level(void* e) {
    return static_cast<Engine*>(e)->max_level();
}

int64_t pc_engine_num_cells(void* e) {
    return static_cast<Engine*>(e)->num_cells();
}

void pc_engine_set_spill(void* e, const char* dir, int64_t budget) {
    static_cast<Engine*>(e)->set_spill(dir, budget);
}

int32_t pc_engine_cascade_from(void* e, int32_t h, const float* pos,
                               const uint8_t* col, int64_t n) {
    return static_cast<Engine*>(e)->cascade_from(h, pos, col, n);
}

int64_t pc_engine_merge_level(void* e, int32_t h, int64_t n,
                              const float* pos, const uint8_t* col,
                              const int32_t* cell_idx,
                              const int32_t* sub_idx, const float* dist,
                              const uint8_t* winner,
                              const int32_t* next_idx,
                              const int32_t* src_in) {
    return static_cast<Engine*>(e)->merge_level(
        h, n, pos, col, cell_idx, sub_idx, dist, winner, next_idx, src_in);
}

int64_t pc_engine_merge_level_raw(void* e, int32_t h, int64_t n,
                                  const float* pos, const uint8_t* col,
                                  const int32_t* src_in,
                                  const int32_t* packed) {
    return static_cast<Engine*>(e)->merge_level_raw(h, n, pos, col, src_in,
                                                    packed);
}

int64_t pc_engine_take_level(void* e, float* pos, uint8_t* col,
                             int32_t* src) {
    return static_cast<Engine*>(e)->take_level(pos, col, src);
}

int32_t pc_engine_end_batch(void* e) {
    return static_cast<Engine*>(e)->end_batch();
}

int64_t pc_engine_spill_errors(void* e) {
    return static_cast<Engine*>(e)->spill_errors();
}

}  // extern "C"
