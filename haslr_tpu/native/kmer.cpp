// Native canonical k-mer counter (the minia counting stage,
// reference bin/haslr.py:180) — host-side production path.
//
// Why native-host rather than the device counter: on this deployment the
// TPU sits behind a relay whose D2H bandwidth (~2-30 MB/s) and per-
// program first-call overhead (minutes) dwarf the counting work, and
// XLA's variadic multi-key sort (the only way to sort >64-bit keys on a
// 32-bit-lane TPU) measures ~50 s for one 2^27-row merge — while a host
// open-addressing hash counts the same stream in seconds and the reads
// ORIGINATE host-side anyway.  The streaming device counter
// (kernels/kmer_stream.py) remains the multi-chip scale path; this is
// the single-host fast path, same output contract (sorted canonical
// (hi, lo, count), count >= min_count).
//
// Layout matches kernels/kmer.count_kmers_host: a k-mer's first
// (k - k_lo) bases live in `hi`, its last k_lo = min(k, 32) bases in
// `lo`, 2 bits per base, first base most significant within its word.
//
// Threading: every worker scans the whole read stream with an O(1)
// rolling canonical update but inserts only k-mers whose mixed hash
// lands in its shard — no locks, no shared state; shards concatenate
// and one final sort restores the global order.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

namespace {

struct K128 {
    uint64_t hi, lo;
    bool operator<(const K128& o) const {
        return hi != o.hi ? hi < o.hi : lo < o.lo;
    }
    bool operator==(const K128& o) const {
        return hi == o.hi && lo == o.lo;
    }
};

// splitmix-style mix of the 128-bit key
static inline uint64_t mix_hash(uint64_t hi, uint64_t lo) {
    uint64_t x = hi * 0x9E3779B97F4A7C15ULL ^ lo;
    x ^= x >> 30; x *= 0xBF58476D1CE4E5B9ULL;
    x ^= x >> 27; x *= 0x94D049BB133111EBULL;
    x ^= x >> 31;
    return x;
}

struct HashTable {
    // open addressing, linear probing; empty slot: count == 0
    std::vector<K128> keys;
    std::vector<uint32_t> counts;
    size_t mask = 0, used = 0;

    void init(size_t cap_pow2) {
        keys.assign(cap_pow2, K128{0, 0});
        counts.assign(cap_pow2, 0);
        mask = cap_pow2 - 1;
        used = 0;
    }
    void grow() {
        std::vector<K128> ok; ok.swap(keys);
        std::vector<uint32_t> oc; oc.swap(counts);
        init((mask + 1) * 2);
        for (size_t i = 0; i < ok.size(); i++) {
            if (oc[i]) insert_counted(ok[i], oc[i]);
        }
    }
    inline void insert_counted(K128 key, uint32_t c) {
        size_t pos = mix_hash(key.hi, key.lo) & mask;
        for (;;) {
            if (counts[pos] == 0) {
                keys[pos] = key; counts[pos] = c; used++;
                return;
            }
            if (keys[pos] == key) { counts[pos] += c; return; }
            pos = (pos + 1) & mask;
        }
    }
    inline void add(K128 key) {
        if (used * 10 >= (mask + 1) * 7) grow();
        insert_counted(key, 1);
    }
};

struct CountResult {
    std::vector<uint64_t> hi, lo;
    std::vector<uint32_t> cnt;
};

void count_shard(const uint8_t* codes, const uint64_t* offsets,
                 uint64_t n_reads, int k, int tid, int n_threads,
                 HashTable* table) {
    const int k_lo = k < 32 ? k : 32;
    const int k_hi = k - k_lo;
    const uint64_t mask_lo =
        k_lo == 32 ? ~0ULL : ((1ULL << (2 * k_lo)) - 1);
    const uint64_t mask_hi =
        k_hi == 0 ? 0
        : (k_hi == 32 ? ~0ULL : ((1ULL << (2 * k_hi)) - 1));
    const int lo_top_shift = 2 * (k_lo - 1);   // position of lo's first base
    const int hi_top_shift = k_hi ? 2 * (k_hi - 1) : 0;
    table->init(1 << 16);
    for (uint64_t r = 0; r < n_reads; r++) {
        const uint64_t beg = offsets[r], end = offsets[r + 1];
        if (end - beg < (uint64_t)k) continue;
        uint64_t fhi = 0, flo = 0;     // forward key
        uint64_t rhi = 0, rlo = 0;     // reverse complement key
        int filled = 0;
        for (uint64_t p = beg; p < end; p++) {
            const uint64_t b = codes[p] & 3;
            // forward: shift left, push b at the bottom of lo; lo's
            // overflow base moves into hi's bottom
            fhi = ((fhi << 2) | (flo >> lo_top_shift)) & mask_hi;
            flo = ((flo << 2) | b) & mask_lo;
            // reverse complement: shift right, push ~b at the TOP of
            // hi (or lo when k <= 32)
            const uint64_t cb = 3 - b;
            if (k_hi) {
                rlo = (rlo >> 2) | ((rhi & 3) << lo_top_shift);
                rhi = (rhi >> 2) | (cb << hi_top_shift);
            } else {
                rlo = (rlo >> 2) | (cb << lo_top_shift);
            }
            if (++filled < k) continue;
            // canonical = min(forward, rc)
            K128 key;
            if (rhi < fhi || (rhi == fhi && rlo < flo)) {
                key = {rhi, rlo};
            } else {
                key = {fhi, flo};
            }
            if (n_threads > 1) {
                const uint64_t h = mix_hash(key.hi, key.lo);
                if ((int)((h >> 48) % (uint64_t)n_threads) != tid)
                    continue;
            }
            table->add(key);
        }
    }
}

}  // namespace

extern "C" {

void* hx_kmer_count(const uint8_t* codes, const uint64_t* offsets,
                    uint64_t n_reads, int k, uint32_t min_count,
                    int n_threads) {
    if (k < 1 || k > 64) return nullptr;
    if (n_threads < 1) n_threads = 1;
    std::vector<HashTable> tables(n_threads);
    std::vector<std::thread> threads;
    for (int t = 1; t < n_threads; t++) {
        threads.emplace_back(count_shard, codes, offsets, n_reads, k, t,
                             n_threads, &tables[t]);
    }
    count_shard(codes, offsets, n_reads, k, 0, n_threads, &tables[0]);
    for (auto& th : threads) th.join();

    size_t total = 0;
    for (auto& t : tables) {
        for (size_t i = 0; i < t.counts.size(); i++) {
            if (t.counts[i] >= min_count) total++;
        }
    }
    std::vector<std::pair<K128, uint32_t>> rows;
    rows.reserve(total);
    for (auto& t : tables) {
        for (size_t i = 0; i < t.counts.size(); i++) {
            if (t.counts[i] >= min_count)
                rows.emplace_back(t.keys[i], t.counts[i]);
        }
        t.keys.clear(); t.keys.shrink_to_fit();
        t.counts.clear(); t.counts.shrink_to_fit();
    }
    std::sort(rows.begin(), rows.end(),
              [](const auto& a, const auto& b) { return a.first < b.first; });

    auto* res = new CountResult();
    res->hi.reserve(rows.size());
    res->lo.reserve(rows.size());
    res->cnt.reserve(rows.size());
    for (auto& r : rows) {
        res->hi.push_back(r.first.hi);
        res->lo.push_back(r.first.lo);
        res->cnt.push_back(r.second);
    }
    return res;
}

// K-way merge of per-shard sorted (hi, lo, count) streams — the
// multi-host SR counting merge (kernels/kmer.py::merge_kmer_counts
// semantics: counts of equal canonical k-mers sum, the abundance filter
// applies AFTER summation).  Shards arrive concatenated with
// ``part_off`` (n_parts + 1) row offsets; each shard is sorted by
// (hi, lo), so a cursor-per-shard min scan emits the globally sorted
// distinct stream in one pass — no re-sort of the concatenation (the
// numpy lexsort this replaces was most of the merge's cost).
void* hx_kmer_merge(const uint64_t* hi, const uint64_t* lo,
                    const int64_t* cnt, const uint64_t* part_off,
                    uint64_t n_parts, uint32_t min_count) {
    auto* res = new CountResult();
    std::vector<uint64_t> cur(n_parts);
    for (uint64_t p = 0; p < n_parts; p++) cur[p] = part_off[p];
    for (;;) {
        bool have = false;
        uint64_t bh = 0, bl = 0;
        for (uint64_t p = 0; p < n_parts; p++) {
            if (cur[p] >= part_off[p + 1]) continue;
            uint64_t h = hi[cur[p]], l = lo[cur[p]];
            if (!have || h < bh || (h == bh && l < bl)) {
                bh = h;
                bl = l;
                have = true;
            }
        }
        if (!have) break;
        int64_t total = 0;
        for (uint64_t p = 0; p < n_parts; p++) {
            uint64_t c = cur[p];
            if (c < part_off[p + 1] && hi[c] == bh && lo[c] == bl) {
                total += cnt[c];
                cur[p] = c + 1;
            }
        }
        if (total >= (int64_t)min_count) {
            res->hi.push_back(bh);
            res->lo.push_back(bl);
            res->cnt.push_back((uint32_t)std::min<int64_t>(
                total, 0xFFFFFFFFll));
        }
    }
    return res;
}

uint64_t hx_kmer_n(void* h) {
    return ((CountResult*)h)->hi.size();
}
const uint64_t* hx_kmer_hi(void* h) { return ((CountResult*)h)->hi.data(); }
const uint64_t* hx_kmer_lo(void* h) { return ((CountResult*)h)->lo.data(); }
const uint32_t* hx_kmer_cnt(void* h) {
    return ((CountResult*)h)->cnt.data();
}
void hx_kmer_free(void* h) { delete (CountResult*)h; }

}  // extern "C"
