// Native block pool: LRU free queue + prefix-cache index.
//
// C++ twin of core/block_pool.py (itself the TPU redesign of the
// reference's Block/FreeBlockQueue/BlockPool, 02_kvcache/block_pool_lru.py:
// 13-244).  The scheduler calls allocate/free/touch/lookup thousands of
// times per second on the host while the TPU runs the step — this is the
// framework's hot host-side path, so it gets a native implementation:
//
// - intrusive array-backed doubly-linked LRU list (no allocation after
//   construction), O(1) popleft/append/remove;
// - prefix-cache index: 32-byte chained-SHA256 digest -> insertion-ordered
//   list of physical copies (the reference's Block-or-dict entry,
//   block_pool_lru.py:115);
// - identical behavioral contract, verified by randomized equivalence tests
//   against the Python pool (tests/test_native_pool.py).
//
// Exposed as a C ABI for ctypes (no pybind11 in this toolchain).

#include <array>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

using Hash = std::array<uint8_t, 32>;

struct HashHasher {
  size_t operator()(const Hash& h) const {
    uint64_t v;
    std::memcpy(&v, h.data(), sizeof(v));  // digests are uniform; 8 bytes suffice
    return static_cast<size_t>(v);
  }
};

constexpr int kNull = -1;

struct BlockPool {
  int num_blocks;
  bool enable_caching;
  int sentinel;

  std::vector<int> next_, prev_;
  std::vector<uint8_t> in_queue;
  int num_free = 0;

  std::vector<int> ref_cnt;
  std::vector<uint8_t> has_hash;
  std::vector<Hash> block_hash;
  // hash -> insertion-ordered physical copies holding that content.
  std::unordered_map<Hash, std::vector<int>, HashHasher> cached;

  explicit BlockPool(int n, bool caching)
      : num_blocks(n), enable_caching(caching), sentinel(n) {
    next_.assign(n + 1, kNull);
    prev_.assign(n + 1, kNull);
    next_[sentinel] = sentinel;
    prev_[sentinel] = sentinel;
    in_queue.assign(n, 0);
    ref_cnt.assign(n, 0);
    has_hash.assign(n, 0);
    block_hash.assign(n, Hash{});
    for (int i = 0; i < n; ++i) q_append(i);
    // null block: id 0, pinned forever (block_pool_lru.py:118-119)
    q_remove(0);
    ref_cnt[0] = 1;
  }

  void q_append(int id) {
    int last = prev_[sentinel];
    next_[last] = id;
    prev_[id] = last;
    next_[id] = sentinel;
    prev_[sentinel] = id;
    in_queue[id] = 1;
    ++num_free;
  }

  void q_remove(int id) {
    int p = prev_[id], nx = next_[id];
    next_[p] = nx;
    prev_[nx] = p;
    next_[id] = prev_[id] = kNull;
    in_queue[id] = 0;
    --num_free;
  }

  void evict_cached(int id) {
    if (!has_hash[id]) return;
    has_hash[id] = 0;
    auto it = cached.find(block_hash[id]);
    if (it == cached.end()) return;
    auto& v = it->second;
    for (size_t i = 0; i < v.size(); ++i) {
      if (v[i] == id) {
        v.erase(v.begin() + i);
        break;
      }
    }
    if (v.empty()) cached.erase(it);
  }

  int get_new_blocks(int n, int* out) {
    if (n > num_free) return -1;  // OOM
    for (int i = 0; i < n; ++i) {
      int id = next_[sentinel];
      q_remove(id);
      evict_cached(id);
      ref_cnt[id] = 1;
      out[i] = id;
    }
    return 0;
  }

  void touch(const int* ids, int n) {
    for (int i = 0; i < n; ++i) {
      int id = ids[i];
      if (ref_cnt[id] == 0 && id != 0) q_remove(id);
      ++ref_cnt[id];
    }
  }

  int free_blocks(const int* ids, int n) {
    for (int i = 0; i < n; ++i) {
      if (ref_cnt[ids[i]] <= 0) return -1;  // double free
      --ref_cnt[ids[i]];
    }
    for (int i = 0; i < n; ++i) {
      int id = ids[i];
      if (ref_cnt[id] == 0 && id != 0) q_append(id);
    }
    return 0;
  }

  long get_cached_block(const uint8_t* h) const {
    Hash key;
    std::memcpy(key.data(), h, 32);
    auto it = cached.find(key);
    if (it == cached.end() || it->second.empty()) return -1;
    return it->second.front();
  }

  void cache_full_blocks(const int* ids, const uint8_t* hashes,
                         int num_cached, int num_full) {
    if (!enable_caching) return;
    for (int i = num_cached; i < num_full; ++i) {
      int id = ids[i];
      if (has_hash[id]) continue;  // already cached (shared hit)
      Hash key;
      std::memcpy(key.data(), hashes + 32 * i, 32);
      block_hash[id] = key;
      has_hash[id] = 1;
      cached[key].push_back(id);
    }
  }

  int reset_prefix_cache() {
    if (num_free < num_blocks - 1) return 0;  // blocks still held
    cached.clear();
    std::fill(has_hash.begin(), has_hash.end(), 0);
    return 1;
  }

  // Chained prefix lookup: ids of the longest cached prefix of `hashes`
  // (n x 32 bytes), stopping at the first miss.  One ctypes crossing for
  // the scheduler's hottest query (KVCacheManager.get_computed_blocks).
  int lookup_prefix(const uint8_t* hashes, int n, int* out) const {
    Hash key;
    for (int i = 0; i < n; ++i) {
      std::memcpy(key.data(), hashes + 32 * i, 32);
      auto it = cached.find(key);
      if (it == cached.end() || it->second.empty()) return i;
      out[i] = it->second.front();
    }
    return n;
  }

  int order(int* out) const {  // LRU -> MRU (test/debug helper)
    int n = 0;
    for (int cur = next_[sentinel]; cur != sentinel; cur = next_[cur]) out[n++] = cur;
    return n;
  }
};

}  // namespace

extern "C" {

void* bp_create(int num_blocks, int enable_caching) {
  return new BlockPool(num_blocks, enable_caching != 0);
}
void bp_destroy(void* p) { delete static_cast<BlockPool*>(p); }
int bp_num_free(void* p) { return static_cast<BlockPool*>(p)->num_free; }
int bp_get_new_blocks(void* p, int n, int* out) {
  return static_cast<BlockPool*>(p)->get_new_blocks(n, out);
}
void bp_touch(void* p, const int* ids, int n) {
  static_cast<BlockPool*>(p)->touch(ids, n);
}
int bp_free_blocks(void* p, const int* ids, int n) {
  return static_cast<BlockPool*>(p)->free_blocks(ids, n);
}
long bp_get_cached_block(void* p, const uint8_t* hash32) {
  return static_cast<BlockPool*>(p)->get_cached_block(hash32);
}
void bp_cache_full_blocks(void* p, const int* ids, const uint8_t* hashes,
                          int num_cached, int num_full) {
  static_cast<BlockPool*>(p)->cache_full_blocks(ids, hashes, num_cached, num_full);
}
int bp_reset_prefix_cache(void* p) {
  return static_cast<BlockPool*>(p)->reset_prefix_cache();
}
int bp_ref_cnt(void* p, int id) { return static_cast<BlockPool*>(p)->ref_cnt[id]; }
int bp_order(void* p, int* out) { return static_cast<BlockPool*>(p)->order(out); }
int bp_lookup_prefix(void* p, const uint8_t* hashes, int n, int* out) {
  return static_cast<BlockPool*>(p)->lookup_prefix(hashes, n, out);
}

}  // extern "C"
