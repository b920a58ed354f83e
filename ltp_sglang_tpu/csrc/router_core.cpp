// C++ router core: concurrent-prompt radix tree for cache-aware routing
// plus per-worker load counters and PD pairing selection.
//
// Native-parity component for the reference's sgl-router (Rust):
//   src/tree.rs (1483 LoC)            -> the byte-radix tree below
//   src/policies/cache_aware.rs:399   -> rc_select (threshold + balance)
//   src/routers/pd_router.rs select_worker_pair -> rc_select_pair
// Exposed through a C ABI consumed via ctypes (no pybind11 in this image);
// wrapped by ltp_sglang_tpu/router/router_core.py. The Python front door
// (aiohttp proxy, health checks, worker registry) stays in router/router.py —
// the hot per-request work (prefix match over the recent-prompt tree, LRU
// maintenance, pair selection) runs here.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <unordered_map>
#include <vector>

namespace {

using u8 = uint8_t;
using i64 = int64_t;

struct Node {
    Node* parent = nullptr;
    std::map<u8, Node*> children;  // keyed by first byte of the edge
    std::vector<u8> key;
    // worker id -> last access tick for this prefix on that worker.
    std::unordered_map<int, i64> workers;
    i64 last_access = 0;
};

struct Core {
    Node root;
    i64 clock = 0;
    i64 node_count = 0;  // excluding root
    i64 max_nodes = 1 << 16;
    // worker id -> inflight load (owned here so selection is one call).
    std::unordered_map<int, i64> load;
    std::unordered_map<int, bool> healthy;

    i64 tick() { return ++clock; }
};

size_t match_len(const std::vector<u8>& a, const u8* b, size_t nb) {
    size_t n = std::min(a.size(), nb);
    size_t i = 0;
    while (i < n && a[i] == b[i]) i++;
    return i;
}

void free_subtree(Node* n) {
    for (auto& kv : n->children) {
        free_subtree(kv.second);
        delete kv.second;
    }
    n->children.clear();
}

Node* split(Core* c, Node* child, size_t at) {
    Node* mid = new Node();
    mid->parent = child->parent;
    mid->key.assign(child->key.begin(), child->key.begin() + at);
    mid->workers = child->workers;
    mid->last_access = child->last_access;
    mid->parent->children[mid->key[0]] = mid;
    child->key.erase(child->key.begin(), child->key.begin() + at);
    child->parent = mid;
    mid->children[child->key[0]] = child;
    c->node_count++;
    return mid;
}

void collect_leaves(Node* n, std::vector<Node*>& out) {
    if (n->children.empty()) {
        out.push_back(n);
        return;
    }
    for (auto& kv : n->children) collect_leaves(kv.second, out);
}

void evict_to(Core* c, i64 target) {
    while (c->node_count > target) {
        std::vector<Node*> leaves;
        collect_leaves(&c->root, leaves);
        if (leaves.empty() || (leaves.size() == 1 && leaves[0] == &c->root))
            return;
        std::sort(leaves.begin(), leaves.end(),
                  [](Node* a, Node* b) { return a->last_access < b->last_access; });
        i64 removed = 0;
        for (Node* n : leaves) {
            if (n == &c->root || c->node_count <= target) break;
            n->parent->children.erase(n->key[0]);
            delete n;
            c->node_count--;
            removed++;
        }
        if (!removed) return;
    }
}

}  // namespace

extern "C" {

void* rc_new(i64 max_nodes) {
    Core* c = new Core();
    if (max_nodes > 0) c->max_nodes = max_nodes;
    return c;
}

void rc_free(void* h) {
    Core* c = (Core*)h;
    free_subtree(&c->root);
    delete c;
}

void rc_add_worker(void* h, int worker) {
    Core* c = (Core*)h;
    c->load.emplace(worker, 0);
    c->healthy[worker] = true;
}

// Drop a worker: clears its load and scrubs it from the tree.
void rc_remove_worker_rec(Node* n, int worker) {
    n->workers.erase(worker);
    for (auto& kv : n->children) rc_remove_worker_rec(kv.second, worker);
}

void rc_remove_worker(void* h, int worker) {
    Core* c = (Core*)h;
    c->load.erase(worker);
    c->healthy.erase(worker);
    rc_remove_worker_rec(&c->root, worker);
}

void rc_set_health(void* h, int worker, int ok) {
    Core* c = (Core*)h;
    auto it = c->healthy.find(worker);
    if (it != c->healthy.end()) it->second = (ok != 0);
}

void rc_load_add(void* h, int worker, i64 delta) {
    Core* c = (Core*)h;
    auto it = c->load.find(worker);
    if (it != c->load.end()) it->second += delta;
}

i64 rc_get_load(void* h, int worker) {
    Core* c = (Core*)h;
    auto it = c->load.find(worker);
    return it == c->load.end() ? -1 : it->second;
}

// Record that `worker` served a prompt with this byte key.
void rc_insert(void* h, const u8* key, i64 len, int worker) {
    Core* c = (Core*)h;
    i64 now = c->tick();
    Node* cur = &c->root;
    i64 pos = 0;
    cur->last_access = now;
    while (pos < len) {
        auto it = cur->children.find(key[pos]);
        if (it == cur->children.end()) {
            Node* n = new Node();
            n->parent = cur;
            n->key.assign(key + pos, key + len);
            n->workers[worker] = now;
            n->last_access = now;
            cur->children[key[pos]] = n;
            c->node_count++;
            break;
        }
        Node* child = it->second;
        size_t m = match_len(child->key, key + pos, (size_t)(len - pos));
        if (m < child->key.size()) child = split(c, child, m);
        child->workers[worker] = now;
        child->last_access = now;
        cur = child;
        pos += (i64)m;
    }
    if (c->node_count > c->max_nodes) evict_to(c, c->max_nodes * 3 / 4);
}

// Longest prefix match: returns matched length for the best worker and sets
// *worker (healthy workers only; ties broken by most-recent access).
i64 rc_best_match(void* h, const u8* key, i64 len, int* worker) {
    Core* c = (Core*)h;
    Node* cur = &c->root;
    i64 pos = 0;
    // best per worker: (depth, tick)
    std::unordered_map<int, std::pair<i64, i64>> best;
    while (pos < len) {
        auto it = cur->children.find(key[pos]);
        if (it == cur->children.end()) break;
        Node* child = it->second;
        size_t m = match_len(child->key, key + pos, (size_t)(len - pos));
        if (m == 0) break;
        pos += (i64)m;
        for (auto& wkv : child->workers) {
            auto h2 = c->healthy.find(wkv.first);
            if (h2 == c->healthy.end() || !h2->second) continue;
            auto& slot = best[wkv.first];
            if (pos > slot.first) slot = {pos, wkv.second};
        }
        if (m < child->key.size()) break;
        cur = child;
    }
    i64 best_len = 0, best_tick = -1;
    int best_w = -1;
    for (auto& kv : best) {
        if (kv.second.first > best_len ||
            (kv.second.first == best_len && kv.second.second > best_tick)) {
            best_len = kv.second.first;
            best_tick = kv.second.second;
            best_w = kv.first;
        }
    }
    *worker = best_w;
    return best_len;
}

// Cache-aware selection (cache_aware.rs semantics): prefer the longest-
// prefix worker when the match is meaningful (>= min_match bytes) AND its
// load is within balance_abs_threshold of the least-loaded worker;
// otherwise route to the least-loaded healthy worker.
int rc_select(void* h, const u8* key, i64 len, i64 min_match,
              i64 balance_abs_threshold) {
    Core* c = (Core*)h;
    int least = -1;
    i64 least_load = INT64_MAX;
    for (auto& kv : c->load) {
        auto h2 = c->healthy.find(kv.first);
        if (h2 == c->healthy.end() || !h2->second) continue;
        if (kv.second < least_load) {
            least_load = kv.second;
            least = kv.first;
        }
    }
    if (least < 0) return -1;
    int w = -1;
    i64 m = rc_best_match(h, key, len, &w);
    if (w >= 0 && m >= min_match) {
        i64 wl = c->load.count(w) ? c->load[w] : INT64_MAX;
        if (wl - least_load <= balance_abs_threshold) return w;
    }
    return least;
}

// PD pairing (pd_router.rs select_worker_pair): prefill picked cache-aware
// over the prefill worker-id set, decode picked least-loaded over the
// decode set. Worker ids are namespaced by the caller (prefill ids and
// decode ids are disjoint). Returns 0 on success.
int rc_select_pair(void* h, const u8* key, i64 len,
                   const int* prefill_ids, i64 np,
                   const int* decode_ids, i64 nd,
                   i64 min_match, i64 balance_abs_threshold,
                   int* out_prefill, int* out_decode) {
    Core* c = (Core*)h;
    *out_prefill = -1;
    *out_decode = -1;
    // decode: least loaded healthy
    i64 best_load = INT64_MAX;
    for (i64 i = 0; i < nd; i++) {
        int wid = decode_ids[i];
        auto hh = c->healthy.find(wid);
        if (hh == c->healthy.end() || !hh->second) continue;
        i64 l = c->load.count(wid) ? c->load[wid] : 0;
        if (l < best_load) {
            best_load = l;
            *out_decode = wid;
        }
    }
    // prefill: cache-aware restricted to prefill_ids
    int w = -1;
    i64 m = rc_best_match(h, key, len, &w);
    bool w_is_prefill = false;
    for (i64 i = 0; i < np; i++) w_is_prefill |= (prefill_ids[i] == w);
    i64 least_load = INT64_MAX;
    int least = -1;
    for (i64 i = 0; i < np; i++) {
        int wid = prefill_ids[i];
        auto hh = c->healthy.find(wid);
        if (hh == c->healthy.end() || !hh->second) continue;
        i64 l = c->load.count(wid) ? c->load[wid] : 0;
        if (l < least_load) {
            least_load = l;
            least = wid;
        }
    }
    if (w >= 0 && w_is_prefill && m >= min_match) {
        i64 wl = c->load.count(w) ? c->load[w] : INT64_MAX;
        if (wl - least_load <= balance_abs_threshold) {
            *out_prefill = w;
        }
    }
    if (*out_prefill < 0) *out_prefill = least;
    return (*out_prefill >= 0 && *out_decode >= 0) ? 0 : 1;
}

i64 rc_node_count(void* h) { return ((Core*)h)->node_count; }

}  // extern "C"
