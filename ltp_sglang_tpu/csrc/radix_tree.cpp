// C++ radix tree over token sequences -> KV slot indices.
//
// Native-parity component for the reference's mem_cache/cpp_radix_tree/
// tree_v2.cpp (990 LoC, pybind11): lower CPU overhead than the Python tree
// for long keys and large vocabularies. Exposed through a C ABI consumed via
// ctypes (this image has no pybind11), wrapped by
// mem_cache/radix_cache_cpp.py with the exact RadixCache interface.
//
// Semantics mirror ltp_sglang_tpu/mem_cache/radix_cache.py (which itself
// ports the reference's radix_cache.py algorithm): node split on partial
// match, insert dedup returning the pre-existing prefix length, leaves-first
// LRU eviction skipping lock_ref>0, lock refcounts propagated to ancestors.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <queue>
#include <vector>

namespace {

using i32 = int32_t;
using i64 = int64_t;

struct Node {
    Node* parent = nullptr;
    std::map<i32, Node*> children;  // keyed by first token of edge
    std::vector<i32> key;
    std::vector<i32> value;  // kv slot ids, same length as key
    int lock_ref = 0;
    i64 last_access = 0;
};

struct Tree {
    Node root;
    i64 clock = 0;
    i64 evictable = 0;
    i64 protected_ = 0;
    int page_size = 1;

    i64 tick() { return ++clock; }
};

size_t key_match(const std::vector<i32>& a, const i32* b, size_t nb) {
    size_t n = std::min(a.size(), nb);
    size_t i = 0;
    while (i < n && a[i] == b[i]) i++;
    return i;
}

Node* split_node(Tree* t, Node* child, size_t split_len) {
    Node* mid = new Node();
    mid->parent = child->parent;
    mid->key.assign(child->key.begin(), child->key.begin() + split_len);
    mid->value.assign(child->value.begin(), child->value.begin() + split_len);
    mid->lock_ref = child->lock_ref;
    mid->last_access = child->last_access;
    mid->parent->children[mid->key[0]] = mid;

    child->key.erase(child->key.begin(), child->key.begin() + split_len);
    child->value.erase(child->value.begin(), child->value.begin() + split_len);
    child->parent = mid;
    mid->children[child->key[0]] = child;
    return mid;
}

void collect_delete(Node* n) {
    for (auto& kv : n->children) collect_delete(kv.second);
    delete n;
}

}  // namespace

extern "C" {

void* rtree_create(int page_size) {
    Tree* t = new Tree();
    t->page_size = page_size;
    return t;
}

void rtree_destroy(void* h) {
    Tree* t = static_cast<Tree*>(h);
    for (auto& kv : t->root.children) collect_delete(kv.second);
    delete t;
}

void rtree_reset(void* h) {
    Tree* t = static_cast<Tree*>(h);
    for (auto& kv : t->root.children) collect_delete(kv.second);
    t->root.children.clear();
    t->evictable = 0;
    t->protected_ = 0;
}

// Walk the tree matching `key`; writes matched slot ids into out_vals
// (caller-provided, capacity >= n). Returns the matched node handle via
// out_node; function result = number of matched tokens.
i64 rtree_match(void* h, const i32* key, i64 n, i32* out_vals, i64* out_node) {
    Tree* t = static_cast<Tree*>(h);
    if (t->page_size > 1) n = (n / t->page_size) * t->page_size;
    Node* node = &t->root;
    i64 matched = 0;
    while (matched < n) {
        auto it = node->children.find(key[matched]);
        if (it == node->children.end()) break;
        Node* child = it->second;
        child->last_access = t->tick();
        size_t m = key_match(child->key, key + matched, (size_t)(n - matched));
        if (t->page_size > 1) m = (m / t->page_size) * t->page_size;
        if (m < child->key.size()) {
            if (m > 0) {
                Node* mid = split_node(t, child, m);
                std::memcpy(out_vals + matched, mid->value.data(), m * sizeof(i32));
                matched += (i64)m;
                node = mid;
            }
            break;
        }
        std::memcpy(out_vals + matched, child->value.data(), m * sizeof(i32));
        matched += (i64)m;
        node = child;
    }
    *out_node = reinterpret_cast<i64>(node);
    return matched;
}

// Insert key->value; returns length of prefix that already existed.
i64 rtree_insert(void* h, const i32* key, i64 n, const i32* vals) {
    Tree* t = static_cast<Tree*>(h);
    if (t->page_size > 1) n = (n / t->page_size) * t->page_size;
    Node* node = &t->root;
    i64 pos = 0;
    i64 existing = 0;
    while (pos < n) {
        auto it = node->children.find(key[pos]);
        if (it == node->children.end()) {
            Node* leaf = new Node();
            leaf->parent = node;
            leaf->key.assign(key + pos, key + n);
            leaf->value.assign(vals + pos, vals + n);
            leaf->last_access = t->tick();
            node->children[key[pos]] = leaf;
            t->evictable += (i64)leaf->value.size();
            return existing;
        }
        Node* child = it->second;
        child->last_access = t->tick();
        size_t m = key_match(child->key, key + pos, (size_t)(n - pos));
        if (t->page_size > 1) {
            m = (m / t->page_size) * t->page_size;
            if (m == 0) return existing;
        }
        existing += (i64)m;
        if (m == child->key.size()) {
            node = child;
            pos += (i64)m;
        } else {
            Node* mid = split_node(t, child, m);
            pos += (i64)m;
            if (pos < n) {
                Node* leaf = new Node();
                leaf->parent = mid;
                leaf->key.assign(key + pos, key + n);
                leaf->value.assign(vals + pos, vals + n);
                leaf->last_access = t->tick();
                mid->children[key[pos]] = leaf;
                t->evictable += (i64)leaf->value.size();
            }
            return existing;
        }
    }
    return existing;
}

void rtree_lock(void* h, i64 node_handle, int inc) {
    Tree* t = static_cast<Tree*>(h);
    Node* node = reinterpret_cast<Node*>(node_handle);
    while (node != nullptr && node != &t->root) {
        if (inc > 0) {
            if (node->lock_ref == 0) {
                t->evictable -= (i64)node->value.size();
                t->protected_ += (i64)node->value.size();
            }
            node->lock_ref++;
        } else {
            if (node->lock_ref == 1) {
                t->evictable += (i64)node->value.size();
                t->protected_ -= (i64)node->value.size();
            }
            node->lock_ref--;
        }
        node = node->parent;
    }
}

// Evict >= num_tokens from unlocked leaves (LRU); freed slot ids written to
// out (capacity cap). Returns count written.
i64 rtree_evict(void* h, i64 num_tokens, i32* out, i64 cap) {
    Tree* t = static_cast<Tree*>(h);
    using Entry = std::pair<i64, Node*>;
    auto cmp = [](const Entry& a, const Entry& b) { return a.first > b.first; };
    std::priority_queue<Entry, std::vector<Entry>, decltype(cmp)> heap(cmp);

    // Collect unlocked leaves.
    std::vector<Node*> stack;
    for (auto& kv : t->root.children) stack.push_back(kv.second);
    while (!stack.empty()) {
        Node* n = stack.back();
        stack.pop_back();
        if (n->children.empty()) {
            if (n->lock_ref == 0) heap.push({n->last_access, n});
        } else {
            for (auto& kv : n->children) stack.push_back(kv.second);
        }
    }

    i64 freed = 0;
    while (freed < num_tokens && !heap.empty()) {
        Node* n = heap.top().second;
        heap.pop();
        i64 sz = (i64)n->value.size();
        if (freed + sz > cap) break;
        std::memcpy(out + freed, n->value.data(), sz * sizeof(i32));
        freed += sz;
        t->evictable -= sz;
        Node* parent = n->parent;
        parent->children.erase(n->key[0]);
        delete n;
        if (parent != &t->root && parent->children.empty() && parent->lock_ref == 0) {
            heap.push({parent->last_access, parent});
        }
    }
    return freed;
}

i64 rtree_evictable_size(void* h) { return static_cast<Tree*>(h)->evictable; }
i64 rtree_protected_size(void* h) { return static_cast<Tree*>(h)->protected_; }

i64 rtree_total_size(void* h) {
    Tree* t = static_cast<Tree*>(h);
    i64 total = 0;
    std::vector<Node*> stack;
    for (auto& kv : t->root.children) stack.push_back(kv.second);
    while (!stack.empty()) {
        Node* n = stack.back();
        stack.pop_back();
        total += (i64)n->value.size();
        for (auto& kv : n->children) stack.push_back(kv.second);
    }
    return total;
}

i64 rtree_root(void* h) {
    return reinterpret_cast<i64>(&static_cast<Tree*>(h)->root);
}

}  // extern "C"
