// Native map-core: the host-side association store of the SLAM map.
//
// The reference implements its entire map data model in C++
// (src/stella_vslam/data/{landmark,keyframe,graph_node,map_database}.cc);
// this framework keeps per-frame math on the TPU, and this library is the
// native equivalent of the reference's graph-builder/bookkeeping layer: the
// landmark<->keyframe observation store, covisibility counting, bundle-
// adjustment problem assembly, and representative-descriptor selection —
// the host-side paths that run per keyframe insertion.
//
// C ABI (ctypes-consumed; no pybind11 dependency by design).

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>
#include <algorithm>

namespace {

struct Obs {
    int64_t kf_id;
    int32_t idx;
};

struct Store {
    // landmark id -> observation list (insertion-ordered, keyframe ids are
    // monotone in practice, matching the reference's id-ordered map)
    std::unordered_map<int64_t, std::vector<Obs>> obs;
};

}  // namespace

extern "C" {

void* store_create() { return new Store(); }

void store_destroy(void* s) { delete static_cast<Store*>(s); }

void store_clear(void* s) { static_cast<Store*>(s)->obs.clear(); }

void store_add_obs(void* s, int64_t lm_id, int64_t kf_id, int32_t idx) {
    auto& v = static_cast<Store*>(s)->obs[lm_id];
    for (auto& o : v) {
        if (o.kf_id == kf_id) { o.idx = idx; return; }
    }
    v.push_back({kf_id, idx});
}

// returns the keypoint index that was erased, or -1
int32_t store_erase_obs(void* s, int64_t lm_id, int64_t kf_id) {
    auto& m = static_cast<Store*>(s)->obs;
    auto it = m.find(lm_id);
    if (it == m.end()) return -1;
    auto& v = it->second;
    for (size_t i = 0; i < v.size(); ++i) {
        if (v[i].kf_id == kf_id) {
            int32_t idx = v[i].idx;
            v.erase(v.begin() + i);
            if (v.empty()) m.erase(it);
            return idx;
        }
    }
    return -1;
}

void store_erase_landmark(void* s, int64_t lm_id) {
    static_cast<Store*>(s)->obs.erase(lm_id);
}

int32_t store_num_obs(void* s, int64_t lm_id) {
    auto& m = static_cast<Store*>(s)->obs;
    auto it = m.find(lm_id);
    return it == m.end() ? 0 : static_cast<int32_t>(it->second.size());
}

// fills out_kf (cap) and out_idx with the observations of lm_id; returns count
int32_t store_get_obs(void* s, int64_t lm_id, int64_t* out_kf,
                      int32_t* out_idx, int32_t cap) {
    auto& m = static_cast<Store*>(s)->obs;
    auto it = m.find(lm_id);
    if (it == m.end()) return 0;
    int32_t n = std::min<int32_t>(cap, (int32_t)it->second.size());
    for (int32_t i = 0; i < n; ++i) {
        out_kf[i] = it->second[i].kf_id;
        out_idx[i] = it->second[i].idx;
    }
    return n;
}

// Covisibility counting (reference graph_node.cc update_connections): for a
// keyframe with landmark ids lm_ids (n entries, -1 skipped), count shared
// landmarks per other keyframe. Returns the number of distinct keyframes.
int32_t store_covis_counts(void* s, const int64_t* lm_ids, int32_t n,
                           int64_t self_kf_id, int64_t* out_kf,
                           int32_t* out_counts, int32_t cap) {
    auto& m = static_cast<Store*>(s)->obs;
    std::unordered_map<int64_t, int32_t> counts;
    counts.reserve(256);
    for (int32_t i = 0; i < n; ++i) {
        if (lm_ids[i] < 0) continue;
        auto it = m.find(lm_ids[i]);
        if (it == m.end()) continue;
        for (auto& o : it->second) {
            if (o.kf_id != self_kf_id) ++counts[o.kf_id];
        }
    }
    int32_t k = 0;
    for (auto& kv : counts) {
        if (k >= cap) break;
        out_kf[k] = kv.first;
        out_counts[k] = kv.second;
        ++k;
    }
    return k;
}

// BA assembly (reference local_bundle_adjuster_g2o.cc edge construction):
// for L landmarks, emit up to D observations each as (cam_slot, keypoint idx)
// using the kf->slot mapping (kf_slot_keys sorted not required; linear map).
void store_assemble_ba(void* s, const int64_t* lm_ids, int32_t L,
                       const int64_t* kf_ids, const int32_t* kf_slots,
                       int32_t K, int32_t D, int32_t* obs_cam,
                       int32_t* obs_idx, uint8_t* obs_valid) {
    auto& m = static_cast<Store*>(s)->obs;
    std::unordered_map<int64_t, int32_t> slot_of;
    slot_of.reserve(K * 2);
    for (int32_t i = 0; i < K; ++i) slot_of[kf_ids[i]] = kf_slots[i];
    for (int32_t l = 0; l < L; ++l) {
        int32_t d = 0;
        if (lm_ids[l] >= 0) {
            auto it = m.find(lm_ids[l]);
            if (it != m.end()) {
                for (auto& o : it->second) {
                    if (d >= D) break;
                    auto sit = slot_of.find(o.kf_id);
                    if (sit == slot_of.end()) continue;
                    obs_cam[l * D + d] = sit->second;
                    obs_idx[l * D + d] = o.idx;
                    obs_valid[l * D + d] = 1;
                    ++d;
                }
            }
        }
        for (; d < D; ++d) {
            obs_cam[l * D + d] = 0;
            obs_idx[l * D + d] = 0;
            obs_valid[l * D + d] = 0;
        }
    }
}

// Representative descriptor: the row of descs [n, 8] u32 minimizing the
// median Hamming distance to all others (reference landmark.cc
// compute_descriptor). Returns the winning row index.
int32_t median_hamming_descriptor(const uint32_t* descs, int32_t n) {
    if (n <= 0) return -1;
    if (n == 1) return 0;
    std::vector<int32_t> dist(n);
    int32_t best = 0;
    double best_med = 1e18;
    for (int32_t i = 0; i < n; ++i) {
        for (int32_t j = 0; j < n; ++j) {
            int32_t d = 0;
            for (int32_t w = 0; w < 8; ++w) {
                d += __builtin_popcount(descs[i * 8 + w] ^ descs[j * 8 + w]);
            }
            dist[j] = d;
        }
        std::nth_element(dist.begin(), dist.begin() + n / 2, dist.end());
        double med = dist[n / 2];
        if (med < best_med) {
            best_med = med;
            best = i;
        }
    }
    return best;
}

}  // extern "C"
