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

#include <cmath>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <shared_mutex>
#include <unordered_map>
#include <vector>
#include <algorithm>

namespace {

struct Obs {
    int64_t kf_id;
    int32_t idx;
};

struct KfData {
    // immutable per-keyframe observation data registered once at insertion
    std::vector<uint32_t> desc;  // n*8 packed 256-bit descriptors
    std::vector<int32_t> level;  // n keypoint octaves
};

struct Store {
    // landmark id -> observation list (insertion-ordered, keyframe ids are
    // monotone in practice, matching the reference's id-ordered map)
    std::unordered_map<int64_t, std::vector<Obs>> obs;
    std::unordered_map<int64_t, KfData> kfs;
    // The store is hit from four threads (tracker finalize, mapper, loop
    // closer, and the caller thread via System APIs); the Python layer's
    // map_db.lock covers the mutating paths but the per-frame hot reads
    // (covis_counts / num_obs_bulk in finalize) deliberately run lock-free
    // for latency — an unordered_map rehash or vector reallocation under a
    // concurrent reader then dereferences a dangling node (observed as a
    // segfault in a bench run). Reader-writer lock at the C ABI boundary:
    // readers share, mutators are exclusive; the granularity is one bulk
    // call, so the uncontended cost is a single atomic each way.
    mutable std::shared_mutex mtx;
};

using ReadLock = std::shared_lock<std::shared_mutex>;
using WriteLock = std::unique_lock<std::shared_mutex>;

int32_t pick_median_hamming(const uint32_t* descs, int32_t n) {
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

}  // namespace

extern "C" {

void* store_create() { return new Store(); }

void store_destroy(void* s) { delete static_cast<Store*>(s); }

void store_clear(void* s) {
    Store* st = static_cast<Store*>(s);
    WriteLock wl(st->mtx);
    st->obs.clear();
    st->kfs.clear();
}

void store_add_obs(void* s, int64_t lm_id, int64_t kf_id, int32_t idx) {
    Store* st = static_cast<Store*>(s);
    WriteLock wl(st->mtx);
    auto& v = st->obs[lm_id];
    for (auto& o : v) {
        if (o.kf_id == kf_id) { o.idx = idx; return; }
    }
    v.push_back({kf_id, idx});
}

// bulk observation insert: one call per keyframe event instead of one per
// observation (the mapper's triangulation apply and the tracker's keyframe
// insert add hundreds at a time; ctypes per-call overhead dominated)
void store_add_obs_bulk(void* s, const int64_t* lm_ids, const int64_t* kf_ids,
                        const int32_t* idxs, int64_t n) {
    Store* st = static_cast<Store*>(s);
    WriteLock wl(st->mtx);
    auto& m = st->obs;
    for (int64_t i = 0; i < n; ++i) {
        auto& v = m[lm_ids[i]];
        bool found = false;
        for (auto& o : v) {
            if (o.kf_id == kf_ids[i]) { o.idx = idxs[i]; found = true; break; }
        }
        if (!found) v.push_back({kf_ids[i], idxs[i]});
    }
}

// returns the keypoint index that was erased, or -1
int32_t store_erase_obs(void* s, int64_t lm_id, int64_t kf_id) {
    Store* st = static_cast<Store*>(s);
    WriteLock wl(st->mtx);
    auto& m = st->obs;
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
    Store* st = static_cast<Store*>(s);
    WriteLock wl(st->mtx);
    st->obs.erase(lm_id);
}

int32_t store_num_obs(void* s, int64_t lm_id) {
    Store* st = static_cast<Store*>(s);
    ReadLock rl(st->mtx);
    auto& m = st->obs;
    auto it = m.find(lm_id);
    return it == m.end() ? 0 : static_cast<int32_t>(it->second.size());
}

// observation counts for a batch of landmark ids (-1 entries -> 0). One
// ctypes call instead of a Python dict lookup per tracked landmark — the
// tracker's per-frame reliable-landmark count walks ~300 ids EVERY frame
// (reference tracking_module.cc:143-148).
void store_num_obs_bulk(void* s, const int64_t* lm_ids, int32_t n,
                        int32_t* out_counts) {
    Store* st = static_cast<Store*>(s);
    ReadLock rl(st->mtx);
    auto& m = st->obs;
    for (int32_t i = 0; i < n; ++i) {
        if (lm_ids[i] < 0) { out_counts[i] = 0; continue; }
        auto it = m.find(lm_ids[i]);
        out_counts[i] = it == m.end() ? 0 : (int32_t)it->second.size();
    }
}

// fills out_kf (cap) and out_idx with the observations of lm_id; returns count
int32_t store_get_obs(void* s, int64_t lm_id, int64_t* out_kf,
                      int32_t* out_idx, int32_t cap) {
    Store* st = static_cast<Store*>(s);
    ReadLock rl(st->mtx);
    auto& m = st->obs;
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
    Store* st = static_cast<Store*>(s);
    ReadLock rl(st->mtx);
    auto& m = st->obs;
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
    Store* st = static_cast<Store*>(s);
    ReadLock rl(st->mtx);
    auto& m = st->obs;
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
    return pick_median_hamming(descs, n);
}

// ---- per-keyframe observation registry (immutable descriptors/levels) ----

void store_register_keyframe(void* s, int64_t kf_id, const uint32_t* desc,
                             const int32_t* level, int32_t n) {
    Store* st = static_cast<Store*>(s);
    WriteLock wl(st->mtx);
    auto& kf = st->kfs[kf_id];
    kf.desc.assign(desc, desc + (size_t)n * 8);
    kf.level.assign(level, level + n);
}

void store_erase_keyframe_data(void* s, int64_t kf_id) {
    Store* st = static_cast<Store*>(s);
    WriteLock wl(st->mtx);
    st->kfs.erase(kf_id);
}

// Redundant-observation counting for keyframe culling (reference
// local_map_cleaner.cc:68-123): an observation is redundant when >= 3 other
// keyframes see the same landmark at the same-or-finer scale (level <=
// own+1). The Python double loop over slots x observations cost 10-70 ms
// per keyframe event.
void store_count_redundant(void* s, int64_t kf_id, const int64_t* lm_ids,
                           const int32_t* levels, int32_t n,
                           int32_t* out_valid, int32_t* out_redundant) {
    auto& st = *static_cast<Store*>(s);
    ReadLock rl(st.mtx);
    int32_t valid = 0, redundant = 0;
    for (int32_t i = 0; i < n; ++i) {
        if (lm_ids[i] < 0) continue;
        auto it = st.obs.find(lm_ids[i]);
        if (it == st.obs.end()) continue;
        ++valid;
        auto& v = it->second;
        if ((int32_t)v.size() <= 3) continue;
        const int32_t own_level = levels[i];
        int32_t better = 0;
        for (auto& o : v) {
            if (o.kf_id == kf_id) continue;
            auto kit = st.kfs.find(o.kf_id);
            if (kit == st.kfs.end()) continue;
            if (o.idx < (int32_t)kit->second.level.size() &&
                kit->second.level[o.idx] <= own_level + 1) {
                if (++better >= 3) break;
            }
        }
        if (better >= 3) ++redundant;
    }
    *out_valid = valid;
    *out_redundant = redundant;
}

// Batched landmark statistics refresh (reference landmark.cc
// compute_descriptor + update_mean_normal_and_obs_scale_variance), the
// per-keyframe hot path the Python layer was spending ~0.5 s/keyframe on.
// kf_ids/kf_centers: CURRENT camera centers of all live keyframes (centers
// move with every BA, so they are passed per call; descriptors/levels come
// from the immutable registry). out_flags bit0: descriptor written, bit1:
// normal written, bit2: distance range written.
// compute_desc=0 skips the O(num_obs^2) representative-descriptor medians —
// the reference's post-BA refresh is normals/depth only
// (local_bundle_adjuster_g2o.cc:408), and the descriptor pass dominates
// this function's cost.
void store_batch_landmark_refresh(
    void* s, const int64_t* lm_ids, int32_t M, const double* lm_pos,
    const int64_t* ref_kf_ids, const int64_t* kf_ids,
    const double* kf_centers, int32_t K, const double* scale_factors,
    int32_t num_levels, int32_t compute_desc, uint32_t* out_desc,
    double* out_normal, double* out_dmin, double* out_dmax,
    uint8_t* out_flags) {
    Store* st = static_cast<Store*>(s);
    ReadLock rl(st->mtx);
    std::unordered_map<int64_t, int32_t> row_of;
    row_of.reserve(K * 2);
    for (int32_t i = 0; i < K; ++i) row_of[kf_ids[i]] = i;
    std::vector<uint32_t> descs;
    for (int32_t m = 0; m < M; ++m) {
        out_flags[m] = 0;
        auto it = st->obs.find(lm_ids[m]);
        if (it == st->obs.end() || it->second.empty()) continue;
        const auto& obs = it->second;
        // representative descriptor
        if (compute_desc) {
            descs.clear();
            for (const auto& o : obs) {
                auto kit = st->kfs.find(o.kf_id);
                if (kit == st->kfs.end()) continue;
                const auto& kf = kit->second;
                if ((size_t)o.idx * 8 + 8 > kf.desc.size()) continue;
                descs.insert(descs.end(), &kf.desc[(size_t)o.idx * 8],
                             &kf.desc[(size_t)o.idx * 8 + 8]);
            }
            int32_t nd = (int32_t)(descs.size() / 8);
            if (nd > 0) {
                int32_t w = pick_median_hamming(descs.data(), nd);
                std::memcpy(out_desc + (size_t)m * 8, &descs[(size_t)w * 8],
                            8 * sizeof(uint32_t));
                out_flags[m] |= 1;
            }
        }
        // mean viewing normal
        const double* p = lm_pos + (size_t)m * 3;
        double nsum[3] = {0, 0, 0};
        int32_t nn = 0;
        for (const auto& o : obs) {
            auto rit = row_of.find(o.kf_id);
            if (rit == row_of.end()) continue;
            const double* c = kf_centers + (size_t)rit->second * 3;
            double v[3] = {p[0] - c[0], p[1] - c[1], p[2] - c[2]};
            double nrm = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
            if (nrm > 1e-9) {
                nsum[0] += v[0] / nrm;
                nsum[1] += v[1] / nrm;
                nsum[2] += v[2] / nrm;
                ++nn;
            }
        }
        if (nn > 0) {
            double nrm = std::sqrt(nsum[0] * nsum[0] + nsum[1] * nsum[1] +
                                   nsum[2] * nsum[2]);
            double inv = nrm > 1e-9 ? 1.0 / nrm : 1.0 / nn;
            out_normal[(size_t)m * 3 + 0] = nsum[0] * inv;
            out_normal[(size_t)m * 3 + 1] = nsum[1] * inv;
            out_normal[(size_t)m * 3 + 2] = nsum[2] * inv;
            out_flags[m] |= 2;
        }
        // ORB-scale valid distance range from the reference observation
        auto rit = row_of.find(ref_kf_ids[m]);
        auto kit = st->kfs.find(ref_kf_ids[m]);
        if (rit == row_of.end() || kit == st->kfs.end()) continue;
        int32_t ref_idx = -1;
        for (const auto& o : obs) {
            if (o.kf_id == ref_kf_ids[m]) { ref_idx = o.idx; break; }
        }
        if (ref_idx < 0 || ref_idx >= (int32_t)kit->second.level.size())
            continue;
        const double* c = kf_centers + (size_t)rit->second * 3;
        double v[3] = {p[0] - c[0], p[1] - c[1], p[2] - c[2]};
        double dist = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
        int32_t lvl = kit->second.level[ref_idx];
        if (lvl < 0 || lvl >= num_levels) continue;
        out_dmax[m] = dist * scale_factors[lvl];
        out_dmin[m] = out_dmax[m] / scale_factors[num_levels - 1];
        out_flags[m] |= 4;
    }
}

}  // extern "C"
