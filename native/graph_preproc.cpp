// Native molecular-graph preprocessing for grappa_tpu.
//
// The TPU compute path is pure XLA; this library accelerates the HOST side
// of the data pipeline (the framework's "graph builder"): interaction-tuple
// enumeration, padded neighbor-list construction and ring detection, which
// dominate featurization time for protein-sized molecules. Semantics are
// identical to the Python reference implementations in
// grappa_tpu/topology.py and grappa_tpu/graph_features.py (property-tested
// for equality); either backend can serve every call.
//
// C ABI (ctypes): int32 id/index arrays, caller-allocated outputs with a
// count/fill two-call protocol where sizes are data-dependent.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC graph_preproc.cpp -o libgraph_preproc.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <set>
#include <vector>

namespace {

using AdjMap = std::map<int32_t, std::vector<int32_t>>;

AdjMap build_adjacency(const int32_t* bonds, int64_t n_bonds) {
  AdjMap adj;
  for (int64_t i = 0; i < n_bonds; ++i) {
    int32_t a = bonds[2 * i], b = bonds[2 * i + 1];
    adj[a].push_back(b);
    adj[b].push_back(a);
  }
  for (auto& kv : adj) std::sort(kv.second.begin(), kv.second.end());
  return adj;
}

// Canonical enumeration identical to topology.enumerate_angles_propers:
// angles (a,b,c) with a<c; propers (d,c,b,a) emitted with d<a.
void enumerate_impl(const AdjMap& adj, std::vector<int32_t>* angles,
                    std::vector<int32_t>* propers) {
  for (const auto& kv : adj) {
    int32_t a = kv.first;
    for (int32_t b : kv.second) {
      auto itb = adj.find(b);
      for (int32_t c : itb->second) {
        if (c == a) continue;
        if (a < c && angles) {
          angles->push_back(a);
          angles->push_back(b);
          angles->push_back(c);
        }
        auto itc = adj.find(c);
        for (int32_t d : itc->second) {
          if (d >= a) break;  // sorted ascending
          if (d == b) continue;
          if (propers) {
            propers->push_back(d);
            propers->push_back(c);
            propers->push_back(b);
            propers->push_back(a);
          }
        }
      }
    }
  }
}

struct RingState {
  const std::vector<std::vector<int32_t>>* core;
  std::vector<uint8_t>* size_bits;  // n_atoms x 9 membership bits (size 0..8)
  std::vector<int32_t> path;
  std::vector<uint8_t> on_path;
  int32_t start;
  int32_t max_size;
};

void ring_dfs(RingState& st, int32_t current) {
  int depth = static_cast<int>(st.path.size());
  for (int32_t nxt : (*st.core)[current]) {
    if (nxt == st.start && depth >= 3) {
      for (int32_t atom : st.path) {
        (*st.size_bits)[atom * 9 + depth] = 1;
      }
    } else if (nxt > st.start && !st.on_path[nxt] && depth < st.max_size) {
      st.path.push_back(nxt);
      st.on_path[nxt] = 1;
      ring_dfs(st, nxt);
      st.path.pop_back();
      st.on_path[nxt] = 0;
    }
  }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------
// Tuple enumeration: two-call protocol.
// Pass angles_out = propers_out = nullptr to only count.
void enumerate_tuples(const int32_t* bonds, int64_t n_bonds,
                      int64_t* n_angles_out, int64_t* n_propers_out,
                      int32_t* angles_out, int32_t* propers_out) {
  AdjMap adj = build_adjacency(bonds, n_bonds);
  std::vector<int32_t> angles, propers;
  enumerate_impl(adj, &angles, &propers);
  *n_angles_out = static_cast<int64_t>(angles.size() / 3);
  *n_propers_out = static_cast<int64_t>(propers.size() / 4);
  if (angles_out) std::memcpy(angles_out, angles.data(),
                              angles.size() * sizeof(int32_t));
  if (propers_out) std::memcpy(propers_out, propers.data(),
                               propers.size() * sizeof(int32_t));
}

// ---------------------------------------------------------------------
// Padded neighbor list. Returns 0 on success, -1 if a degree exceeds
// max_neighbors. bonds are 0-based indices; outputs are caller-allocated
// (n_atoms x max_neighbors) int32 / uint8.
int32_t neighbor_list(const int32_t* bonds, int64_t n_bonds, int64_t n_atoms,
                      int64_t max_neighbors, int32_t* neighbors_out,
                      uint8_t* mask_out) {
  std::vector<std::vector<int32_t>> lists(n_atoms);
  for (int64_t i = 0; i < n_bonds; ++i) {
    int32_t a = bonds[2 * i], b = bonds[2 * i + 1];
    lists[a].push_back(b);
    lists[b].push_back(a);
  }
  std::memset(neighbors_out, 0, n_atoms * max_neighbors * sizeof(int32_t));
  std::memset(mask_out, 0, n_atoms * max_neighbors);
  for (int64_t i = 0; i < n_atoms; ++i) {
    auto& l = lists[i];
    if (static_cast<int64_t>(l.size()) > max_neighbors) return -1;
    std::sort(l.begin(), l.end());
    for (size_t j = 0; j < l.size(); ++j) {
      neighbors_out[i * max_neighbors + j] = l[j];
      mask_out[i * max_neighbors + j] = 1;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------
// Ring encoding: (n_atoms x 7) float32 — [in any ring, size 3..8].
// Same algorithm as graph_features.ring_encoding: 2-core reduction, then
// bounded simple-cycle DFS rooted at each atom's minimal index.
void ring_encoding(const int32_t* bonds, int64_t n_bonds, int64_t n_atoms,
                   float* encoding_out) {
  std::vector<std::set<int32_t>> adj(n_atoms);
  for (int64_t i = 0; i < n_bonds; ++i) {
    adj[bonds[2 * i]].insert(bonds[2 * i + 1]);
    adj[bonds[2 * i + 1]].insert(bonds[2 * i]);
  }
  // iterative 2-core reduction
  bool changed = true;
  std::vector<uint8_t> in_core(n_atoms, 1);
  while (changed) {
    changed = false;
    for (int64_t a = 0; a < n_atoms; ++a) {
      if (in_core[a] && adj[a].size() < 2) {
        for (int32_t b : adj[a]) adj[b].erase(static_cast<int32_t>(a));
        adj[a].clear();
        in_core[a] = 0;
        changed = true;
      }
    }
  }
  std::vector<std::vector<int32_t>> core(n_atoms);
  for (int64_t a = 0; a < n_atoms; ++a)
    core[a].assign(adj[a].begin(), adj[a].end());

  std::vector<uint8_t> size_bits(n_atoms * 9, 0);
  RingState st;
  st.core = &core;
  st.size_bits = &size_bits;
  st.on_path.assign(n_atoms, 0);
  st.max_size = 8;
  for (int64_t a = 0; a < n_atoms; ++a) {
    if (!in_core[a]) continue;
    st.start = static_cast<int32_t>(a);
    st.path.assign(1, st.start);
    st.on_path.assign(n_atoms, 0);
    st.on_path[a] = 1;
    ring_dfs(st, st.start);
  }
  std::memset(encoding_out, 0, n_atoms * 7 * sizeof(float));
  for (int64_t a = 0; a < n_atoms; ++a) {
    bool any = false;
    for (int s = 3; s <= 8; ++s) {
      if (size_bits[a * 9 + s]) {
        encoding_out[a * 7 + (s - 2)] = 1.0f;
        any = true;
      }
    }
    if (any) encoding_out[a * 7] = 1.0f;
  }
}

}  // extern "C"
