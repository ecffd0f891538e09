// graphcore — native graph preprocessing for spgemm-gnn-tpu.
//
// TPU-native replacement for the reference's native graph plumbing: the C++
// harness's binary graph loading (`cuda_read_array<T>` in kernels/spmm_base.h,
// SURVEY.md §2.1 [bin]) and the warp-partition metadata generator
// (`kernels/generate_meta.py` → `.warp4` files). Here the outputs are CSR
// arrays and TilePlans consumed by the Pallas kernels; Python binds via ctypes
// (graphs/native.py) with a pure-numpy fallback.
//
// Build: native/build.sh (g++ -O3 -shared -fPIC).
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// CSR construction: sort edges by (dst, src), fill indptr/indices/edge_dst.
// Returns 0 on success.
// ---------------------------------------------------------------------------
int gc_build_csr(int64_t num_edges, const int64_t* src, const int64_t* dst,
                 int64_t num_nodes, int32_t* indptr /*[N+1]*/,
                 int32_t* indices /*[E]*/, int32_t* edge_dst /*[E]*/) {
  std::vector<int64_t> cnt(num_nodes + 1, 0);
  for (int64_t e = 0; e < num_edges; ++e) cnt[dst[e] + 1]++;
  std::partial_sum(cnt.begin(), cnt.end(), cnt.begin());
  for (int64_t v = 0; v <= num_nodes; ++v) indptr[v] = (int32_t)cnt[v];

  // bucket by dst (stable), then sort each row's sources
  std::vector<int64_t> pos(cnt.begin(), cnt.end() - 1);
  std::vector<int32_t> tmp(num_edges);
  for (int64_t e = 0; e < num_edges; ++e) tmp[pos[dst[e]]++] = (int32_t)src[e];
  for (int64_t v = 0; v < num_nodes; ++v)
    std::sort(tmp.data() + cnt[v], tmp.data() + cnt[v + 1]);
  std::memcpy(indices, tmp.data(), num_edges * sizeof(int32_t));
  for (int64_t v = 0; v < num_nodes; ++v)
    for (int64_t e = cnt[v]; e < cnt[v + 1]; ++e) edge_dst[e] = (int32_t)v;
  return 0;
}

// ---------------------------------------------------------------------------
// Degrees from an edge list.
// ---------------------------------------------------------------------------
int gc_degrees(int64_t num_edges, const int32_t* indices,
               const int32_t* edge_dst, int64_t num_nodes,
               int32_t* in_deg, int32_t* out_deg) {
  std::fill(in_deg, in_deg + num_nodes, 0);
  std::fill(out_deg, out_deg + num_nodes, 0);
  for (int64_t e = 0; e < num_edges; ++e) {
    in_deg[edge_dst[e]]++;
    out_deg[indices[e]]++;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Tile planning (see graphs/tiles.py for the layout contract).
//
// Internal state between the count and fill passes.
// ---------------------------------------------------------------------------
namespace {
struct PlanState {
  std::vector<int64_t> order;        // permutation: sorted edge order
  std::vector<int64_t> chunk_start, chunk_end;   // per chunk, in sorted order
  std::vector<int64_t> tile_first_chunk, tile_nchunks;
  std::vector<int32_t> tile_dblk;    // dst block per tile (incl. empty blocks)
  std::vector<int64_t> dst_of;       // dst row per (original CSR) edge
  int64_t S, C, RW, B, R, n_dst_blocks, n_src_blocks, E;
};
PlanState g_state;   // single-threaded planner; one plan in flight at a time
}  // namespace

// Pass 1: compute the plan structure; returns W (tile count) or -1 on error.
// S = tile edge slots, C = chunk, RW = row window, B = src block, R = dst blk.
int64_t gc_plan_count(const int64_t* indptr, const int32_t* indices,
                      int64_t num_nodes, int64_t S, int64_t C, int64_t RW,
                      int64_t B, int64_t R, int64_t num_src_nodes) {
  if (S % C) return -1;
  if (B > 32767 || R > 32767) return -1;  // int16 slot encoding
  PlanState& st = g_state;
  st = PlanState();
  st.S = S; st.C = C; st.RW = RW; st.B = B; st.R = R;
  int64_t E = indptr[num_nodes];
  st.E = E;
  if (num_src_nodes <= 0) num_src_nodes = num_nodes;
  int64_t ndb = std::max<int64_t>((num_nodes + R - 1) / R, 1);
  int64_t nsb = std::max<int64_t>((num_src_nodes + B - 1) / B, 1);
  st.n_dst_blocks = ndb;
  st.n_src_blocks = nsb;

  // dst row per edge
  st.dst_of.resize(E);
  for (int64_t v = 0; v < num_nodes; ++v)
    for (int64_t e = indptr[v]; e < indptr[v + 1]; ++e) st.dst_of[e] = v;

  // stable counting sort per dst block on src_block (edges already sorted by
  // (dst, src) inside the CSR ⇒ stable sort yields (dst_blk, src_blk, dst, src))
  st.order.resize(E);
  std::vector<int64_t> cnt;
  for (int64_t db = 0; db < ndb; ++db) {
    int64_t vlo = db * R, vhi = std::min(num_nodes, (db + 1) * R);
    int64_t elo = indptr[vlo], ehi = indptr[vhi];
    cnt.assign(nsb + 1, 0);
    for (int64_t e = elo; e < ehi; ++e) cnt[indices[e] / B + 1]++;
    std::partial_sum(cnt.begin(), cnt.end(), cnt.begin());
    for (int64_t e = elo; e < ehi; ++e) {
      int64_t sb = indices[e] / B;
      st.order[elo + cnt[sb]++] = e;
    }
  }

  // greedy chunking within (dst_blk, src_blk) bucket runs
  auto bucket_of = [&](int64_t p) {
    int64_t e = st.order[p];
    return (st.dst_of[e] / R) * nsb + indices[e] / B;
  };
  int64_t p = 0;
  while (p < E) {
    int64_t b = bucket_of(p);
    int64_t re = p;
    while (re < E && bucket_of(re) == b) ++re;
    // chunk [p, re); windows are 8-aligned (TPU sublane slice alignment)
    while (p < re) {
      int64_t row0a = (st.dst_of[st.order[p]] / 8) * 8;
      int64_t q = p;
      int64_t qmax = std::min(p + C, re);
      while (q < qmax && st.dst_of[st.order[q]] < row0a + RW) ++q;
      st.chunk_start.push_back(p);
      st.chunk_end.push_back(q);
      p = q;
    }
  }

  // pack chunks into tiles (same bucket, ≤ S/C chunks)
  std::vector<char> block_present(ndb, 0);
  int64_t cpt = S / C;
  int64_t nchunks = (int64_t)st.chunk_start.size();
  int64_t ci = 0;
  while (ci < nchunks) {
    int64_t b = bucket_of(st.chunk_start[ci]);
    int64_t first = ci, n = 0;
    while (ci < nchunks && n < cpt && bucket_of(st.chunk_start[ci]) == b) {
      ++ci; ++n;
    }
    st.tile_first_chunk.push_back(first);
    st.tile_nchunks.push_back(n);
    int32_t dblk = (int32_t)(st.dst_of[st.order[st.chunk_start[first]]] / R);
    st.tile_dblk.push_back(dblk);
    block_present[dblk] = 1;
  }
  // empty dst blocks still need a (zero) tile
  for (int64_t b = 0; b < ndb; ++b)
    if (!block_present[b]) {
      st.tile_first_chunk.push_back(-1);
      st.tile_nchunks.push_back(0);
      st.tile_dblk.push_back((int32_t)b);
    }
  // sort tiles by dst block (stable — preserves bucket order within)
  int64_t W = (int64_t)st.tile_dblk.size();
  std::vector<int64_t> tidx(W);
  std::iota(tidx.begin(), tidx.end(), 0);
  std::stable_sort(tidx.begin(), tidx.end(), [&](int64_t a, int64_t b2) {
    return st.tile_dblk[a] < st.tile_dblk[b2];
  });
  std::vector<int64_t> fc(W), nc(W);
  std::vector<int32_t> db2(W);
  for (int64_t i = 0; i < W; ++i) {
    fc[i] = st.tile_first_chunk[tidx[i]];
    nc[i] = st.tile_nchunks[tidx[i]];
    db2[i] = st.tile_dblk[tidx[i]];
  }
  st.tile_first_chunk.swap(fc);
  st.tile_nchunks.swap(nc);
  st.tile_dblk.swap(db2);
  return W;
}

// Pass 2: fill the plan arrays (sized W, W, W*S, W*S).
// Padding slots carry e_src_local = -1 (the kernels derive the valid mask from
// the sentinel) and e_dst_local = the chunk's window-start row.
int gc_plan_fill(const int32_t* indices, int32_t* ws_dst, int32_t* ws_src,
                 int16_t* e_src_local, int16_t* e_dst_local) {
  PlanState& st = g_state;
  int64_t W = (int64_t)st.tile_dblk.size();
  int64_t S = st.S, C = st.C;
  std::fill(e_src_local, e_src_local + W * S, (int16_t)-1);
  std::fill(e_dst_local, e_dst_local + W * S, (int16_t)0);
  int64_t B = st.B, R = st.R;
  for (int64_t w = 0; w < W; ++w) {
    ws_dst[w] = st.tile_dblk[w];
    ws_src[w] = 0;
    if (st.tile_nchunks[w] == 0) continue;
    int64_t fc = st.tile_first_chunk[w];
    int64_t e0 = st.order[st.chunk_start[fc]];
    int32_t sblk = (int32_t)(indices[e0] / B);
    ws_src[w] = sblk;
    for (int64_t ci = 0; ci < st.tile_nchunks[w]; ++ci) {
      int64_t cs = st.chunk_start[fc + ci], ce = st.chunk_end[fc + ci];
      int64_t base = w * S + ci * C;
      int64_t row0 = st.dst_of[st.order[cs]] - (int64_t)ws_dst[w] * R;
      for (int64_t j = 0; j < C; ++j) {
        if (cs + j < ce) {
          int64_t e = st.order[cs + j];
          e_src_local[base + j] = (int16_t)(indices[e] - (int64_t)sblk * B);
          e_dst_local[base + j] =
              (int16_t)(st.dst_of[e] - (int64_t)ws_dst[w] * R);
        } else {
          e_dst_local[base + j] = (int16_t)row0;   // window-start padding
        }
      }
    }
  }
  g_state = PlanState();   // release memory
  return 0;
}

// ---------------------------------------------------------------------------
// Stream planning (see graphs/stream_tiles.py for the layout contract):
// dst-sorted edges, global source ids, chunks limited by an 8-aligned RW-row
// window AND the dst block, tiles of ≤S/C consecutive same-block chunks,
// groups of ≤group_tiles tiles spanning < GB blocks, with filler tiles so
// every block of a group's GB-range is visited. Output is bit-identical to
// the Python builder (tests/test_native.py).
// ---------------------------------------------------------------------------
namespace {
struct StreamState {
  std::vector<int64_t> chunk_start, chunk_end;   // CSR-order edge ranges
  std::vector<int64_t> tile_first_chunk, tile_nchunks;
  std::vector<int32_t> tile_blk;
  // per group: first block + member tiles (tile index, or -1 filler + block)
  std::vector<int64_t> grp_first_blk;
  std::vector<std::vector<std::pair<int32_t, int64_t>>> grp_tiles;  // (blk, t)
  std::vector<int64_t> dst_of;
  int64_t S, C, RW, R, GB, Wg, E;
};
StreamState g_sstate;
}  // namespace

// Pass 1: plan structure. Outputs G (groups) and Wg (padded tiles/group) via
// pointers; returns 0 or -1 on error.
int gc_stream_count(const int64_t* indptr, int64_t num_nodes, int64_t S,
                    int64_t C, int64_t RW, int64_t R, int64_t GB,
                    int64_t group_tiles, int64_t* out_G, int64_t* out_Wg) {
  if (S % C || RW < 8 || RW % 8 || RW > R || GB < 1) return -1;
  StreamState& st = g_sstate;
  st = StreamState();
  st.S = S; st.C = C; st.RW = RW; st.R = R; st.GB = GB;
  int64_t E = indptr[num_nodes];
  st.E = E;
  st.dst_of.resize(E);
  for (int64_t v = 0; v < num_nodes; ++v)
    for (int64_t e = indptr[v]; e < indptr[v + 1]; ++e) st.dst_of[e] = v;

  // chunk cuts (edges already dst-sorted in CSR order)
  int64_t p = 0;
  while (p < E) {
    int64_t row0a = (st.dst_of[p] / 8) * 8;
    int64_t lim = std::min(row0a + RW, (st.dst_of[p] / R + 1) * R);
    int64_t q = p, qmax = std::min(p + C, E);
    while (q < qmax && st.dst_of[q] < lim) ++q;
    st.chunk_start.push_back(p);
    st.chunk_end.push_back(q);
    p = q;
  }

  // tiles: ≤ S/C consecutive chunks of one dst block
  int64_t cpt = S / C;
  int64_t nchunks = (int64_t)st.chunk_start.size();
  int64_t ci = 0;
  while (ci < nchunks) {
    int32_t b = (int32_t)(st.dst_of[st.chunk_start[ci]] / R);
    int64_t first = ci, n = 0;
    while (ci < nchunks && n < cpt &&
           (int32_t)(st.dst_of[st.chunk_start[ci]] / R) == b) {
      ++ci; ++n;
    }
    st.tile_first_chunk.push_back(first);
    st.tile_nchunks.push_back(n);
    st.tile_blk.push_back(b);
  }

  // groups: ≤ group_tiles tiles, block span < GB (hub blocks may split)
  int64_t W = (int64_t)st.tile_blk.size();
  std::vector<std::pair<int32_t, int64_t>> cur;
  int64_t first_blk = 0;
  for (int64_t t = 0; t < W; ++t) {
    int32_t b = st.tile_blk[t];
    if (!cur.empty() &&
        ((int64_t)cur.size() == group_tiles || b - first_blk >= GB)) {
      st.grp_first_blk.push_back(first_blk);
      st.grp_tiles.push_back(cur);
      cur.clear();
    }
    if (cur.empty()) first_blk = b;
    cur.emplace_back(b, t);
  }
  if (!cur.empty()) {
    st.grp_first_blk.push_back(first_blk);
    st.grp_tiles.push_back(cur);
  }
  if (st.grp_tiles.empty()) {
    st.grp_first_blk.push_back(0);
    st.grp_tiles.emplace_back();
  }

  // fillers: every block in [fb, fb+GB) needs ≥1 tile (stable sort by block)
  int64_t wg = 0;
  for (size_t g = 0; g < st.grp_tiles.size(); ++g) {
    auto& ts = st.grp_tiles[g];
    int64_t fb = st.grp_first_blk[g];
    std::vector<char> present(GB, 0);
    for (auto& pr : ts) present[pr.first - fb] = 1;
    for (int64_t b = 0; b < GB; ++b)
      if (!present[b]) ts.emplace_back((int32_t)(fb + b), (int64_t)-1);
    std::stable_sort(ts.begin(), ts.end(),
                     [](const std::pair<int32_t, int64_t>& a,
                        const std::pair<int32_t, int64_t>& b2) {
                       return a.first < b2.first;
                     });
    wg = std::max(wg, (int64_t)ts.size());
  }
  st.Wg = wg;
  *out_G = (int64_t)st.grp_tiles.size();
  *out_Wg = wg;
  return 0;
}

// Pass 2: fill ws_local [G,Wg], row0 [G], e_src i32 [G,Wg,S], e_dst i16.
int gc_stream_fill(const int32_t* indices, int32_t* ws_local, int32_t* row0,
                   int32_t* e_src, int16_t* e_dst) {
  StreamState& st = g_sstate;
  int64_t G = (int64_t)st.grp_tiles.size();
  int64_t Wg = st.Wg, S = st.S, C = st.C, R = st.R;
  std::fill(ws_local, ws_local + G * Wg, 0);
  std::fill(e_src, e_src + G * Wg * S, 0);
  std::fill(e_dst, e_dst + G * Wg * S, (int16_t)-1);
  for (int64_t g = 0; g < G; ++g) {
    int64_t fb = st.grp_first_blk[g];
    row0[g] = (int32_t)(fb * R);
    auto& ts = st.grp_tiles[g];
    for (size_t w = 0; w < ts.size(); ++w) {
      int32_t blk = ts[w].first;
      int64_t t = ts[w].second;
      ws_local[g * Wg + (int64_t)w] = (int32_t)(blk - fb);
      if (t < 0) continue;   // filler tile: all padding slots
      for (int64_t ci = 0; ci < st.tile_nchunks[t]; ++ci) {
        int64_t cs = st.chunk_start[st.tile_first_chunk[t] + ci];
        int64_t ce = st.chunk_end[st.tile_first_chunk[t] + ci];
        int64_t base = (g * Wg + (int64_t)w) * S + ci * C;
        for (int64_t e = cs; e < ce; ++e) {
          e_src[base + (e - cs)] = indices[e];
          e_dst[base + (e - cs)] =
              (int16_t)(st.dst_of[e] - (int64_t)blk * R);
        }
      }
    }
    // pad tiles repeat the last real block (no first-visit re-zero)
    if (!ts.empty())
      for (int64_t w = (int64_t)ts.size(); w < Wg; ++w)
        ws_local[g * Wg + w] = ws_local[g * Wg + (int64_t)ts.size() - 1];
  }
  g_sstate = StreamState();
  return 0;
}

// ---------------------------------------------------------------------------
// Label propagation (graphs/relabel.py::_labelprop_labels) — bit-identical
// to the numpy implementation: synchronous sweeps, each node adopts the
// most frequent neighbor label, ties broken by the per-sweep keyed hash
// (label * 2654435761 + iter * 0x9E3779B9) & 0x7FFFFFFF (min key wins).
// The numpy path costs ~300 s at 100M edges (a lexsort per sweep); this is
// the production path for full-scale graphs. Returns the sweep count run.
// ---------------------------------------------------------------------------
int64_t gc_labelprop(const int64_t* indptr, const int32_t* indices,
                     int64_t num_nodes, int64_t iters,
                     int64_t* labels /*[n] in-out, init 0..n-1*/) {
  std::vector<int64_t> next(num_nodes);
  std::vector<int32_t> scratch;
  int64_t it = 0;
  for (; it < iters; ++it) {
    bool changed = false;
    for (int64_t v = 0; v < num_nodes; ++v) {
      int64_t e0 = indptr[v], e1 = indptr[v + 1];
      if (e0 == e1) {
        next[v] = labels[v];
        continue;
      }
      scratch.resize(e1 - e0);
      for (int64_t e = e0; e < e1; ++e)
        scratch[e - e0] = (int32_t)labels[indices[e]];
      std::sort(scratch.begin(), scratch.end());
      int64_t best_lab = -1, best_cnt = 0, best_key = INT64_MAX;
      for (size_t i = 0; i < scratch.size();) {
        size_t j = i;
        while (j < scratch.size() && scratch[j] == scratch[i]) ++j;
        int64_t cnt = (int64_t)(j - i);
        int64_t lab = scratch[i];
        int64_t key = (lab * 2654435761LL + it * 0x9E3779B9LL) & 0x7FFFFFFFLL;
        if (cnt > best_cnt || (cnt == best_cnt && key < best_key)) {
          best_cnt = cnt;
          best_key = key;
          best_lab = lab;
        }
        i = j;
      }
      next[v] = best_lab;
      changed |= (best_lab != labels[v]);
    }
    std::copy(next.begin(), next.end(), labels);
    if (!changed) break;
  }
  return it;
}

}  // extern "C"
