// polygonize: class-raster -> polygon rings (pixel coords), C++.
//
// Native replacement for the reference's rasterio.features.shapes-based
// vectorization (flair_zonal_detection/inference.py:359-413). For one class
// value: 4-connected components, boundary-edge extraction, ring linking with
// a sharpest-right-turn rule at pinch vertices. Rings are emitted per region
// (shell = largest |area|, rest = holes — resolved on the Python side).
//
// Output buffer layout (int64):
//   [n_regions]
//   per region: [region_id, n_rings]
//     per ring: [n_pts, x0, y0, x1, y1, ...]   (closed: first==last)

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct V {
  int64_t x, y;
  bool operator==(const V& o) const { return x == o.x && y == o.y; }
};
struct VH {
  size_t operator()(const V& v) const {
    return std::hash<int64_t>()(v.x * 1315423911LL + v.y);
  }
};

}  // namespace

extern "C" {

// Returns number of int64 values written to out (or required if out==null
// with out_cap 0; caller should call twice or give a generous buffer).
// Returns -1 on overflow of out_cap.
int64_t plg_polygonize(const uint8_t* data, int64_t w, int64_t h, uint8_t cls,
                       int64_t* out, int64_t out_cap) {
  // 1. connected components (4-connectivity), union-find over rows
  std::vector<int32_t> label((size_t)w * h, -1);
  std::vector<int32_t> parent;
  auto find = [&](int32_t a) {
    while (parent[a] != a) {
      parent[a] = parent[parent[a]];
      a = parent[a];
    }
    return a;
  };
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      if (data[y * w + x] != cls) continue;
      int32_t left = (x > 0 && data[y * w + x - 1] == cls)
                         ? label[y * w + x - 1] : -1;
      int32_t up = (y > 0 && data[(y - 1) * w + x] == cls)
                       ? label[(y - 1) * w + x] : -1;
      if (left < 0 && up < 0) {
        int32_t id = (int32_t)parent.size();
        parent.push_back(id);
        label[y * w + x] = id;
      } else if (left >= 0 && up < 0) {
        label[y * w + x] = find(left);
      } else if (left < 0 && up >= 0) {
        label[y * w + x] = find(up);
      } else {
        int32_t a = find(left), b = find(up);
        if (a != b) parent[b] = a;
        label[y * w + x] = a;
      }
    }
  }
  if (parent.empty()) {
    if (out_cap < 1) return 1;
    out[0] = 0;
    return 1;
  }
  // canonicalize labels
  std::unordered_map<int32_t, int32_t> canon;
  for (int64_t i = 0; i < w * h; ++i) {
    if (label[i] >= 0) {
      int32_t root = find(label[i]);
      auto it = canon.find(root);
      if (it == canon.end()) {
        int32_t id = (int32_t)canon.size();
        canon[root] = id;
        label[i] = id;
      } else {
        label[i] = it->second;
      }
    }
  }
  const int32_t n_regions = (int32_t)canon.size();

  // 2. boundary edges per region; directed so each cell is traced clockwise
  // (image coords, y down): N: (x,y)->(x+1,y); E: (x+1,y)->(x+1,y+1);
  // S: (x+1,y+1)->(x,y+1); W: (x,y+1)->(x,y).
  struct Edge {
    V a, b;
  };
  std::vector<std::vector<Edge>> edges(n_regions);
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      int32_t r = label[y * w + x];
      if (r < 0) continue;
      bool nb;
      nb = (y > 0 && label[(y - 1) * w + x] == r);
      if (!nb) edges[r].push_back({{x, y}, {x + 1, y}});
      nb = (x + 1 < w && label[y * w + x + 1] == r);
      if (!nb) edges[r].push_back({{x + 1, y}, {x + 1, y + 1}});
      nb = (y + 1 < h && label[(y + 1) * w + x] == r);
      if (!nb) edges[r].push_back({{x + 1, y + 1}, {x, y + 1}});
      nb = (x > 0 && label[y * w + x - 1] == r);
      if (!nb) edges[r].push_back({{x, y + 1}, {x, y}});
    }
  }

  // 3. link edges into rings per region
  int64_t pos = 0;
  auto emit = [&](int64_t v) -> bool {
    if (out && pos < out_cap) out[pos] = v;
    ++pos;
    return out == nullptr || pos <= out_cap;
  };
  emit(n_regions);

  for (int32_t r = 0; r < n_regions; ++r) {
    auto& es = edges[r];
    std::unordered_map<V, std::vector<int32_t>, VH> by_start;
    by_start.reserve(es.size() * 2);
    for (int32_t i = 0; i < (int32_t)es.size(); ++i)
      by_start[es[i].a].push_back(i);
    std::vector<bool> used(es.size(), false);

    // count rings first (two passes would re-run linking); instead collect
    std::vector<std::vector<V>> rings;
    for (int32_t i0 = 0; i0 < (int32_t)es.size(); ++i0) {
      if (used[i0]) continue;
      std::vector<V> ring;
      int32_t cur = i0;
      ring.push_back(es[cur].a);
      while (true) {
        used[cur] = true;
        V end = es[cur].b;
        ring.push_back(end);
        if (end == ring.front()) break;
        auto it = by_start.find(end);
        int32_t next = -1;
        if (it != by_start.end()) {
          // sharpest right turn relative to incoming direction
          int64_t dx = es[cur].b.x - es[cur].a.x;
          int64_t dy = es[cur].b.y - es[cur].a.y;
          // preference: right turn (dy,-dx in y-down = rotate -90), straight,
          // left turn, U-turn
          V prefs[4] = {
              {end.x - dy, end.y + dx},   // right (clockwise in y-down)
              {end.x + dx, end.y + dy},   // straight
              {end.x + dy, end.y - dx},   // left
              {end.x - dx, end.y - dy},   // back
          };
          for (const V& want : prefs) {
            for (int32_t cand : it->second) {
              if (!used[cand] && es[cand].b == want) {
                next = cand;
                break;
              }
            }
            if (next >= 0) break;
          }
          if (next < 0) {
            for (int32_t cand : it->second)
              if (!used[cand]) { next = cand; break; }
          }
        }
        if (next < 0) break;  // open chain (shouldn't happen)
        cur = next;
      }
      if (ring.size() >= 4 && ring.front() == ring.back())
        rings.push_back(std::move(ring));
    }

    emit(r);
    emit((int64_t)rings.size());
    for (auto& ring : rings) {
      emit((int64_t)ring.size());
      for (auto& v : ring) {
        emit(v.x);
        if (!emit(v.y)) return -1;
      }
    }
    if (out && pos > out_cap) return -1;
  }
  if (out && pos > out_cap) return -1;
  return pos;
}

// Unique values present in a uint8 raster -> out[256] counts.
void plg_histogram(const uint8_t* data, int64_t n, int64_t* out256) {
  std::memset(out256, 0, 256 * sizeof(int64_t));
  for (int64_t i = 0; i < n; ++i) ++out256[data[i]];
}

}  // extern "C"
