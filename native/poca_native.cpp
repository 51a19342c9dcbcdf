// Native runtime for cpppathtracer_tpu: host-side components that the
// reference implements in C++ (BVH build thread, frame packing, image IO)
// rebuilt as a small C library consumed via ctypes.
//
// - BVH median-split builder: the algorithm of SceneBVH::Divide
//   (reference cuSrc/bvh.cu:31-95) on flat arrays, preorder node layout,
//   stable centroid sort; bit-compatible with the NumPy fallback
//   (cpppathtracer_tpu/ops/bvh.py:build_bvh_numpy).
// - PNG encoder (zlib): the frame sink's fast path, replacing the
//   reference's Win32 GDI blit + OpenCV imread pipeline for headless pods.
// - BGRA/RGB8 packing: the Mix kernel's byte packing (path_tracer.cu:251-253)
//   for host-side consumers.
//
// Build: make -C native   ->  libpoca_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// BVH build
// ---------------------------------------------------------------------------

// Builds the flat BVH. Inputs: n object AABBs (min/max, [n*3] row-major).
// Outputs (caller-allocated, capacity 2n): left/right/obj (int32),
// node_min/node_max ([2n*3] float). Returns node count (<= 2n-1), or -1.
int poca_bvh_build(int n, const float* aabb_min, const float* aabb_max,
                   int* left, int* right, int* obj,
                   float* node_min, float* node_max) {
  if (n <= 0) return -1;
  std::vector<int> order;
  order.reserve(n);
  for (int i = 0; i < n; ++i) {
    if (aabb_min[i * 3] <= aabb_max[i * 3]) order.push_back(i);
  }
  std::vector<float> cent(static_cast<size_t>(n) * 3);
  for (int i = 0; i < n; ++i)
    for (int a = 0; a < 3; ++a)
      cent[i * 3 + a] = (aabb_min[i * 3 + a] + aabb_max[i * 3 + a]) * 0.5f;

  int count = 0;
  // Explicit stack to avoid deep recursion on large scenes. Each frame
  // emits its node preorder then processes [l,mid) before [mid,r), exactly
  // like the recursive reference build.
  struct Frame {
    int l, r, node, stage;
  };
  std::vector<Frame> stack;
  stack.push_back({0, static_cast<int>(order.size()), -1, 0});
  // To mirror recursion we do it recursively via an explicit lambda-stack;
  // simpler: plain recursion with our own stack of work items where
  // child linking happens through a parent pointer.
  stack.clear();

  struct Work {
    int l, r, parent, which;  // which: 0=left child of parent, 1=right
  };
  std::vector<Work> work;
  if (!order.empty()) work.push_back({0, static_cast<int>(order.size()), -1, 0});
  while (!work.empty()) {
    Work w = work.back();
    work.pop_back();
    if (w.l >= w.r) continue;
    int idx = count++;
    if (w.parent >= 0) {
      (w.which == 0 ? left : right)[w.parent] = idx;
    }
    left[idx] = -1;
    right[idx] = -1;
    obj[idx] = -1;
    if (w.l == w.r - 1) {
      int o = order[w.l];
      obj[idx] = o;
      std::memcpy(node_min + idx * 3, aabb_min + o * 3, 3 * sizeof(float));
      std::memcpy(node_max + idx * 3, aabb_max + o * 3, 3 * sizeof(float));
      continue;
    }
    float gmin[3] = {INFINITY, INFINITY, INFINITY};
    float gmax[3] = {-INFINITY, -INFINITY, -INFINITY};
    for (int i = w.l; i < w.r; ++i) {
      int o = order[i];
      for (int a = 0; a < 3; ++a) {
        gmin[a] = std::min(gmin[a], aabb_min[o * 3 + a]);
        gmax[a] = std::max(gmax[a], aabb_max[o * 3 + a]);
      }
    }
    float span[3] = {gmax[0] - gmin[0], gmax[1] - gmin[1], gmax[2] - gmin[2]};
    int axis = (span[0] >= span[1] && span[0] >= span[2]) ? 0
               : (span[1] >= span[2]) ? 1
                                      : 2;
    std::stable_sort(order.begin() + w.l, order.begin() + w.r,
                     [&](int a, int b) {
                       return cent[a * 3 + axis] < cent[b * 3 + axis];
                     });
    std::memcpy(node_min + idx * 3, gmin, 3 * sizeof(float));
    std::memcpy(node_max + idx * 3, gmax, 3 * sizeof(float));
    int mid = (w.l + w.r) / 2;
    // LIFO: push right first so left pops (and allocates preorder) first.
    work.push_back({mid, w.r, idx, 1});
    work.push_back({w.l, mid, idx, 0});
  }
  return count;
}

// ---------------------------------------------------------------------------
// Frame packing (Mix kernel byte layout, path_tracer.cu:251-253)
// ---------------------------------------------------------------------------

void poca_pack_bgra8(const float* rgb, int n_pixels, uint8_t* out) {
  for (int i = 0; i < n_pixels; ++i) {
    float r = rgb[i * 3 + 0], g = rgb[i * 3 + 1], b = rgb[i * 3 + 2];
    r = r < 0 ? 0 : (r > 1 ? 1 : r);
    g = g < 0 ? 0 : (g > 1 ? 1 : g);
    b = b < 0 ? 0 : (b > 1 ? 1 : b);
    out[i * 4 + 0] = static_cast<uint8_t>(255.99f * b);
    out[i * 4 + 1] = static_cast<uint8_t>(255.99f * g);
    out[i * 4 + 2] = static_cast<uint8_t>(255.99f * r);
    out[i * 4 + 3] = 255;
  }
}

void poca_pack_rgb8(const float* rgb, int n_pixels, uint8_t* out) {
  for (int i = 0; i < n_pixels * 3; ++i) {
    float v = rgb[i];
    v = v < 0 ? 0 : (v > 1 ? 1 : v);
    out[i] = static_cast<uint8_t>(255.99f * v);
  }
}

// ---------------------------------------------------------------------------
// PNG encode (zlib) — returns bytes written or -1; out must have capacity
// >= poca_png_bound(w, h).
// ---------------------------------------------------------------------------

size_t poca_png_bound(int w, int h) {
  size_t raw = static_cast<size_t>(h) * (static_cast<size_t>(w) * 3 + 1);
  return compressBound(raw) + 1024;
}

static void put_be32(uint8_t* p, uint32_t v) {
  p[0] = v >> 24;
  p[1] = v >> 16;
  p[2] = v >> 8;
  p[3] = v;
}

long poca_png_encode(const uint8_t* rgb, int w, int h, uint8_t* out,
                     size_t out_cap) {
  size_t raw_len = static_cast<size_t>(h) * (static_cast<size_t>(w) * 3 + 1);
  std::vector<uint8_t> raw(raw_len);
  for (int y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + static_cast<size_t>(y) * (w * 3 + 1);
    row[0] = 0;  // filter: none
    std::memcpy(row + 1, rgb + static_cast<size_t>(y) * w * 3, w * 3);
  }
  uLongf comp_len = compressBound(raw_len);
  std::vector<uint8_t> comp(comp_len);
  if (compress2(comp.data(), &comp_len, raw.data(), raw_len, 6) != Z_OK)
    return -1;

  size_t need = 8 + 25 + (12 + comp_len) + 12;
  if (out_cap < need) return -1;
  uint8_t* p = out;
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  std::memcpy(p, sig, 8);
  p += 8;

  auto chunk = [&](const char* tag, const uint8_t* data, uint32_t len) {
    put_be32(p, len);
    std::memcpy(p + 4, tag, 4);
    if (len) std::memcpy(p + 8, data, len);
    uint32_t crc = crc32(0, p + 4, len + 4);
    put_be32(p + 8 + len, crc);
    p += 12 + len;
  };

  uint8_t ihdr[13];
  put_be32(ihdr, static_cast<uint32_t>(w));
  put_be32(ihdr + 4, static_cast<uint32_t>(h));
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type RGB
  ihdr[10] = 0;
  ihdr[11] = 0;
  ihdr[12] = 0;
  chunk("IHDR", ihdr, 13);
  chunk("IDAT", comp.data(), static_cast<uint32_t>(comp_len));
  chunk("IEND", nullptr, 0);
  return static_cast<long>(p - out);
}

long poca_png_write(const uint8_t* rgb, int w, int h, const char* path) {
  size_t cap = poca_png_bound(w, h);
  std::vector<uint8_t> buf(cap);
  long n = poca_png_encode(rgb, w, h, buf.data(), cap);
  if (n < 0) return -1;
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  size_t written = std::fwrite(buf.data(), 1, static_cast<size_t>(n), f);
  std::fclose(f);
  return written == static_cast<size_t>(n) ? n : -1;
}

}  // extern "C"
