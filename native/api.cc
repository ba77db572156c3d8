// C API (extern "C") binding the native loader to Python via ctypes.
//
// Ownership model: handles are opaque pointers created/destroyed here;
// image payloads are copied once into caller-provided numpy buffers
// (the caller queries dimensions first). Error strings are returned
// through a per-call buffer.

#include <cstring>
#include <memory>
#include <unordered_map>

#include "png_codec.h"
#include "tum_loader.h"

using popup::Associate;
using popup::Image;
using popup::OpenSequence;
using popup::Prefetcher;
using popup::Sequence;

namespace {

void SetErr(char* err_buf, int err_len, const std::string& msg) {
  if (!err_buf || err_len <= 0) return;
  std::snprintf(err_buf, static_cast<size_t>(err_len), "%s", msg.c_str());
}

struct SeqHandle {
  Sequence seq;
  std::unique_ptr<Prefetcher> prefetch;
  Image pending;       // last decoded frame awaiting copy-out
  double pending_stamp = 0.0;
  bool has_pending = false;
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------
// One-shot codec
// ---------------------------------------------------------------------

// Decode to caller buffer. Two-phase: call with buf=NULL to get dims
// (w, h, channels, bit_depth), then with a buffer of num_bytes.
int popup_png_decode(const char* path, void* buf, long buf_bytes, int* w,
                     int* h, int* channels, int* bit_depth, char* err_buf,
                     int err_len) {
  Image img;
  std::string err;
  if (!popup::DecodePng(path, &img, &err)) {
    SetErr(err_buf, err_len, err);
    return -1;
  }
  *w = img.width;
  *h = img.height;
  *channels = img.channels;
  *bit_depth = img.bit_depth;
  if (!buf) return 0;
  size_t need = img.num_bytes();
  if (static_cast<size_t>(buf_bytes) < need) {
    SetErr(err_buf, err_len, "buffer too small");
    return -1;
  }
  const void* src = img.bit_depth == 16
                        ? static_cast<const void*>(img.u16.data())
                        : static_cast<const void*>(img.u8.data());
  std::memcpy(buf, src, need);
  return 0;
}

int popup_png_encode(const char* path, const void* buf, int w, int h,
                     int channels, int bit_depth, char* err_buf, int err_len) {
  Image img;
  img.width = w;
  img.height = h;
  img.channels = channels;
  img.bit_depth = bit_depth;
  size_t n = size_t(w) * h * channels;
  if (bit_depth == 16) {
    img.u16.assign(static_cast<const uint16_t*>(buf),
                   static_cast<const uint16_t*>(buf) + n);
  } else {
    img.u8.assign(static_cast<const uint8_t*>(buf),
                  static_cast<const uint8_t*>(buf) + n);
  }
  std::string err;
  if (!popup::EncodePng(path, img, &err)) {
    SetErr(err_buf, err_len, err);
    return -1;
  }
  return 0;
}

// ---------------------------------------------------------------------
// Sequence handles
// ---------------------------------------------------------------------

void* popup_seq_open(const char* root, char* err_buf, int err_len) {
  auto h = std::make_unique<SeqHandle>();
  std::string err;
  if (!OpenSequence(root, &h->seq, &err)) {
    SetErr(err_buf, err_len, err);
    return nullptr;
  }
  return h.release();
}

void popup_seq_close(void* handle) {
  delete static_cast<SeqHandle*>(handle);
}

int popup_seq_num_rgb(void* handle) {
  return static_cast<int>(static_cast<SeqHandle*>(handle)->seq.rgb.size());
}
int popup_seq_num_depth(void* handle) {
  return static_cast<int>(static_cast<SeqHandle*>(handle)->seq.depth.size());
}
int popup_seq_num_gt(void* handle) {
  return static_cast<int>(static_cast<SeqHandle*>(handle)->seq.gt.size());
}
int popup_seq_has_seg(void* handle) {
  return static_cast<SeqHandle*>(handle)->seq.seg.empty() ? 0 : 1;
}

// Copy out stamps: kind 0=rgb, 1=depth, 2=gt.
int popup_seq_stamps(void* handle, int kind, double* out, int capacity) {
  auto* h = static_cast<SeqHandle*>(handle);
  auto fill = [&](auto const& v) {
    int n = std::min<int>(capacity, static_cast<int>(v.size()));
    for (int i = 0; i < n; ++i) out[i] = v[i].stamp;
    return n;
  };
  if (kind == 0) return fill(h->seq.rgb);
  if (kind == 1) return fill(h->seq.depth);
  if (kind == 2) return fill(h->seq.gt);
  return -1;
}

// Copy out ground-truth poses: (n, 7) doubles [tx ty tz qx qy qz qw].
int popup_seq_gt(void* handle, double* out, int capacity) {
  auto* h = static_cast<SeqHandle*>(handle);
  int n = std::min<int>(capacity, static_cast<int>(h->seq.gt.size()));
  for (int i = 0; i < n; ++i) {
    const auto& g = h->seq.gt[i];
    double* row = out + 7 * i;
    for (int k = 0; k < 3; ++k) row[k] = g.t[k];
    for (int k = 0; k < 4; ++k) row[3 + k] = g.q[k];
  }
  return n;
}

// File path of rgb frame i (for fallbacks / seg lookup from Python).
int popup_seq_rgb_path(void* handle, int i, char* out, int capacity) {
  auto* h = static_cast<SeqHandle*>(handle);
  if (i < 0 || i >= static_cast<int>(h->seq.rgb.size())) return -1;
  std::snprintf(out, static_cast<size_t>(capacity), "%s",
                h->seq.rgb[i].path.c_str());
  return 0;
}

// ---------------------------------------------------------------------
// Timestamp association
// ---------------------------------------------------------------------

// Associate two stamp arrays; writes up to `capacity` (i, j) int pairs.
int popup_associate(const double* a, int na, const double* b, int nb,
                    double max_difference, int* out_pairs, int capacity) {
  std::vector<double> va(a, a + na), vb(b, b + nb);
  auto pairs = Associate(va, vb, max_difference);
  int n = std::min<int>(capacity, static_cast<int>(pairs.size()));
  for (int i = 0; i < n; ++i) {
    out_pairs[2 * i] = pairs[i].first;
    out_pairs[2 * i + 1] = pairs[i].second;
  }
  return static_cast<int>(pairs.size());
}

// ---------------------------------------------------------------------
// Prefetch pipeline over the rgb stream (optionally a subset given by
// frame indices — e.g. only gt-associated frames).
// ---------------------------------------------------------------------

int popup_prefetch_start(void* handle, const int* indices, int n_indices,
                         int num_threads, int lookahead, char* err_buf,
                         int err_len) {
  auto* h = static_cast<SeqHandle*>(handle);
  std::vector<popup::StampedFile> files;
  if (indices && n_indices > 0) {
    files.reserve(n_indices);
    for (int k = 0; k < n_indices; ++k) {
      int i = indices[k];
      if (i < 0 || i >= static_cast<int>(h->seq.rgb.size())) {
        SetErr(err_buf, err_len, "frame index out of range");
        return -1;
      }
      files.push_back(h->seq.rgb[i]);
    }
  } else {
    files = h->seq.rgb;
  }
  h->prefetch =
      std::make_unique<Prefetcher>(std::move(files), num_threads, lookahead);
  h->has_pending = false;
  return 0;
}

// Phase 1: decode the next frame (blocking), report dims.
// Returns 1 ok, 0 end-of-stream, -1 error.
int popup_prefetch_next_info(void* handle, int* w, int* h_, int* channels,
                             int* bit_depth, double* stamp, char* err_buf,
                             int err_len) {
  auto* h = static_cast<SeqHandle*>(handle);
  if (!h->prefetch) {
    SetErr(err_buf, err_len, "prefetch not started");
    return -1;
  }
  std::string err;
  if (!h->prefetch->NextFrame(&h->pending, &h->pending_stamp, &err)) {
    if (err.empty()) return 0;
    SetErr(err_buf, err_len, err);
    return -1;
  }
  h->has_pending = true;
  *w = h->pending.width;
  *h_ = h->pending.height;
  *channels = h->pending.channels;
  *bit_depth = h->pending.bit_depth;
  *stamp = h->pending_stamp;
  return 1;
}

// Phase 2: copy the pending frame into the caller buffer.
int popup_prefetch_next_copy(void* handle, void* buf, long buf_bytes,
                             char* err_buf, int err_len) {
  auto* h = static_cast<SeqHandle*>(handle);
  if (!h->has_pending) {
    SetErr(err_buf, err_len, "no pending frame");
    return -1;
  }
  size_t need = h->pending.num_bytes();
  if (static_cast<size_t>(buf_bytes) < need) {
    SetErr(err_buf, err_len, "buffer too small");
    return -1;
  }
  const void* src = h->pending.bit_depth == 16
                        ? static_cast<const void*>(h->pending.u16.data())
                        : static_cast<const void*>(h->pending.u8.data());
  std::memcpy(buf, src, need);
  h->has_pending = false;
  h->pending = Image{};
  return 0;
}

void popup_prefetch_stop(void* handle) {
  static_cast<SeqHandle*>(handle)->prefetch.reset();
}

}  // extern "C"
