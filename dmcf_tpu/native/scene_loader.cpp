// Native scene-loader core: zstd decompression + msgpack scene decoding.
//
// The runtime analog of the reference's native data machinery (tensorpack /
// ZMQ worker processes + zstd/msgpack per scene): scene files are decoded
// off the Python GIL so the prefetcher threads parallelize for real.
// Exposed through a C ABI consumed via ctypes (no pybind11 in this image).
//
// Scope: the msgpack subset produced by our writer and the reference's
// datasets (msgpack_numpy wire format: arrays as fixmaps with b"nd",
// b"type", b"shape", b"data" entries).  Array payloads are zero-copy views
// into the decompressed blob, which stays alive for the handle's lifetime.
//
// Build: make -C dmcf_tpu/native   (produces libscene_loader.so)

#include <zstd.h>

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <vector>

namespace {

struct Array {
  std::string dtype;          // numpy descr, e.g. "<f4"
  std::vector<int64_t> shape; // empty => scalar
  const uint8_t* data = nullptr;
  size_t nbytes = 0;
};

struct Value {
  enum Kind { NONE, INT, FLOAT, STR, ARRAY } kind = NONE;
  int64_t i = 0;
  double f = 0.0;
  std::string s;
  Array arr;
};

using Frame = std::map<std::string, Value>;

struct Scene {
  std::vector<uint8_t> blob;  // decompressed msgpack payload
  std::vector<Frame> frames;
  std::string error;
};

class Reader {
 public:
  Reader(const uint8_t* p, size_t n) : p_(p), n_(n) {}

  bool ok() const { return ok_; }
  size_t pos() const { return pos_; }

  uint8_t peek() { return pos_ < n_ ? p_[pos_] : (fail(), 0); }
  uint8_t u8() { return need(1) ? p_[pos_++] : 0; }

  uint64_t be(int bytes) {
    if (!need(bytes)) return 0;
    uint64_t v = 0;
    for (int i = 0; i < bytes; ++i) v = (v << 8) | p_[pos_++];
    return v;
  }

  const uint8_t* bytes(size_t len) {
    if (!need(len)) return nullptr;
    const uint8_t* out = p_ + pos_;
    pos_ += len;
    return out;
  }

 private:
  bool need(size_t k) {
    if (pos_ + k > n_) { fail(); return false; }
    return true;
  }
  void fail() { ok_ = false; pos_ = n_; }

  const uint8_t* p_;
  size_t n_;
  size_t pos_ = 0;
  bool ok_ = true;
};

bool parse_value(Reader& r, Value& out);

bool parse_raw_string(Reader& r, std::string& out) {
  // str or bin family (msgpack_numpy uses bin keys like b"nd")
  uint8_t t = r.u8();
  size_t len;
  if ((t & 0xE0) == 0xA0) len = t & 0x1F;          // fixstr
  else if (t == 0xD9 || t == 0xC4) len = r.be(1);  // str8 / bin8
  else if (t == 0xDA || t == 0xC5) len = r.be(2);  // str16 / bin16
  else if (t == 0xDB || t == 0xC6) len = r.be(4);  // str32 / bin32
  else return false;
  const uint8_t* p = r.bytes(len);
  if (!p) return false;
  out.assign(reinterpret_cast<const char*>(p), len);
  return true;
}

bool parse_int(Reader& r, int64_t& out) {
  uint8_t t = r.u8();
  if (t < 0x80) { out = t; return true; }                    // pos fixint
  if (t >= 0xE0) { out = static_cast<int8_t>(t); return true; }  // neg
  switch (t) {
    case 0xCC: out = (int64_t)r.be(1); return true;
    case 0xCD: out = (int64_t)r.be(2); return true;
    case 0xCE: out = (int64_t)r.be(4); return true;
    case 0xCF: out = (int64_t)r.be(8); return true;
    case 0xD0: out = (int8_t)r.be(1); return true;
    case 0xD1: out = (int16_t)r.be(2); return true;
    case 0xD2: out = (int32_t)r.be(4); return true;
    case 0xD3: out = (int64_t)r.be(8); return true;
    default: return false;
  }
}

bool skip_or_store_map(Reader& r, size_t n_entries, Value& out) {
  // msgpack_numpy array maps are written with b"nd" as their first key;
  // dispatch on it after consuming it (no rewinding needed)
  std::string first_key;
  if (!parse_raw_string(r, first_key)) return false;
  if (first_key == "nd") {
    // we've consumed the key; emulate by handling remaining entries plus
    // the already-consumed "nd" value inline
    uint8_t t = r.u8();
    bool nd;
    if (t == 0xC3) nd = true;
    else if (t == 0xC2) nd = false;
    else return false;
    (void)nd;
    // parse remaining entries as ndarray fields
    Array arr;
    for (size_t i = 1; i < n_entries; ++i) {
      std::string key;
      if (!parse_raw_string(r, key)) return false;
      if (key == "type") {
        if (!parse_raw_string(r, arr.dtype)) return false;
      } else if (key == "kind") {
        std::string ignore;
        if (!parse_raw_string(r, ignore)) return false;
      } else if (key == "shape") {
        uint8_t t2 = r.u8();
        size_t len;
        if ((t2 & 0xF0) == 0x90) len = t2 & 0x0F;
        else if (t2 == 0xDC) len = r.be(2);
        else if (t2 == 0xDD) len = r.be(4);
        else return false;
        for (size_t j = 0; j < len; ++j) {
          int64_t v;
          if (!parse_int(r, v)) return false;
          arr.shape.push_back(v);
        }
      } else if (key == "data") {
        uint8_t t2 = r.u8();
        size_t len;
        if (t2 == 0xC4) len = r.be(1);
        else if (t2 == 0xC5) len = r.be(2);
        else if (t2 == 0xC6) len = r.be(4);
        else return false;
        arr.data = r.bytes(len);
        arr.nbytes = len;
        if (!arr.data && len) return false;
      } else {
        Value ignore;
        if (!parse_value(r, ignore)) return false;
      }
    }
    out.kind = Value::ARRAY;
    out.arr = std::move(arr);
    return true;
  }
  // generic map: store nothing (frames' values of interest are arrays,
  // ints and strings); parse the value for the consumed key, then the rest
  {
    Value ignore;
    if (!parse_value(r, ignore)) return false;
  }
  for (size_t i = 1; i < n_entries; ++i) {
    std::string key;
    if (!parse_raw_string(r, key)) return false;
    Value ignore;
    if (!parse_value(r, ignore)) return false;
  }
  out.kind = Value::NONE;
  return true;
}

bool parse_value(Reader& r, Value& out) {
  uint8_t t = r.peek();
  if (t < 0x80 || t >= 0xE0 || t == 0xCC || t == 0xCD || t == 0xCE ||
      t == 0xCF || t == 0xD0 || t == 0xD1 || t == 0xD2 || t == 0xD3) {
    out.kind = Value::INT;
    return parse_int(r, out.i);
  }
  if ((t & 0xE0) == 0xA0 || t == 0xD9 || t == 0xDA || t == 0xDB ||
      t == 0xC4 || t == 0xC5 || t == 0xC6) {
    out.kind = Value::STR;
    return parse_raw_string(r, out.s);
  }
  if (t == 0xC0) { r.u8(); out.kind = Value::NONE; return true; }
  if (t == 0xC2 || t == 0xC3) {
    r.u8();
    out.kind = Value::INT;
    out.i = (t == 0xC3);
    return true;
  }
  if (t == 0xCA) {
    r.u8();
    uint32_t bits = (uint32_t)r.be(4);
    float f;
    std::memcpy(&f, &bits, 4);
    out.kind = Value::FLOAT;
    out.f = f;
    return true;
  }
  if (t == 0xCB) {
    r.u8();
    uint64_t bits = r.be(8);
    double f;
    std::memcpy(&f, &bits, 8);
    out.kind = Value::FLOAT;
    out.f = f;
    return true;
  }
  if ((t & 0xF0) == 0x90 || t == 0xDC || t == 0xDD) {  // array
    r.u8();
    size_t len = ((t & 0xF0) == 0x90) ? (t & 0x0F)
                 : (t == 0xDC ? r.be(2) : r.be(4));
    for (size_t i = 0; i < len; ++i) {
      Value ignore;
      if (!parse_value(r, ignore)) return false;
    }
    out.kind = Value::NONE;
    return true;
  }
  if ((t & 0xF0) == 0x80 || t == 0xDE || t == 0xDF) {  // map
    r.u8();
    size_t len = ((t & 0xF0) == 0x80) ? (t & 0x0F)
                 : (t == 0xDE ? r.be(2) : r.be(4));
    return skip_or_store_map(r, len, out);
  }
  return false;
}

bool parse_frame(Reader& r, Frame& frame) {
  uint8_t t = r.u8();
  size_t len;
  if ((t & 0xF0) == 0x80) len = t & 0x0F;
  else if (t == 0xDE) len = r.be(2);
  else if (t == 0xDF) len = r.be(4);
  else return false;
  for (size_t i = 0; i < len; ++i) {
    std::string key;
    if (!parse_raw_string(r, key)) return false;
    Value v;
    if (!parse_value(r, v)) return false;
    frame.emplace(std::move(key), std::move(v));
  }
  return true;
}

std::mutex g_mutex;
std::map<int64_t, std::unique_ptr<Scene>> g_scenes;
int64_t g_next = 1;

}  // namespace

extern "C" {

// Open and fully decode a scene file.  Returns handle > 0, or <= 0 on
// error (call scene_error for the message of handle 0 semantics).
int64_t scene_open(const char* path) {
  auto scene = std::make_unique<Scene>();

  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> comp(fsize);
  if (std::fread(comp.data(), 1, fsize, f) != (size_t)fsize) {
    std::fclose(f);
    return -2;
  }
  std::fclose(f);

  unsigned long long raw = ZSTD_getFrameContentSize(comp.data(), fsize);
  if (raw == ZSTD_CONTENTSIZE_ERROR) return -3;
  if (raw == ZSTD_CONTENTSIZE_UNKNOWN) raw = (unsigned long long)fsize * 40;
  scene->blob.resize(raw);
  size_t got = ZSTD_decompress(scene->blob.data(), raw, comp.data(), fsize);
  if (ZSTD_isError(got)) return -3;
  scene->blob.resize(got);

  Reader r(scene->blob.data(), scene->blob.size());
  uint8_t t = r.u8();
  size_t n_frames;
  if ((t & 0xF0) == 0x90) n_frames = t & 0x0F;
  else if (t == 0xDC) n_frames = r.be(2);
  else if (t == 0xDD) n_frames = r.be(4);
  else return -4;

  scene->frames.resize(n_frames);
  for (size_t i = 0; i < n_frames; ++i) {
    if (!parse_frame(r, scene->frames[i]) || !r.ok()) return -5;
  }

  std::lock_guard<std::mutex> lock(g_mutex);
  int64_t h = g_next++;
  g_scenes[h] = std::move(scene);
  return h;
}

int64_t scene_num_frames(int64_t h) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_scenes.find(h);
  return it == g_scenes.end() ? -1 : (int64_t)it->second->frames.size();
}

// Fetch array metadata+pointer for frames[frame][key].
// Returns 0 on success; shape_out must hold 8 entries; ndim_out, the dtype
// string (16 bytes) and the data pointer are written through.
int scene_get_array(int64_t h, int64_t frame, const char* key,
                    const uint8_t** data_out, int64_t* nbytes_out,
                    int64_t* shape_out, int* ndim_out, char* dtype_out) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_scenes.find(h);
  if (it == g_scenes.end()) return -1;
  auto& frames = it->second->frames;
  if (frame < 0 || (size_t)frame >= frames.size()) return -2;
  auto vit = frames[frame].find(key);
  if (vit == frames[frame].end()) return -3;
  if (vit->second.kind != Value::ARRAY) return -4;
  const Array& a = vit->second.arr;
  *data_out = a.data;
  *nbytes_out = (int64_t)a.nbytes;
  *ndim_out = (int)a.shape.size();
  for (size_t i = 0; i < a.shape.size() && i < 8; ++i)
    shape_out[i] = a.shape[i];
  std::snprintf(dtype_out, 16, "%s", a.dtype.c_str());
  return 0;
}

// Scalar int (e.g. frame_id) or string (scene_id) accessors.
int scene_get_int(int64_t h, int64_t frame, const char* key,
                  int64_t* out) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_scenes.find(h);
  if (it == g_scenes.end()) return -1;
  auto& frames = it->second->frames;
  if (frame < 0 || (size_t)frame >= frames.size()) return -2;
  auto vit = frames[frame].find(key);
  if (vit == frames[frame].end()) return -3;
  if (vit->second.kind == Value::INT) { *out = vit->second.i; return 0; }
  if (vit->second.kind == Value::FLOAT) {
    *out = (int64_t)vit->second.f;
    return 0;
  }
  return -4;
}

int scene_has_key(int64_t h, int64_t frame, const char* key) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_scenes.find(h);
  if (it == g_scenes.end()) return 0;
  auto& frames = it->second->frames;
  if (frame < 0 || (size_t)frame >= frames.size()) return 0;
  return frames[frame].count(key) ? 1 : 0;
}

void scene_close(int64_t h) {
  std::lock_guard<std::mutex> lock(g_mutex);
  g_scenes.erase(h);
}

}  // extern "C"
