// Native data pipeline: NIfTI-1 + PNG/JPEG readers + threaded prefetch.
//
// TPU-native replacement for the IO layer the reference reaches through
// torch DataLoader worker processes + nibabel/PIL (the reference itself
// has no native sources; its native performance lives in dependencies —
// SURVEY.md §2.9). This library provides:
//   * a NIfTI-1 (.nii / .nii.gz) volume reader producing float32 buffers
//   * PNG (8/16-bit gray/RGB/RGBA, palette) and JPEG (8-bit gray/RGB)
//     decoders producing float32 in [0, 1] scaled by the source bit depth
//     (the MedNIST-layout 2D path, GIL-free unlike PIL worker threads)
//   * a worker-pool prefetch loader with a bounded ready-queue so host IO
//     overlaps device compute; workers dispatch per-file by extension
// Exposed as a plain C API consumed from Python via ctypes
// (generativemodels_tpu/data/native.py).
//
// Build: make -C native   (produces libgmtpu_data.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>
#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// NIfTI-1 reading
// ---------------------------------------------------------------------------

#pragma pack(push, 1)
struct Nifti1Header {
  int32_t sizeof_hdr;     // must be 348
  char unused1[36];
  int16_t dim[8];         // dim[0] = ndim, dim[1..7] = sizes
  char unused2[14];
  int16_t datatype;       // NIfTI datatype code
  int16_t bitpix;
  char unused3[2];
  float pixdim[8];
  float vox_offset;       // byte offset to data
  float scl_slope;
  float scl_inter;
  char unused4[224];
  char magic[4];          // "n+1\0" or "ni1\0"
};
#pragma pack(pop)

static_assert(sizeof(Nifti1Header) == 348, "NIfTI-1 header must be 348 bytes");

enum NiftiType : int16_t {
  DT_UINT8 = 2,
  DT_INT16 = 4,
  DT_INT32 = 8,
  DT_FLOAT32 = 16,
  DT_FLOAT64 = 64,
  DT_INT8 = 256,
  DT_UINT16 = 512,
  DT_UINT32 = 768,
};

bool read_file_maybe_gz(const std::string& path, std::vector<uint8_t>& out) {
  gzFile f = gzopen(path.c_str(), "rb");  // handles both plain and gzip
  if (!f) return false;
  constexpr size_t kChunk = 1 << 20;
  size_t used = 0;
  for (;;) {
    out.resize(used + kChunk);
    int n = gzread(f, out.data() + used, kChunk);
    if (n < 0) {
      gzclose(f);
      return false;
    }
    used += static_cast<size_t>(n);
    if (static_cast<size_t>(n) < kChunk) break;
  }
  out.resize(used);
  gzclose(f);
  return true;
}

template <typename T>
void convert_to_float(const uint8_t* src, size_t count, float slope, float inter,
                      float* dst) {
  const T* typed = reinterpret_cast<const T*>(src);
  if (slope == 0.0f) slope = 1.0f;
  for (size_t i = 0; i < count; ++i) {
    dst[i] = static_cast<float>(typed[i]) * slope + inter;
  }
}

struct Volume {
  std::vector<int64_t> shape;  // row-major (dim[ndim] .. dim[1]) => C order
  std::vector<float> data;
  std::string error;
  bool ok = false;
};

Volume read_nifti(const std::string& path) {
  Volume vol;
  std::vector<uint8_t> raw;
  if (!read_file_maybe_gz(path, raw)) {
    vol.error = "cannot open or decompress: " + path;
    return vol;
  }
  if (raw.size() < sizeof(Nifti1Header)) {
    vol.error = "file too small for NIfTI-1 header";
    return vol;
  }
  Nifti1Header hdr;
  std::memcpy(&hdr, raw.data(), sizeof(hdr));
  if (hdr.sizeof_hdr != 348) {
    vol.error = "not a NIfTI-1 file (sizeof_hdr != 348)";
    return vol;
  }
  int ndim = hdr.dim[0];
  if (ndim < 1 || ndim > 7) {
    vol.error = "invalid ndim";
    return vol;
  }
  size_t count = 1;
  for (int i = ndim; i >= 1; --i) {
    vol.shape.push_back(hdr.dim[i]);
    count *= static_cast<size_t>(hdr.dim[i]);
  }
  size_t offset = static_cast<size_t>(hdr.vox_offset);
  if (offset < sizeof(Nifti1Header)) offset = 352;
  size_t elem = static_cast<size_t>(hdr.bitpix) / 8;
  if (raw.size() < offset + count * elem) {
    vol.error = "truncated NIfTI data section";
    return vol;
  }
  vol.data.resize(count);
  const uint8_t* src = raw.data() + offset;
  float s = hdr.scl_slope, b = hdr.scl_inter;
  switch (hdr.datatype) {
    case DT_UINT8: convert_to_float<uint8_t>(src, count, s, b, vol.data.data()); break;
    case DT_INT8: convert_to_float<int8_t>(src, count, s, b, vol.data.data()); break;
    case DT_INT16: convert_to_float<int16_t>(src, count, s, b, vol.data.data()); break;
    case DT_UINT16: convert_to_float<uint16_t>(src, count, s, b, vol.data.data()); break;
    case DT_INT32: convert_to_float<int32_t>(src, count, s, b, vol.data.data()); break;
    case DT_UINT32: convert_to_float<uint32_t>(src, count, s, b, vol.data.data()); break;
    case DT_FLOAT32: convert_to_float<float>(src, count, s, b, vol.data.data()); break;
    case DT_FLOAT64: convert_to_float<double>(src, count, s, b, vol.data.data()); break;
    default:
      vol.error = "unsupported NIfTI datatype " + std::to_string(hdr.datatype);
      return vol;
  }
  vol.ok = true;
  return vol;
}

// ---------------------------------------------------------------------------
// PNG reading (libpng full API: no gamma/colorspace transforms, raw samples
// scaled to [0, 1] by the source bit depth — matches data/pipeline.py's
// dtype-range normalization contract)
// ---------------------------------------------------------------------------

Volume read_png(const std::string& path) {
  Volume vol;
  FILE* fp = std::fopen(path.c_str(), "rb");
  if (!fp) {
    vol.error = "cannot open: " + path;
    return vol;
  }
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    vol.error = "libpng init failed";
    return vol;
  }
  std::vector<png_bytep> rows;  // declared before setjmp: destroyed on error
  std::vector<uint8_t> buf;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    vol.error = "libpng decode error: " + path;
    vol.ok = false;
    return vol;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_swap(png);  // raw PNG is big-endian
  png_read_update_info(png, info);

  bit_depth = png_get_bit_depth(png, info);
  int channels = png_get_channels(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  buf.resize(rowbytes * height);
  rows.resize(height);
  for (png_uint_32 y = 0; y < height; ++y) rows[y] = buf.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);

  size_t count = static_cast<size_t>(width) * height * channels;
  vol.data.resize(count);
  if (bit_depth == 16) {
    const uint16_t* src = reinterpret_cast<const uint16_t*>(buf.data());
    for (size_t i = 0; i < count; ++i) vol.data[i] = src[i] * (1.0f / 65535.0f);
  } else {
    const uint8_t* src = buf.data();
    for (size_t i = 0; i < count; ++i) vol.data[i] = src[i] * (1.0f / 255.0f);
  }
  vol.shape = {static_cast<int64_t>(height), static_cast<int64_t>(width)};
  if (channels > 1) vol.shape.push_back(channels);
  vol.ok = true;
  return vol;
}

// ---------------------------------------------------------------------------
// JPEG reading (libjpeg; 8-bit gray/RGB)
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  std::longjmp(err->jmp, 1);
}

Volume read_jpeg(const std::string& path) {
  Volume vol;
  FILE* fp = std::fopen(path.c_str(), "rb");
  if (!fp) {
    vol.error = "cannot open: " + path;
    return vol;
  }
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    vol.error = "libjpeg decode error: " + path;
    vol.ok = false;
    vol.data.clear();
    return vol;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);

  size_t width = cinfo.output_width;
  size_t height = cinfo.output_height;
  size_t channels = cinfo.output_components;
  std::vector<uint8_t> row(width * channels);
  vol.data.resize(width * height * channels);
  uint8_t* rp = row.data();
  while (cinfo.output_scanline < cinfo.output_height) {
    size_t y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* dst = vol.data.data() + y * width * channels;
    for (size_t i = 0; i < width * channels; ++i) dst[i] = row[i] * (1.0f / 255.0f);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(fp);

  vol.shape = {static_cast<int64_t>(height), static_cast<int64_t>(width)};
  if (channels > 1) vol.shape.push_back(static_cast<int64_t>(channels));
  vol.ok = true;
  return vol;
}

bool ends_with(const std::string& s, const char* suffix) {
  size_t n = std::strlen(suffix);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; ++i) {
    char a = s[s.size() - n + i], b = suffix[i];
    if (a >= 'A' && a <= 'Z') a += 32;
    if (a != b) return false;
  }
  return true;
}

Volume read_any(const std::string& path) {
  if (ends_with(path, ".png")) return read_png(path);
  if (ends_with(path, ".jpg") || ends_with(path, ".jpeg")) return read_jpeg(path);
  return read_nifti(path);
}

// ---------------------------------------------------------------------------
// Threaded prefetch loader
// ---------------------------------------------------------------------------

struct Loader {
  std::vector<std::string> files;
  std::vector<std::thread> workers;
  std::deque<Volume> ready;
  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_space;
  std::atomic<size_t> next_index{0};
  size_t max_queue;
  bool loop;
  std::atomic<bool> stop{false};
  std::atomic<int> active_workers{0};
  std::atomic<size_t> consecutive_failures{0};

  void worker() {
    for (;;) {
      if (stop.load()) break;
      size_t idx = next_index.fetch_add(1);
      if (idx >= files.size()) {
        if (!loop) break;
        idx %= files.size();
      }
      Volume v = read_any(files[idx % files.size()]);
      if (!v.ok) {  // skip unreadable files rather than emit garbage
        std::fprintf(stderr, "[gmtpu_data] skipping: %s\n", v.error.c_str());
        // all-unreadable guard: a full pass of consecutive failures
        // across workers means looping would spin forever — exit so the
        // consumer unblocks at end-of-stream instead
        if (consecutive_failures.fetch_add(1) + 1 >= files.size() && loop) break;
        continue;
      }
      consecutive_failures.store(0);
      std::unique_lock<std::mutex> lock(mu);
      cv_space.wait(lock, [&] { return ready.size() < max_queue || stop.load(); });
      if (stop.load()) break;
      ready.push_back(std::move(v));
      cv_ready.notify_one();
    }
    active_workers.fetch_sub(1);
    cv_ready.notify_all();
  }
};

}  // namespace

extern "C" {

// -- one-shot volume API ----------------------------------------------------

// Reads a NIfTI file; returns a handle (Volume*) or nullptr.
void* gmtpu_read_nifti(const char* path) {
  Volume* v = new Volume(read_nifti(path));
  if (!v->ok) {
    delete v;
    return nullptr;
  }
  return v;
}

// Reads a PNG/JPEG image (float32 in [0,1], (H, W) or (H, W, C)) or any
// other supported format by extension; returns a Volume* handle or nullptr.
void* gmtpu_read_image(const char* path) {
  Volume* v = new Volume(read_any(path));
  if (!v->ok) {
    delete v;
    return nullptr;
  }
  return v;
}

int gmtpu_volume_ndim(void* handle) {
  return static_cast<int>(static_cast<Volume*>(handle)->shape.size());
}

void gmtpu_volume_shape(void* handle, int64_t* out) {
  Volume* v = static_cast<Volume*>(handle);
  std::memcpy(out, v->shape.data(), v->shape.size() * sizeof(int64_t));
}

const float* gmtpu_volume_data(void* handle) {
  return static_cast<Volume*>(handle)->data.data();
}

void gmtpu_volume_free(void* handle) { delete static_cast<Volume*>(handle); }

// -- prefetch loader API ----------------------------------------------------

void* gmtpu_loader_create(const char** paths, int num_paths, int num_workers,
                          int max_queue, int loop) {
  Loader* loader = new Loader();
  loader->files.assign(paths, paths + num_paths);
  loader->max_queue = static_cast<size_t>(max_queue);
  loader->loop = loop != 0;
  loader->active_workers = num_workers;
  for (int i = 0; i < num_workers; ++i) {
    loader->workers.emplace_back(&Loader::worker, loader);
  }
  return loader;
}

// Blocks until a volume is ready; returns a Volume* handle or nullptr when
// the (non-looping) loader is exhausted.
void* gmtpu_loader_next(void* handle) {
  Loader* loader = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lock(loader->mu);
  loader->cv_ready.wait(lock, [&] {
    return !loader->ready.empty() || loader->active_workers.load() == 0;
  });
  if (loader->ready.empty()) return nullptr;
  Volume* v = new Volume(std::move(loader->ready.front()));
  loader->ready.pop_front();
  loader->cv_space.notify_one();
  return v;
}

void gmtpu_loader_destroy(void* handle) {
  Loader* loader = static_cast<Loader*>(handle);
  loader->stop.store(true);
  loader->cv_space.notify_all();
  loader->cv_ready.notify_all();
  for (auto& t : loader->workers) {
    if (t.joinable()) t.join();
  }
  delete loader;
}

}  // extern "C"
