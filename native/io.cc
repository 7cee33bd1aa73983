// splatformer_tpu native IO runtime: threaded image decoding (PNG/JPEG) and
// COLMAP binary parsing, exposed as a C ABI consumed via ctypes
// (splatformer_tpu/data/native_io.py).
//
// This replaces the reference's Python-side PIL reads on the dataloader hot
// path (/root/reference/dataset/GS.py:128-151) with a libpng/libjpeg decoder
// plus a std::thread pool, overlapping decode with host->device transfer.
// The compute path stays JAX/XLA; this is host runtime, per the framework's
// native-runtime layer.

#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

extern "C" {
#include <jpeglib.h>
}

namespace {

// ---------------------------------------------------------------- thread pool
class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void Submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

ThreadPool* GlobalPool() {
  static ThreadPool pool(
      std::max(2u, std::thread::hardware_concurrency()));
  return &pool;
}

// ------------------------------------------------------------- PNG decoding
bool DecodePNG(const char* path, std::vector<float>* out, int* w, int* h,
               int* channels) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  unsigned char header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  int nch = png_get_channels(png, info);
  *channels = nch;

  std::vector<png_byte> row(png_get_rowbytes(png, info));
  out->resize(static_cast<size_t>(*w) * *h * nch);
  for (int y = 0; y < *h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out->data() + static_cast<size_t>(y) * *w * nch;
    for (int i = 0; i < *w * nch; ++i) dst[i] = row[i] / 255.0f;
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

// ------------------------------------------------------------ JPEG decoding
bool DecodeJPEG(const char* path, std::vector<float>* out, int* w, int* h,
                int* channels) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  *channels = 3;
  out->resize(static_cast<size_t>(*w) * *h * 3);
  std::vector<unsigned char> row(static_cast<size_t>(*w) * 3);
  unsigned char* rowp = row.data();
  for (int y = 0; y < *h; ++y) {
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    float* dst = out->data() + static_cast<size_t>(y) * *w * 3;
    for (int i = 0; i < *w * 3; ++i) dst[i] = row[i] / 255.0f;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

bool DecodeAny(const char* path, std::vector<float>* out, int* w, int* h,
               int* c) {
  size_t len = strlen(path);
  if (len > 4 && (strcmp(path + len - 4, ".png") == 0 ||
                  strcmp(path + len - 4, ".PNG") == 0))
    return DecodePNG(path, out, w, h, c);
  if (DecodeJPEG(path, out, w, h, c)) return true;
  return DecodePNG(path, out, w, h, c);
}

}  // namespace

extern "C" {

// Probe an image's dimensions/channels. Returns 0 on success.
int sf_image_info(const char* path, int* w, int* h, int* channels) {
  std::vector<float> tmp;
  return DecodeAny(path, &tmp, w, h, channels) ? 0 : 1;
}

// Decode one image into a caller-allocated float32 buffer (h*w*channels).
int sf_decode_image(const char* path, float* out, int w, int h, int channels) {
  std::vector<float> tmp;
  int dw, dh, dc;
  if (!DecodeAny(path, &tmp, &dw, &dh, &dc)) return 1;
  if (dw != w || dh != h || dc != channels) return 2;
  memcpy(out, tmp.data(), tmp.size() * sizeof(float));
  return 0;
}

// Decode a batch of images concurrently on the pool. `paths` is a packed
// array of null-terminated strings; every image must match (w, h, channels).
// Returns the number of failures.
int sf_decode_batch(const char** paths, int n, float* out, int w, int h,
                    int channels) {
  std::atomic<int> failures{0};
  std::atomic<int> remaining{n};
  std::mutex mu;
  std::condition_variable cv;
  size_t stride = static_cast<size_t>(w) * h * channels;
  for (int i = 0; i < n; ++i) {
    GlobalPool()->Submit([&, i] {
      if (sf_decode_image(paths[i], out + stride * i, w, h, channels) != 0)
        failures.fetch_add(1);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return remaining.load() == 0; });
  return failures.load();
}

// ------------------------------------------------------- COLMAP binary parse
// Parses images.bin into flat arrays: qvec (n,4), tvec (n,3), camera_id (n,),
// names packed null-terminated into name_buf. Two-phase: call with
// n_images=0 to get counts, then with allocated buffers.
int sf_read_colmap_images_bin(const char* path, long long* n_images,
                              double* qvec, double* tvec, int* camera_id,
                              char* name_buf, long long* name_buf_len) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  uint64_t n;
  if (fread(&n, 8, 1, fp) != 1) {
    fclose(fp);
    return 1;
  }
  bool count_only = (*n_images == 0);
  long long names_needed = 0;
  for (uint64_t i = 0; i < n; ++i) {
    int32_t img_id, cam_id;
    double q[4], t[3];
    if (fread(&img_id, 4, 1, fp) != 1 || fread(q, 8, 4, fp) != 4 ||
        fread(t, 8, 3, fp) != 3 || fread(&cam_id, 4, 1, fp) != 1) {
      fclose(fp);
      return 1;
    }
    std::string name;
    int ch;
    while ((ch = fgetc(fp)) != EOF && ch != '\0') name.push_back((char)ch);
    names_needed += name.size() + 1;
    uint64_t npts;
    if (fread(&npts, 8, 1, fp) != 1) {
      fclose(fp);
      return 1;
    }
    fseek(fp, (long)(npts * 24), SEEK_CUR);
    if (!count_only && (long long)i < *n_images) {
      memcpy(qvec + i * 4, q, 32);
      memcpy(tvec + i * 3, t, 24);
      camera_id[i] = cam_id;
      long long off = names_needed - (long long)name.size() - 1;
      if (off + (long long)name.size() + 1 <= *name_buf_len)
        memcpy(name_buf + off, name.c_str(), name.size() + 1);
    }
  }
  fclose(fp);
  *n_images = (long long)n;
  *name_buf_len = names_needed;
  return 0;
}

}  // extern "C"
