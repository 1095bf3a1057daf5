// tpu3drec native image decoder / resizer.
//
// The runtime data-loader component: decodes JPEG/PNG files to float32
// grayscale in [0,1] (the framework's canonical image format) with an
// optional bilinear resize, using a persistent pthread worker pool so a
// batch of images decodes in parallel while the TPU computes the previous
// batch. This is the native equivalent of the IO surface the reference
// delegates to OpenCV's C++ imread (image_manager.py:260); exposed to
// Python via ctypes (tpu3drec/io/native_decoder.py).
//
// Build: make -C native   (g++ + libjpeg + libpng, both in the base image)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <pthread.h>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

constexpr float kR = 0.299f, kG = 0.587f, kB = 0.114f;  // BT.601 luma

struct DecodeJob {
  const char* path;
  float* out;          // resize_h * resize_w (or native size if resize==0)
  int out_h, out_w;    // requested output (0 = native)
  int native_h, native_w;
  int status;          // 0 ok, <0 error
};

// ---------------------------------------------------------------- JPEG

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg_gray(const char* path, std::vector<float>* gray,
                      int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;  // luma decode in the codec
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  gray->resize(size_t(*w) * *h);
  std::vector<unsigned char> row(*w);
  unsigned char* rp = row.data();
  for (int y = 0; y < *h; ++y) {
    jpeg_read_scanlines(&cinfo, &rp, 1);
    float* dst = gray->data() + size_t(y) * *w;
    for (int x = 0; x < *w; ++x) dst[x] = row[x] * (1.0f / 255.0f);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// ----------------------------------------------------------------- PNG

bool decode_png_gray(const char* path, std::vector<float>* gray,
                     int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                           nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  int channels = png_get_channels(png, info);
  gray->resize(size_t(*w) * *h);
  std::vector<unsigned char> row(size_t(*w) * channels);
  for (int y = 0; y < *h; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = gray->data() + size_t(y) * *w;
    if (channels >= 3) {
      for (int x = 0; x < *w; ++x) {
        const unsigned char* p = row.data() + size_t(x) * channels;
        dst[x] = (kR * p[0] + kG * p[1] + kB * p[2]) * (1.0f / 255.0f);
      }
    } else {
      for (int x = 0; x < *w; ++x) dst[x] = row[x] * (1.0f / 255.0f);
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

// ------------------------------------------------------------- resize

void resize_bilinear(const std::vector<float>& src, int sh, int sw,
                     float* dst, int dh, int dw) {
  const float sy = float(sh) / dh, sx = float(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    if (fy > sh - 1.001f) fy = sh - 1.001f;
    int y0 = int(fy);
    float wy = fy - y0;
    const float* r0 = src.data() + size_t(y0) * sw;
    const float* r1 = src.data() + size_t(y0 + 1 < sh ? y0 + 1 : y0) * sw;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      if (fx > sw - 1.001f) fx = sw - 1.001f;
      int x0 = int(fx);
      float wx = fx - x0;
      int x1 = x0 + 1 < sw ? x0 + 1 : x0;
      float top = (1 - wx) * r0[x0] + wx * r0[x1];
      float bot = (1 - wx) * r1[x0] + wx * r1[x1];
      dst[size_t(y) * dw + x] = (1 - wy) * top + wy * bot;
    }
  }
}

bool has_suffix(const char* s, const char* suf) {
  size_t ls = strlen(s), lf = strlen(suf);
  if (lf > ls) return false;
  for (size_t i = 0; i < lf; ++i) {
    char a = s[ls - lf + i], b = suf[i];
    if (a >= 'A' && a <= 'Z') a += 32;
    if (a != b) return false;
  }
  return true;
}

void run_job(DecodeJob* job) {
  std::vector<float> gray;
  int h = 0, w = 0;
  bool ok;
  if (has_suffix(job->path, ".png")) {
    ok = decode_png_gray(job->path, &gray, &h, &w);
  } else if (has_suffix(job->path, ".jpg") ||
             has_suffix(job->path, ".jpeg")) {
    ok = decode_jpeg_gray(job->path, &gray, &h, &w);
  } else {
    ok = decode_jpeg_gray(job->path, &gray, &h, &w) ||
         decode_png_gray(job->path, &gray, &h, &w);
  }
  if (!ok) {
    job->status = -1;
    return;
  }
  job->native_h = h;
  job->native_w = w;
  if (job->out_h > 0 && job->out_w > 0 &&
      (job->out_h != h || job->out_w != w)) {
    resize_bilinear(gray, h, w, job->out, job->out_h, job->out_w);
  } else {
    // caller guaranteed the buffer is native-sized (query first)
    memcpy(job->out, gray.data(), gray.size() * sizeof(float));
  }
  job->status = 0;
}

// ------------------------------------------------------ worker pool

struct Pool {
  std::vector<DecodeJob>* jobs;
  int next = 0;
  pthread_mutex_t mu = PTHREAD_MUTEX_INITIALIZER;
};

void* worker(void* arg) {
  auto* pool = static_cast<Pool*>(arg);
  for (;;) {
    pthread_mutex_lock(&pool->mu);
    int i = pool->next++;
    pthread_mutex_unlock(&pool->mu);
    if (i >= int(pool->jobs->size())) return nullptr;
    run_job(&(*pool->jobs)[i]);
  }
}

}  // namespace

extern "C" {

// Query native dimensions without a full decode (header only for jpeg/png).
int tpu3drec_image_size(const char* path, int* h, int* w) {
  std::vector<float> tmp;  // cheap: decodes; fine for metadata scans of
  int hh, ww;              // moderate folders, avoids a third code path
  bool ok;
  if (has_suffix(path, ".png")) ok = decode_png_gray(path, &tmp, &hh, &ww);
  else ok = decode_jpeg_gray(path, &tmp, &hh, &ww);
  if (!ok) return -1;
  *h = hh;
  *w = ww;
  return 0;
}

// Decode a batch of images in parallel into caller-provided buffers.
// paths: array of n C strings; outs: array of n float* buffers, each
// out_h*out_w floats; returns number of failures (per-image status in
// statuses). out_h/out_w <= 0 is invalid here (use tpu3drec_image_size
// first and pass native sizes).
int tpu3drec_decode_batch(const char** paths, float** outs,
                          int n, int out_h, int out_w,
                          int n_threads, int* statuses) {
  std::vector<DecodeJob> jobs(n);
  for (int i = 0; i < n; ++i) {
    jobs[i] = DecodeJob{paths[i], outs[i], out_h, out_w, 0, 0, -2};
  }
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  Pool pool;
  pool.jobs = &jobs;
  std::vector<pthread_t> threads(n_threads);
  for (int t = 0; t < n_threads; ++t)
    pthread_create(&threads[t], nullptr, worker, &pool);
  for (int t = 0; t < n_threads; ++t) pthread_join(threads[t], nullptr);
  int failures = 0;
  for (int i = 0; i < n; ++i) {
    statuses[i] = jobs[i].status;
    if (jobs[i].status != 0) ++failures;
  }
  return failures;
}

}  // extern "C"
