// nrcio: native IO/runtime kernels for the TPU NRC framework.
//
// The reference implements its loaders in C++ (read_file.cpp, stb_image,
// openexr_helper.cpp, the vendored MNIST idx reader); this library is their
// from-scratch native equivalent for the host side of the TPU pipeline:
//   * Radiance .hdr (RGBE) decode incl. new-style RLE scanlines
//   * brightness CDF build + inversion for env-map importance sampling
//     (the Hdr4fToCdf/InvertCdf math, read_file.cpp:123-206 semantics)
//   * raw fp32 x-major density volume parse (read_file.cpp:50-78 semantics)
//   * procedural fbm cloud synthesis (fallback for the missing
//     cloud_sixteenth asset)
//   * uncompressed scanline EXR (half) encode -- the headless frame output
//     path replacing swapchain presentation
//   * MNIST idx1/idx3 parse
//
// Exposed with a plain C ABI for ctypes; no external dependencies.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Radiance HDR (RGBE) decode
// ---------------------------------------------------------------------------

// Decode the pixel payload of a Radiance file (after the header) into
// float32 RGB. Returns 0 on success.
int nrc_hdr_decode(const uint8_t* data, int64_t size, int width, int height,
                   float* out_rgb) {
  int64_t bp = 0;
  std::vector<uint8_t> row(static_cast<size_t>(width) * 4);
  for (int y = 0; y < height; ++y) {
    if (width >= 8 && width < 0x8000 && bp + 4 <= size && data[bp] == 2 &&
        data[bp + 1] == 2 &&
        ((data[bp + 2] << 8) | data[bp + 3]) == width) {
      bp += 4;  // new-style RLE: 4 channel planes
      for (int c = 0; c < 4; ++c) {
        int x = 0;
        while (x < width) {
          if (bp >= size) return 1;
          int count = data[bp++];
          if (count > 128) {  // run
            count -= 128;
            if (bp >= size || x + count > width) return 1;
            uint8_t v = data[bp++];
            for (int i = 0; i < count; ++i) row[(x + i) * 4 + c] = v;
            x += count;
          } else {  // literal
            // count==0 would consume bytes without advancing x; a valid
            // encoder never emits it -- treat as corrupt input
            if (count == 0 || bp + count > size || x + count > width)
              return 1;
            for (int i = 0; i < count; ++i) row[(x + i) * 4 + c] = data[bp++];
            x += count;
          }
        }
      }
    } else {  // flat scanline
      if (bp + static_cast<int64_t>(width) * 4 > size) return 1;
      std::memcpy(row.data(), data + bp, static_cast<size_t>(width) * 4);
      bp += static_cast<int64_t>(width) * 4;
    }
    float* dst = out_rgb + static_cast<int64_t>(y) * width * 3;
    for (int x = 0; x < width; ++x) {
      int e = row[x * 4 + 3];
      float scale = e ? std::ldexp(1.0f, e - 136) : 0.0f;
      dst[x * 3 + 0] = row[x * 4 + 0] * scale;
      dst[x * 3 + 1] = row[x * 4 + 1] * scale;
      dst[x * 3 + 2] = row[x * 4 + 2] * scale;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Env-map CDF build + inversion
// ---------------------------------------------------------------------------

// From (H, W, 3) radiance: fill inv_cdf_x (H, W) and inv_cdf_y (H).
// invCdf[i] = (first p with cdf[p] >= i/N) / N.
int nrc_build_inv_cdfs(const float* rgb, int width, int height,
                       float* inv_cdf_x, float* inv_cdf_y) {
  std::vector<double> row_sum(height);
  std::vector<double> cdf(width);
  for (int y = 0; y < height; ++y) {
    const float* src = rgb + static_cast<int64_t>(y) * width * 3;
    double acc = 0.0;
    for (int x = 0; x < width; ++x) {
      acc += src[x * 3] + src[x * 3 + 1] + src[x * 3 + 2];
      cdf[x] = acc;
    }
    row_sum[y] = acc;
    double norm = acc > 0 ? 1.0 / acc : 0.0;
    // invert: single sweep (cdf monotone, thresholds monotone)
    int p = 0;
    float* dst = inv_cdf_x + static_cast<int64_t>(y) * width;
    for (int i = 0; i < width; ++i) {
      double threshold = static_cast<double>(i) / width;
      while (p < width - 1 && cdf[p] * norm < threshold) ++p;
      dst[i] = static_cast<float>(p) / width;
    }
  }
  std::vector<double> cdf_y(height);
  double acc = 0.0;
  for (int y = 0; y < height; ++y) {
    acc += row_sum[y];
    cdf_y[y] = acc;
  }
  double norm = acc > 0 ? 1.0 / acc : 0.0;
  int p = 0;
  for (int i = 0; i < height; ++i) {
    double threshold = static_cast<double>(i) / height;
    while (p < height - 1 && cdf_y[p] * norm < threshold) ++p;
    inv_cdf_y[i] = static_cast<float>(p) / height;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Density volume IO
// ---------------------------------------------------------------------------

int nrc_read_density(const char* path, int nx, int ny, int nz, float* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  size_t n = static_cast<size_t>(nx) * ny * nz;
  size_t got = std::fread(out, sizeof(float), n, f);
  std::fclose(f);
  return got == n ? 0 : 2;
}

// ---------------------------------------------------------------------------
// Procedural fbm cloud (deterministic; stands in for cloud_sixteenth)
// ---------------------------------------------------------------------------

static inline uint32_t hash3(uint32_t x, uint32_t y, uint32_t z,
                             uint32_t seed) {
  uint32_t h = seed;
  h ^= x * 0x8da6b343u;
  h ^= y * 0xd8163841u;
  h ^= z * 0xcb1ab31fu;
  h ^= h >> 13;
  h *= 0x85ebca6bu;
  h ^= h >> 16;
  return h;
}

static inline float lattice(uint32_t x, uint32_t y, uint32_t z,
                            uint32_t seed) {
  return (hash3(x, y, z, seed) & 0xFFFFFF) * (1.0f / 0xFFFFFF);
}

int nrc_synthesize_cloud(int nx, int ny, int nz, uint32_t seed, float* out) {
  const int octaves[4] = {4, 8, 16, 32};
  const float amps[4] = {1.0f, 0.5f, 0.25f, 0.125f};
  float total_amp = 1.875f;
  for (int ix = 0; ix < nx; ++ix) {
    for (int iy = 0; iy < ny; ++iy) {
      for (int iz = 0; iz < nz; ++iz) {
        float fbm = 0.0f;
        for (int o = 0; o < 4; ++o) {
          int cells = octaves[o];
          float gx = static_cast<float>(ix) * cells / nx;
          float gy = static_cast<float>(iy) * cells / ny;
          float gz = static_cast<float>(iz) * cells / nz;
          uint32_t x0 = static_cast<uint32_t>(gx);
          uint32_t y0 = static_cast<uint32_t>(gy);
          uint32_t z0 = static_cast<uint32_t>(gz);
          float fx = gx - x0, fy = gy - y0, fz = gz - z0;
          uint32_t os = seed + 97u * o;
          float v = 0.0f;
          for (int cx = 0; cx < 2; ++cx)
            for (int cy = 0; cy < 2; ++cy)
              for (int cz = 0; cz < 2; ++cz) {
                float w = (cx ? fx : 1 - fx) * (cy ? fy : 1 - fy) *
                          (cz ? fz : 1 - fz);
                v += w * lattice(x0 + cx, y0 + cy, z0 + cz, os);
              }
          fbm += amps[o] * v;
        }
        fbm /= total_amp;
        float ex = 2.0f * ix / (nx - 1) - 1.0f;
        float ey = 2.0f * iy / (ny - 1) - 1.0f;
        float ez = 2.0f * iz / (nz - 1) - 1.0f;
        float r2 = (ex / 0.8f) * (ex / 0.8f) + (ey / 0.7f) * (ey / 0.7f) +
                   (ez / 0.8f) * (ez / 0.8f);
        float falloff = 1.0f - r2;
        if (falloff < 0) falloff = 0;
        float d = (fbm - 0.4f) * 2.5f;
        if (d < 0) d = 0;
        if (d > 1) d = 1;
        out[(static_cast<int64_t>(ix) * ny + iy) * nz + iz] = d * falloff;
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Minimal half-float conversion + uncompressed scanline EXR encode
// ---------------------------------------------------------------------------

static inline uint16_t f32_to_f16(float fv) {
  uint32_t x;
  std::memcpy(&x, &fv, 4);
  uint32_t sign = (x >> 16) & 0x8000u;
  int32_t exp = static_cast<int32_t>((x >> 23) & 0xFF) - 127 + 15;
  uint32_t man = x & 0x7FFFFFu;
  if (exp <= 0) {
    if (exp < -10) return static_cast<uint16_t>(sign);
    man |= 0x800000u;
    uint32_t shift = static_cast<uint32_t>(14 - exp);
    return static_cast<uint16_t>(sign | (man >> shift));
  }
  if (exp >= 31) return static_cast<uint16_t>(sign | 0x7C00u);  // inf
  return static_cast<uint16_t>(sign | (static_cast<uint32_t>(exp) << 10) |
                               (man >> 13));
}

// Write (H, W, 3) float RGB as an uncompressed HALF scanline EXR.
int nrc_write_exr(const char* path, const float* rgb, int width, int height) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;

  auto wr = [&](const void* p, size_t n) { std::fwrite(p, 1, n, f); };
  auto wr_i32 = [&](int32_t v) { wr(&v, 4); };
  auto wr_attr = [&](const char* name, const char* type,
                     const void* val, int32_t n) {
    wr(name, std::strlen(name) + 1);
    wr(type, std::strlen(type) + 1);
    wr_i32(n);
    wr(val, static_cast<size_t>(n));
  };

  int32_t magic = 20000630, version = 2;
  wr(&magic, 4);
  wr(&version, 4);

  // chlist: B, G, R as HALF
  std::vector<uint8_t> ch;
  const char* names[3] = {"B", "G", "R"};
  for (int i = 0; i < 3; ++i) {
    const char* nm = names[i];
    ch.insert(ch.end(), nm, nm + std::strlen(nm) + 1);
    int32_t vals[4] = {1 /*HALF*/, 0 /*pLinear+reserved*/, 1, 1};
    const uint8_t* b = reinterpret_cast<const uint8_t*>(vals);
    ch.insert(ch.end(), b, b + 16);
  }
  ch.push_back(0);
  wr_attr("channels", "chlist", ch.data(), static_cast<int32_t>(ch.size()));
  uint8_t comp = 0;
  wr_attr("compression", "compression", &comp, 1);
  int32_t box[4] = {0, 0, width - 1, height - 1};
  wr_attr("dataWindow", "box2i", box, 16);
  wr_attr("displayWindow", "box2i", box, 16);
  uint8_t lo = 0;
  wr_attr("lineOrder", "lineOrder", &lo, 1);
  float par = 1.0f;
  wr_attr("pixelAspectRatio", "float", &par, 4);
  float swc[2] = {0.0f, 0.0f};
  wr_attr("screenWindowCenter", "v2f", swc, 8);
  float sww = 1.0f;
  wr_attr("screenWindowWidth", "float", &sww, 4);
  uint8_t zero = 0;
  wr(&zero, 1);

  int64_t header_end = std::ftell(f);
  int64_t scan_bytes = 8 + static_cast<int64_t>(width) * 2 * 3;
  int64_t first = header_end + static_cast<int64_t>(height) * 8;
  for (int y = 0; y < height; ++y) {
    uint64_t off = static_cast<uint64_t>(first + y * scan_bytes);
    wr(&off, 8);
  }

  std::vector<uint16_t> line(static_cast<size_t>(width) * 3);
  for (int y = 0; y < height; ++y) {
    wr_i32(y);
    wr_i32(static_cast<int32_t>(width * 2 * 3));
    const float* src = rgb + static_cast<int64_t>(y) * width * 3;
    // B plane, G plane, R plane
    for (int x = 0; x < width; ++x) line[x] = f32_to_f16(src[x * 3 + 2]);
    for (int x = 0; x < width; ++x)
      line[width + x] = f32_to_f16(src[x * 3 + 1]);
    for (int x = 0; x < width; ++x)
      line[2 * width + x] = f32_to_f16(src[x * 3 + 0]);
    wr(line.data(), line.size() * 2);
  }
  std::fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// MNIST idx parse
// ---------------------------------------------------------------------------

static uint32_t be32(const uint8_t* p) {
  return (static_cast<uint32_t>(p[0]) << 24) | (p[1] << 16) | (p[2] << 8) |
         p[3];
}

// Returns label count, or -1 on error. out must hold `limit` bytes.
int64_t nrc_read_idx1(const char* path, uint8_t* out, int64_t limit) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  uint8_t hdr[8];
  if (std::fread(hdr, 1, 8, f) != 8 || be32(hdr) != 2049) {
    std::fclose(f);
    return -1;
  }
  int64_t count = be32(hdr + 4);
  if (count > limit) count = limit;
  int64_t got = static_cast<int64_t>(std::fread(out, 1, count, f));
  std::fclose(f);
  return got;
}

}  // extern "C"
