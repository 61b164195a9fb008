// geotiffio: windowed GeoTIFF reader / tiled GeoTIFF writer on libtiff.
//
// TPU-native replacement for the reference stack's rasterio/GDAL usage
// (windowed reads with boundless fill feeding the inference pipeline;
// LZW-compressed tiled GeoTIFF / COG outputs). Exposed to Python via ctypes
// (flair_for_aigle_tpu/geo/geotiff.py).
//
// Geo metadata: ModelPixelScaleTag(33550) + ModelTiepointTag(33922) carry the
// affine transform; GeoKeyDirectoryTag(34735) carries the EPSG code
// (ProjectedCSTypeGeoKey 3072 / GeographicTypeGeoKey 2048).

#include <tiffio.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr uint32_t TAG_MODEL_PIXEL_SCALE = 33550;
constexpr uint32_t TAG_MODEL_TIEPOINT = 33922;
constexpr uint32_t TAG_GEO_KEY_DIRECTORY = 34735;

// Register the GeoTIFF private tags with libtiff so we can read/write them.
const TIFFFieldInfo kGeoFieldInfo[] = {
    {(ttag_t)TAG_MODEL_PIXEL_SCALE, -1, -1, TIFF_DOUBLE, FIELD_CUSTOM, 1, 1,
     const_cast<char*>("ModelPixelScale")},
    {(ttag_t)TAG_MODEL_TIEPOINT, -1, -1, TIFF_DOUBLE, FIELD_CUSTOM, 1, 1,
     const_cast<char*>("ModelTiepoint")},
    {(ttag_t)TAG_GEO_KEY_DIRECTORY, -1, -1, TIFF_SHORT, FIELD_CUSTOM, 1, 1,
     const_cast<char*>("GeoKeyDirectory")},
};

TIFFExtendProc g_parent_extender = nullptr;

void GeoTagExtender(TIFF* tif) {
  TIFFMergeFieldInfo(tif, kGeoFieldInfo,
                     sizeof(kGeoFieldInfo) / sizeof(kGeoFieldInfo[0]));
  if (g_parent_extender) g_parent_extender(tif);
}

struct Registrar {
  Registrar() {
    g_parent_extender = TIFFSetTagExtender(GeoTagExtender);
    TIFFSetErrorHandler(nullptr);   // keep the library quiet; we return codes
    TIFFSetWarningHandler(nullptr);
  }
} registrar;

// dtype codes shared with the Python side.
enum DType : int32_t {
  DT_UINT8 = 0,
  DT_UINT16 = 1,
  DT_INT16 = 2,
  DT_UINT32 = 3,
  DT_INT32 = 4,
  DT_FLOAT32 = 5,
  DT_FLOAT64 = 6,
};

int DtypeSize(int dt) {
  switch (dt) {
    case DT_UINT8: return 1;
    case DT_UINT16: case DT_INT16: return 2;
    case DT_UINT32: case DT_INT32: case DT_FLOAT32: return 4;
    case DT_FLOAT64: return 8;
  }
  return 0;
}

int ResolveDtype(uint16_t bits, uint16_t fmt) {
  if (fmt == SAMPLEFORMAT_IEEEFP) return bits == 64 ? DT_FLOAT64 : DT_FLOAT32;
  bool signed_int = (fmt == SAMPLEFORMAT_INT);
  if (bits == 8) return DT_UINT8;
  if (bits == 16) return signed_int ? DT_INT16 : DT_UINT16;
  if (bits == 32) return signed_int ? DT_INT32 : DT_UINT32;
  return -1;
}

struct Reader {
  TIFF* tif = nullptr;
  uint32_t width = 0, height = 0;
  uint16_t samples = 1, bits = 8, fmt = SAMPLEFORMAT_UINT, planar = PLANARCONFIG_CONTIG;
  int dtype = DT_UINT8;
  bool tiled = false;
  uint32_t tile_w = 0, tile_h = 0, rows_per_strip = 0;
  double transform[6] = {0, 1, 0, 0, 0, -1};  // GDAL order: x0,dx,0,y0,0,dy
  int32_t epsg = 0;
};

}  // namespace

extern "C" {

void* gt_open(const char* path) {
  TIFF* tif = TIFFOpen(path, "r");
  if (!tif) return nullptr;
  Reader* r = new Reader();
  r->tif = tif;
  TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &r->width);
  TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &r->height);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLESPERPIXEL, &r->samples);
  TIFFGetFieldDefaulted(tif, TIFFTAG_BITSPERSAMPLE, &r->bits);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLEFORMAT, &r->fmt);
  TIFFGetFieldDefaulted(tif, TIFFTAG_PLANARCONFIG, &r->planar);
  r->dtype = ResolveDtype(r->bits, r->fmt);
  if (r->dtype < 0) {
    TIFFClose(tif);
    delete r;
    return nullptr;
  }
  r->tiled = TIFFIsTiled(tif);
  if (r->tiled) {
    TIFFGetField(tif, TIFFTAG_TILEWIDTH, &r->tile_w);
    TIFFGetField(tif, TIFFTAG_TILELENGTH, &r->tile_h);
  } else {
    TIFFGetFieldDefaulted(tif, TIFFTAG_ROWSPERSTRIP, &r->rows_per_strip);
    if (r->rows_per_strip == 0 || r->rows_per_strip > r->height)
      r->rows_per_strip = r->height;
  }
  // geo tags
  uint16_t n = 0;
  double* vals = nullptr;
  if (TIFFGetField(tif, TAG_MODEL_PIXEL_SCALE, &n, &vals) && n >= 2) {
    r->transform[1] = vals[0];
    r->transform[5] = -vals[1];
  }
  if (TIFFGetField(tif, TAG_MODEL_TIEPOINT, &n, &vals) && n >= 6) {
    // tiepoint: raster (i,j,k) -> model (x,y,z); origin at tiepoint
    double i = vals[0], j = vals[1], x = vals[3], y = vals[4];
    r->transform[0] = x - i * r->transform[1];
    r->transform[3] = y - j * r->transform[5];
  }
  uint16_t* keys = nullptr;
  uint16_t nkeys = 0;
  if (TIFFGetField(tif, TAG_GEO_KEY_DIRECTORY, &nkeys, &keys) && nkeys >= 4) {
    int num = keys[3];
    for (int k = 1; k <= num && (k * 4 + 3) < nkeys; ++k) {
      uint16_t key_id = keys[k * 4], loc = keys[k * 4 + 1], val = keys[k * 4 + 3];
      if ((key_id == 3072 || key_id == 2048) && loc == 0 && val > 0 &&
          val != 32767) {
        r->epsg = val;
        if (key_id == 3072) break;  // projected wins
      }
    }
  }
  return r;
}

void gt_close(void* h) {
  Reader* r = static_cast<Reader*>(h);
  if (r) {
    if (r->tif) TIFFClose(r->tif);
    delete r;
  }
}

// info layout (int64 array of 8) + transform (double[6])
int gt_info(void* h, int64_t* info, double* transform) {
  Reader* r = static_cast<Reader*>(h);
  if (!r) return -1;
  info[0] = r->width;
  info[1] = r->height;
  info[2] = r->samples;
  info[3] = r->dtype;
  info[4] = r->epsg;
  info[5] = r->tiled ? 1 : 0;
  info[6] = r->tiled ? r->tile_w : 0;
  info[7] = r->tiled ? r->tile_h : r->rows_per_strip;
  std::memcpy(transform, r->transform, 6 * sizeof(double));
  return 0;
}

// Read a window intersected with the raster into a planar (bands, h, w)
// buffer of the raster's dtype; regions outside the raster get `fill`.
// band_idx: 0-based band indices, band_count entries.
int gt_read_window(void* h, const int32_t* band_idx, int32_t band_count,
                   int64_t col_off, int64_t row_off, int64_t win_w,
                   int64_t win_h, void* out, double fill) {
  Reader* r = static_cast<Reader*>(h);
  if (!r) return -1;
  const int esize = DtypeSize(r->dtype);
  const int64_t out_band_px = win_w * win_h;

  // pre-fill
  for (int b = 0; b < band_count; ++b) {
    char* dst = static_cast<char*>(out) + (int64_t)b * out_band_px * esize;
    switch (r->dtype) {
      case DT_UINT8: std::fill_n((uint8_t*)dst, out_band_px, (uint8_t)fill); break;
      case DT_UINT16: std::fill_n((uint16_t*)dst, out_band_px, (uint16_t)fill); break;
      case DT_INT16: std::fill_n((int16_t*)dst, out_band_px, (int16_t)fill); break;
      case DT_UINT32: std::fill_n((uint32_t*)dst, out_band_px, (uint32_t)fill); break;
      case DT_INT32: std::fill_n((int32_t*)dst, out_band_px, (int32_t)fill); break;
      case DT_FLOAT32: std::fill_n((float*)dst, out_band_px, (float)fill); break;
      case DT_FLOAT64: std::fill_n((double*)dst, out_band_px, fill); break;
    }
  }

  // intersection with the raster
  int64_t x0 = std::max<int64_t>(0, col_off);
  int64_t y0 = std::max<int64_t>(0, row_off);
  int64_t x1 = std::min<int64_t>(r->width, col_off + win_w);
  int64_t y1 = std::min<int64_t>(r->height, row_off + win_h);
  if (x0 >= x1 || y0 >= y1) return 0;  // fully outside: filled

  const int64_t nspp = (r->planar == PLANARCONFIG_CONTIG) ? r->samples : 1;

  auto copy_block = [&](const char* block, int64_t bx, int64_t by,
                        int64_t bw, int64_t bh, int sample_in_block,
                        int out_band) {
    // overlap of block [bx, bx+bw) x [by, by+bh) with [x0,x1)x[y0,y1)
    int64_t cx0 = std::max(bx, x0), cx1 = std::min(bx + bw, x1);
    int64_t cy0 = std::max(by, y0), cy1 = std::min(by + bh, y1);
    if (cx0 >= cx1 || cy0 >= cy1) return;
    char* out_base = static_cast<char*>(out) +
                     (int64_t)out_band * out_band_px * esize;
    for (int64_t y = cy0; y < cy1; ++y) {
      const char* src = block +
          (((y - by) * bw + (cx0 - bx)) * nspp + sample_in_block) * esize;
      char* dst = out_base + ((y - row_off) * win_w + (cx0 - col_off)) * esize;
      if (nspp == 1) {
        std::memcpy(dst, src, (cx1 - cx0) * esize);
      } else {
        for (int64_t x = 0; x < cx1 - cx0; ++x)
          std::memcpy(dst + x * esize, src + x * nspp * esize, esize);
      }
    }
  };

  if (r->tiled) {
    std::vector<char> buf(TIFFTileSize(r->tif));
    int64_t tx0 = (x0 / r->tile_w) * r->tile_w;
    int64_t ty0 = (y0 / r->tile_h) * r->tile_h;
    for (int64_t ty = ty0; ty < y1; ty += r->tile_h) {
      for (int64_t tx = tx0; tx < x1; tx += r->tile_w) {
        if (r->planar == PLANARCONFIG_CONTIG) {
          ttile_t tile = TIFFComputeTile(r->tif, tx, ty, 0, 0);
          if (TIFFReadEncodedTile(r->tif, tile, buf.data(), buf.size()) < 0)
            return -2;
          for (int b = 0; b < band_count; ++b)
            copy_block(buf.data(), tx, ty, r->tile_w, r->tile_h, band_idx[b], b);
        } else {
          for (int b = 0; b < band_count; ++b) {
            ttile_t tile = TIFFComputeTile(r->tif, tx, ty, 0, band_idx[b]);
            if (TIFFReadEncodedTile(r->tif, tile, buf.data(), buf.size()) < 0)
              return -2;
            copy_block(buf.data(), tx, ty, r->tile_w, r->tile_h, 0, b);
          }
        }
      }
    }
  } else {
    std::vector<char> buf(TIFFStripSize(r->tif));
    int64_t s0 = y0 / r->rows_per_strip;
    int64_t s1 = (y1 - 1) / r->rows_per_strip;
    for (int64_t s = s0; s <= s1; ++s) {
      int64_t sy = s * r->rows_per_strip;
      int64_t sh = std::min<int64_t>(r->rows_per_strip, r->height - sy);
      if (r->planar == PLANARCONFIG_CONTIG) {
        tstrip_t strip = TIFFComputeStrip(r->tif, sy, 0);
        if (TIFFReadEncodedStrip(r->tif, strip, buf.data(), buf.size()) < 0)
          return -2;
        for (int b = 0; b < band_count; ++b)
          copy_block(buf.data(), 0, sy, r->width, sh, band_idx[b], b);
      } else {
        for (int b = 0; b < band_count; ++b) {
          tstrip_t strip = TIFFComputeStrip(r->tif, sy, band_idx[b]);
          if (TIFFReadEncodedStrip(r->tif, strip, buf.data(), buf.size()) < 0)
            return -2;
          copy_block(buf.data(), 0, sy, r->width, sh, 0, b);
        }
      }
    }
  }
  return 0;
}

// Write a full raster (planar band-major data) as a tiled GeoTIFF.
// compression: 0 none, 5 LZW, 8 deflate. If overview_count > 0, append
// nearest-downsampled reduced-resolution IFDs (COG-style layout).
int gt_write(const char* path, const void* data, int64_t width, int64_t height,
             int32_t bands, int32_t dtype, int32_t tile_size,
             int32_t compression, const double* transform, int32_t epsg,
             int32_t overview_count) {
  TIFF* tif = TIFFOpen(path, "w");
  if (!tif) return -1;
  const int esize = DtypeSize(dtype);

  auto write_level = [&](const void* level_data, int64_t w, int64_t h,
                         bool reduced) -> int {
    TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, (uint32_t)w);
    TIFFSetField(tif, TIFFTAG_IMAGELENGTH, (uint32_t)h);
    TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, (uint16_t)bands);
    TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, (uint16_t)(esize * 8));
    uint16_t fmt = SAMPLEFORMAT_UINT;
    if (dtype == DT_INT16 || dtype == DT_INT32) fmt = SAMPLEFORMAT_INT;
    if (dtype == DT_FLOAT32 || dtype == DT_FLOAT64) fmt = SAMPLEFORMAT_IEEEFP;
    TIFFSetField(tif, TIFFTAG_SAMPLEFORMAT, fmt);
    TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_SEPARATE);
    TIFFSetField(tif, TIFFTAG_PHOTOMETRIC, PHOTOMETRIC_MINISBLACK);
    if (compression) TIFFSetField(tif, TIFFTAG_COMPRESSION, (uint16_t)compression);
    TIFFSetField(tif, TIFFTAG_TILEWIDTH, (uint32_t)tile_size);
    TIFFSetField(tif, TIFFTAG_TILELENGTH, (uint32_t)tile_size);
    if (reduced)
      TIFFSetField(tif, TIFFTAG_SUBFILETYPE, FILETYPE_REDUCEDIMAGE);
    if (!reduced && transform) {
      double scale[3] = {transform[1], -transform[5], 0.0};
      double tie[6] = {0, 0, 0, transform[0], transform[3], 0};
      TIFFSetField(tif, TAG_MODEL_PIXEL_SCALE, (uint16_t)3, scale);
      TIFFSetField(tif, TAG_MODEL_TIEPOINT, (uint16_t)6, tie);
      if (epsg > 0) {
        bool geographic = (epsg >= 4000 && epsg < 5000);
        uint16_t keys[16] = {
            1, 1, 0, 3,
            1024, 0, 1, (uint16_t)(geographic ? 2 : 1),   // GTModelType
            1025, 0, 1, 1,                                 // RasterPixelIsArea
            (uint16_t)(geographic ? 2048 : 3072), 0, 1, (uint16_t)epsg,
        };
        TIFFSetField(tif, TAG_GEO_KEY_DIRECTORY, (uint16_t)16, keys);
      }
    }
    std::vector<char> tile(esize * (int64_t)tile_size * tile_size);
    for (int b = 0; b < bands; ++b) {
      const char* band = static_cast<const char*>(level_data) +
                         (int64_t)b * w * h * esize;
      for (int64_t ty = 0; ty < h; ty += tile_size) {
        for (int64_t tx = 0; tx < w; tx += tile_size) {
          std::fill(tile.begin(), tile.end(), 0);
          int64_t cw = std::min<int64_t>(tile_size, w - tx);
          int64_t ch = std::min<int64_t>(tile_size, h - ty);
          for (int64_t y = 0; y < ch; ++y)
            std::memcpy(tile.data() + (y * tile_size) * esize,
                        band + ((ty + y) * w + tx) * esize, cw * esize);
          ttile_t t = TIFFComputeTile(tif, tx, ty, 0, b);
          if (TIFFWriteEncodedTile(tif, t, tile.data(), tile.size()) < 0) {
            return -2;
          }
        }
      }
    }
    return TIFFWriteDirectory(tif) == 1 ? 0 : -3;
  };

  int rc = write_level(data, width, height, false);
  if (rc != 0) {
    TIFFClose(tif);
    return rc;
  }

  // overviews: nearest 2x downsampling chain
  std::vector<char> prev(static_cast<const char*>(data),
                         static_cast<const char*>(data) +
                             (int64_t)bands * width * height * esize);
  int64_t pw = width, ph = height;
  for (int lvl = 0; lvl < overview_count; ++lvl) {
    int64_t nw = std::max<int64_t>(1, pw / 2), nh = std::max<int64_t>(1, ph / 2);
    std::vector<char> next((int64_t)bands * nw * nh * esize);
    for (int b = 0; b < bands; ++b) {
      const char* src = prev.data() + (int64_t)b * pw * ph * esize;
      char* dst = next.data() + (int64_t)b * nw * nh * esize;
      for (int64_t y = 0; y < nh; ++y)
        for (int64_t x = 0; x < nw; ++x)
          std::memcpy(dst + (y * nw + x) * esize,
                      src + ((y * 2) * pw + x * 2) * esize, esize);
    }
    rc = write_level(next.data(), nw, nh, true);
    if (rc != 0) {
      TIFFClose(tif);
      return rc;
    }
    prev.swap(next);
    pw = nw;
    ph = nh;
    if (pw <= tile_size && ph <= tile_size) break;
  }

  TIFFClose(tif);
  return 0;
}

}  // extern "C"
