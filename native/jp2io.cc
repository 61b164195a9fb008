// jp2io: windowed JPEG2000 decode via libopenjp2 (dlopen'd at runtime).
//
// Parity: the reference's production inputs are .jp2 aerial rasters read
// through rasterio/GDAL (scripts/run_fast_aigle_segmentation.py:88). No
// OpenJPEG headers ship in this image, so the small public ABI used here is
// declared by hand (stable since OpenJPEG 2.x); decoder parameters are an
// opaque oversized buffer initialized by opj_set_default_decoder_parameters.
//
// Geo metadata (GeoJP2 uuid box) is parsed on the Python side
// (flair_for_aigle_tpu/geo/jp2.py).

#include <cstdint>
#include <cstring>
#include <dlfcn.h>
#include <vector>

namespace {

// ---- OpenJPEG 2.x public ABI (subset) ------------------------------------
typedef int32_t OPJ_BOOL;
enum { OPJ_CODEC_J2K = 0, OPJ_CODEC_JP2 = 2 };

struct opj_image_comp_t {
  uint32_t dx, dy, w, h, x0, y0, prec, bpp, sgnd, resno_decoded, factor;
  int32_t* data;
  uint16_t alpha;
};

struct opj_image_t {
  uint32_t x0, y0, x1, y1, numcomps;
  int32_t color_space;
  opj_image_comp_t* comps;
  uint8_t* icc_profile_buf;
  uint32_t icc_profile_len;
};

typedef void* (*fn_stream_create)(const char*, OPJ_BOOL);
typedef void* (*fn_create_decompress)(int);
typedef void (*fn_set_default_params)(void*);
typedef OPJ_BOOL (*fn_setup_decoder)(void*, void*);
typedef OPJ_BOOL (*fn_read_header)(void*, void*, opj_image_t**);
typedef OPJ_BOOL (*fn_set_decode_area)(void*, opj_image_t*, int32_t, int32_t,
                                       int32_t, int32_t);
typedef OPJ_BOOL (*fn_decode)(void*, void*, opj_image_t*);
typedef OPJ_BOOL (*fn_end_decompress)(void*, void*);
typedef void (*fn_stream_destroy)(void*);
typedef void (*fn_destroy_codec)(void*);
typedef void (*fn_image_destroy)(opj_image_t*);

struct OpjApi {
  void* lib = nullptr;
  fn_stream_create stream_create;
  fn_create_decompress create_decompress;
  fn_set_default_params set_default_params;
  fn_setup_decoder setup_decoder;
  fn_read_header read_header;
  fn_set_decode_area set_decode_area;
  fn_decode decode;
  fn_end_decompress end_decompress;
  fn_stream_destroy stream_destroy;
  fn_destroy_codec destroy_codec;
  fn_image_destroy image_destroy;

  bool ok() const { return lib != nullptr; }
};

OpjApi* api() {
  static OpjApi a;
  static bool tried = false;
  if (!tried) {
    tried = true;
    a.lib = dlopen("libopenjp2.so.7", RTLD_NOW);
    if (a.lib) {
#define LOAD(field, name) a.field = (decltype(a.field))dlsym(a.lib, name)
      LOAD(stream_create, "opj_stream_create_default_file_stream");
      LOAD(create_decompress, "opj_create_decompress");
      LOAD(set_default_params, "opj_set_default_decoder_parameters");
      LOAD(setup_decoder, "opj_setup_decoder");
      LOAD(read_header, "opj_read_header");
      LOAD(set_decode_area, "opj_set_decode_area");
      LOAD(decode, "opj_decode");
      LOAD(end_decompress, "opj_end_decompress");
      LOAD(stream_destroy, "opj_stream_destroy");
      LOAD(destroy_codec, "opj_destroy_codec");
      LOAD(image_destroy, "opj_image_destroy");
#undef LOAD
    }
  }
  return &a;
}

int codec_for(const char* path) {
  const char* dot = strrchr(path, '.');
  if (dot && (strcmp(dot, ".j2k") == 0 || strcmp(dot, ".j2c") == 0))
    return OPJ_CODEC_J2K;
  return OPJ_CODEC_JP2;
}

struct Session {
  void* stream = nullptr;
  void* codec = nullptr;
  opj_image_t* image = nullptr;
  OpjApi* a = nullptr;

  ~Session() {
    if (image) a->image_destroy(image);
    if (codec) a->destroy_codec(codec);
    if (stream) a->stream_destroy(stream);
  }
};

int open_and_header(const char* path, Session& s) {
  s.a = api();
  if (!s.a->ok()) return -10;  // libopenjp2 unavailable
  s.stream = s.a->stream_create(path, 1 /*read*/);
  if (!s.stream) return -1;
  s.codec = s.a->create_decompress(codec_for(path));
  if (!s.codec) return -2;
  std::vector<uint8_t> params(16384, 0);  // oversized opj_dparameters_t
  s.a->set_default_params(params.data());
  if (!s.a->setup_decoder(s.codec, params.data())) return -3;
  if (!s.a->read_header(s.stream, s.codec, &s.image)) return -4;
  return 0;
}

}  // namespace

extern "C" {

// out: [width, height, ncomps, prec, sgnd]
int jp2_info(const char* path, int64_t* out) {
  Session s;
  int rc = open_and_header(path, s);
  if (rc != 0) return rc;
  out[0] = s.image->x1 - s.image->x0;
  out[1] = s.image->y1 - s.image->y0;
  out[2] = s.image->numcomps;
  out[3] = s.image->comps[0].prec;
  out[4] = s.image->comps[0].sgnd;
  return 0;
}

// Decode a window (image coords, clamped by caller) into planar int32
// (ncomps, h, w). Assumes dx=dy=1 components (VHR aerial JP2s).
int jp2_read_window(const char* path, int64_t x0, int64_t y0, int64_t w,
                    int64_t h, int32_t* out) {
  Session s;
  int rc = open_and_header(path, s);
  if (rc != 0) return rc;
  int64_t ix0 = s.image->x0, iy0 = s.image->y0;
  if (!s.a->set_decode_area(s.codec, s.image, (int32_t)(ix0 + x0),
                            (int32_t)(iy0 + y0), (int32_t)(ix0 + x0 + w),
                            (int32_t)(iy0 + y0 + h)))
    return -5;
  if (!s.a->decode(s.codec, s.stream, s.image)) return -6;
  s.a->end_decompress(s.codec, s.stream);
  for (uint32_t c = 0; c < s.image->numcomps; ++c) {
    const opj_image_comp_t& comp = s.image->comps[c];
    if ((int64_t)comp.w < w || (int64_t)comp.h < h) return -7;
    for (int64_t y = 0; y < h; ++y) {
      std::memcpy(out + (c * h + y) * w, comp.data + y * comp.w,
                  w * sizeof(int32_t));
    }
  }
  return 0;
}

int jp2_available() { return api()->ok() ? 1 : 0; }

}  // extern "C"
