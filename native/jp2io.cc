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

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <dlfcn.h>
#include <thread>
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

struct opj_image_cmptparm_t {
  uint32_t dx, dy, w, h, x0, y0, prec, bpp, sgnd;
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
typedef OPJ_BOOL (*fn_codec_set_threads)(void*, int);
// encoder (fixture generation + jp2 export)
typedef void* (*fn_create_compress)(int);
typedef void (*fn_set_default_enc_params)(void*);
typedef OPJ_BOOL (*fn_setup_encoder)(void*, void*, opj_image_t*);
typedef OPJ_BOOL (*fn_start_compress)(void*, opj_image_t*, void*);
typedef OPJ_BOOL (*fn_encode)(void*, void*);
typedef OPJ_BOOL (*fn_end_compress)(void*, void*);
typedef opj_image_t* (*fn_image_create)(uint32_t, opj_image_cmptparm_t*, int);

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
  fn_codec_set_threads codec_set_threads;
  fn_create_compress create_compress;
  fn_set_default_enc_params set_default_enc_params;
  fn_setup_encoder setup_encoder;
  fn_start_compress start_compress;
  fn_encode encode;
  fn_end_compress end_compress;
  fn_image_create image_create;

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
      LOAD(codec_set_threads, "opj_codec_set_threads");
      LOAD(create_compress, "opj_create_compress");
      LOAD(set_default_enc_params, "opj_set_default_encoder_parameters");
      LOAD(setup_encoder, "opj_setup_encoder");
      LOAD(start_compress, "opj_start_compress");
      LOAD(encode, "opj_encode");
      LOAD(end_compress, "opj_end_compress");
      LOAD(image_create, "opj_image_create");
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

int decode_threads() {
  const char* env = getenv("FLAIR_JP2_THREADS");
  if (env && env[0]) {
    int n = atoi(env);
    return n > 0 ? n : 1;
  }
  unsigned hc = std::thread::hardware_concurrency();
  return hc > 1 ? (int)hc : 1;
}

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
  // per-codec worker threads parallelize tile/codeblock decode
  // (GDAL parity: its JP2OpenJPEG driver defaults to ALL_CPUS)
  if (s.a->codec_set_threads) {
    int n = decode_threads();
    if (n > 1) s.a->codec_set_threads(s.codec, n);
  }
  if (!s.a->read_header(s.stream, s.codec, &s.image)) return -4;
  return 0;
}

inline int64_t ceil_div(int64_t a, int64_t b) { return (a + b - 1) / b; }

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
// (ncomps, h, w). Subsampled components (dx/dy > 1, e.g. chroma in
// production IGN ortho JP2s) are upsampled to the reference grid by pixel
// replication, matching GDAL's JP2OpenJPEG full-resolution band exposure.
int jp2_read_window(const char* path, int64_t x0, int64_t y0, int64_t w,
                    int64_t h, int32_t* out) {
  Session s;
  int rc = open_and_header(path, s);
  if (rc != 0) return rc;
  const int64_t ix0 = s.image->x0, iy0 = s.image->y0;
  const int64_t ax0 = ix0 + x0, ay0 = iy0 + y0;
  const int64_t ax1 = ax0 + w, ay1 = ay0 + h;
  // Expand the decode area so every component sample covering the window
  // is decoded: sample i of a dx-subsampled component covers reference
  // columns [i*dx, (i+1)*dx) and OpenJPEG decodes samples
  // [ceil(area_x0/dx), ceil(area_x1/dx)).
  int64_t Ax0 = ax0, Ay0 = ay0, Ax1 = ax1, Ay1 = ay1;
  for (uint32_t c = 0; c < s.image->numcomps; ++c) {
    const int64_t dx = s.image->comps[c].dx ? s.image->comps[c].dx : 1;
    const int64_t dy = s.image->comps[c].dy ? s.image->comps[c].dy : 1;
    Ax0 = std::min(Ax0, dx * (ax0 / dx));
    Ay0 = std::min(Ay0, dy * (ay0 / dy));
    Ax1 = std::max(Ax1, dx * ((ax1 - 1) / dx) + 1);
    Ay1 = std::max(Ay1, dy * ((ay1 - 1) / dy) + 1);
  }
  Ax0 = std::max(Ax0, ix0);
  Ay0 = std::max(Ay0, iy0);
  Ax1 = std::min(Ax1, (int64_t)s.image->x1);
  Ay1 = std::min(Ay1, (int64_t)s.image->y1);
  if (!s.a->set_decode_area(s.codec, s.image, (int32_t)Ax0, (int32_t)Ay0,
                            (int32_t)Ax1, (int32_t)Ay1))
    return -5;
  if (!s.a->decode(s.codec, s.stream, s.image)) return -6;
  s.a->end_decompress(s.codec, s.stream);
  for (uint32_t c = 0; c < s.image->numcomps; ++c) {
    const opj_image_comp_t& comp = s.image->comps[c];
    const int64_t dx = comp.dx ? comp.dx : 1;
    const int64_t dy = comp.dy ? comp.dy : 1;
    const int64_t cx0 = ceil_div(Ax0, dx);
    const int64_t cy0 = ceil_div(Ay0, dy);
    if (dx == 1 && dy == 1) {
      const int64_t offx = ax0 - cx0, offy = ay0 - cy0;
      if ((int64_t)comp.w < offx + w || (int64_t)comp.h < offy + h) return -7;
      for (int64_t y = 0; y < h; ++y) {
        std::memcpy(out + (c * h + y) * w,
                    comp.data + (offy + y) * comp.w + offx,
                    w * sizeof(int32_t));
      }
      continue;
    }
    std::vector<int64_t> sx(w);
    for (int64_t x = 0; x < w; ++x) {
      int64_t s_ix = (ax0 + x) / dx - cx0;
      if (s_ix < 0) s_ix = 0;
      if (s_ix >= (int64_t)comp.w) s_ix = comp.w - 1;
      sx[x] = s_ix;
    }
    for (int64_t y = 0; y < h; ++y) {
      int64_t s_iy = (ay0 + y) / dy - cy0;
      if (s_iy < 0) s_iy = 0;
      if (s_iy >= (int64_t)comp.h) s_iy = comp.h - 1;
      const int32_t* src = comp.data + s_iy * comp.w;
      int32_t* dst = out + (c * h + y) * w;
      for (int64_t x = 0; x < w; ++x) dst[x] = src[sx[x]];
    }
  }
  return 0;
}

// Encode planar int32 component data as a lossless JP2. Each component c
// has its own sampling factors (dx[c], dy[c]) and is passed at its
// subsampled size ceil(w/dx) x ceil(h/dy), concatenated in `data`.
// Primary use: generating genuinely subsampled test fixtures (no tool in
// this image can write one) + JP2 export parity.
int jp2_write(const char* path, const int32_t* data, int64_t w, int64_t h,
              int32_t ncomps, const int32_t* dx, const int32_t* dy,
              int32_t prec) {
  OpjApi* a = api();
  if (!a->ok()) return -10;
  if (!a->create_compress || !a->image_create || !a->setup_encoder)
    return -11;

  std::vector<opj_image_cmptparm_t> parms(ncomps);
  for (int32_t c = 0; c < ncomps; ++c) {
    parms[c] = {};
    parms[c].dx = (uint32_t)dx[c];
    parms[c].dy = (uint32_t)dy[c];
    parms[c].w = (uint32_t)ceil_div(w, dx[c]);
    parms[c].h = (uint32_t)ceil_div(h, dy[c]);
    parms[c].prec = (uint32_t)prec;
    parms[c].bpp = (uint32_t)prec;
    parms[c].sgnd = 0;
  }
  opj_image_t* image = a->image_create((uint32_t)ncomps, parms.data(),
                                       1 /*OPJ_CLRSPC_SRGB*/);
  if (!image) return -12;
  image->x0 = 0;
  image->y0 = 0;
  image->x1 = (uint32_t)w;
  image->y1 = (uint32_t)h;
  const int32_t* src = data;
  for (int32_t c = 0; c < ncomps; ++c) {
    int64_t n = (int64_t)parms[c].w * parms[c].h;
    std::memcpy(image->comps[c].data, src, n * sizeof(int32_t));
    src += n;
  }

  // opj_cparameters_t is opaque here (no headers in the image); defaults
  // need three fields flipped for encoding (as opj_compress does):
  // tcp_numlayers=1, tcp_rates[0]=0, cp_disto_alloc=1. cp_disto_alloc sits
  // at a fixed early offset (20: after tile_size_on + 4 ints); the layer
  // fields are located by scanning for the distinctive default triple
  // (numresolution=6, cblockw_init=64, cblockh_init=64) that directly
  // follows tcp_rates[100] + tcp_distoratio[100].
  std::vector<uint8_t> params(32768, 0);
  a->set_default_enc_params(params.data());
  int32_t* pi = (int32_t*)params.data();
  pi[5] = 1;  // cp_disto_alloc (offset 20)
  int64_t found = -1;
  for (int64_t i = 6; i < (int64_t)(params.size() / 4) - 2; ++i) {
    if (pi[i] == 6 && pi[i + 1] == 64 && pi[i + 2] == 64) {
      found = i;
      break;
    }
  }
  if (found < 0) {
    a->image_destroy(image);
    return -13;  // unexpected opj_cparameters_t layout
  }
  // layout: ... tcp_numlayers, tcp_rates[100], tcp_distoratio[100],
  //             numresolution(=6), cblockw_init(=64), cblockh_init(=64) ...
  pi[found - 201] = 1;                       // tcp_numlayers
  ((float*)pi)[found - 200] = 0.0f;          // tcp_rates[0] (0 = lossless)

  void* codec = a->create_compress(codec_for(path));
  if (!codec) {
    a->image_destroy(image);
    return -14;
  }
  int rc = 0;
  void* stream = nullptr;
  if (!a->setup_encoder(codec, params.data(), image)) rc = -15;
  if (rc == 0) {
    stream = a->stream_create(path, 0 /*write*/);
    if (!stream) rc = -16;
  }
  if (rc == 0 && !a->start_compress(codec, image, stream)) rc = -17;
  if (rc == 0 && !a->encode(codec, stream)) rc = -18;
  if (rc == 0 && !a->end_compress(codec, stream)) rc = -19;
  if (stream) a->stream_destroy(stream);
  a->destroy_codec(codec);
  a->image_destroy(image);
  return rc;
}

int jp2_available() { return api()->ok() ? 1 : 0; }

}  // extern "C"
