// Native host-side data-loader core for rap_tpu.
//
// The reference's input pipeline rides external native code (HDF5 C, trimesh
// /Open3D PLY parsers, pytorch3d CUDA FPS). This is the TPU-host equivalent:
// the hot host loops — binary-PLY vertex parsing, voxel-hash downsampling,
// exact farthest-point sampling — as a small C ABI consumed via ctypes
// (rap_tpu/native/__init__.py), with pure-numpy fallbacks when unbuilt.
//
// Build: python -m rap_tpu.native.build   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>
#include <unordered_map>

extern "C" {

// ---------------------------------------------------------------------------
// PLY reading (ASCII + binary little endian), vertex x/y/z[/nx/ny/nz] floats
// ---------------------------------------------------------------------------

struct PlyInfo {
  long n_vertex = -1;
  long header_end = 0;     // byte offset of vertex data
  int fmt = 0;             // 0 ascii, 1 binary LE, 2 binary BE
  int stride = 0;          // bytes per vertex record (binary)
  int off_x = -1, off_y = -1, off_z = -1;  // byte offsets within record
  int col_x = -1, col_y = -1, col_z = -1;  // column indices (ascii)
  int n_props = 0;
  int type_x = 0;          // 0 f32, 1 f64
};

static int type_size(const std::string& t) {
  if (t == "char" || t == "uchar" || t == "int8" || t == "uint8") return 1;
  if (t == "short" || t == "ushort" || t == "int16" || t == "uint16") return 2;
  if (t == "int" || t == "uint" || t == "int32" || t == "uint32" ||
      t == "float" || t == "float32") return 4;
  if (t == "double" || t == "float64") return 8;
  return -1;
}

static bool parse_header(FILE* f, PlyInfo* info) {
  char line[4096];
  if (!fgets(line, sizeof line, f)) return false;
  if (strncmp(line, "ply", 3) != 0) return false;
  bool in_vertex = false;
  int byte_off = 0, col = 0;
  while (fgets(line, sizeof line, f)) {
    std::string s(line);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
    if (s.rfind("format", 0) == 0) {
      if (s.find("ascii") != std::string::npos) info->fmt = 0;
      else if (s.find("binary_little_endian") != std::string::npos) info->fmt = 1;
      else info->fmt = 2;
    } else if (s.rfind("element", 0) == 0) {
      char name[256]; long cnt = 0;
      if (sscanf(s.c_str(), "element %255s %ld", name, &cnt) == 2) {
        in_vertex = (strcmp(name, "vertex") == 0);
        if (in_vertex) { info->n_vertex = cnt; byte_off = 0; col = 0; }
      }
    } else if (s.rfind("property", 0) == 0 && in_vertex) {
      char t[64], n[256];
      if (sscanf(s.c_str(), "property %63s %255s", t, n) == 2) {
        if (strcmp(t, "list") == 0) return false;  // list on vertex: bail
        int sz = type_size(t);
        if (sz < 0) return false;
        if (strcmp(n, "x") == 0) { info->off_x = byte_off; info->col_x = col;
          info->type_x = (sz == 8) ? 1 : 0; }
        if (strcmp(n, "y") == 0) { info->off_y = byte_off; info->col_y = col; }
        if (strcmp(n, "z") == 0) { info->off_z = byte_off; info->col_z = col; }
        byte_off += sz; col += 1;
      }
    } else if (s.rfind("end_header", 0) == 0) {
      info->stride = byte_off;
      info->n_props = col;
      info->header_end = ftell(f);
      return info->n_vertex >= 0 && info->off_x >= 0 && info->off_y >= 0 &&
             info->off_z >= 0;
    }
  }
  return false;
}

long ply_vertex_count(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  PlyInfo info;
  bool ok = parse_header(f, &info);
  fclose(f);
  return ok ? info.n_vertex : -1;
}

// out_xyz: float32 buffer of capacity >= 3 * n_vertex. Returns #points or -1.
long ply_read_xyz(const char* path, float* out_xyz) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  PlyInfo info;
  if (!parse_header(f, &info)) { fclose(f); return -1; }
  long n = info.n_vertex;
  if (info.fmt == 2) { fclose(f); return -2; }  // big endian: python fallback
  if (info.fmt == 1) {
    std::vector<unsigned char> buf((size_t)info.stride * 65536);
    long done = 0;
    while (done < n) {
      long chunk = std::min<long>(65536, n - done);
      size_t got = fread(buf.data(), info.stride, chunk, f);
      if ((long)got != chunk) { fclose(f); return -1; }
      for (long i = 0; i < chunk; i++) {
        const unsigned char* rec = buf.data() + (size_t)i * info.stride;
        if (info.type_x == 0) {
          float x, y, z;
          memcpy(&x, rec + info.off_x, 4);
          memcpy(&y, rec + info.off_y, 4);
          memcpy(&z, rec + info.off_z, 4);
          out_xyz[3 * (done + i) + 0] = x;
          out_xyz[3 * (done + i) + 1] = y;
          out_xyz[3 * (done + i) + 2] = z;
        } else {
          double x, y, z;
          memcpy(&x, rec + info.off_x, 8);
          memcpy(&y, rec + info.off_y, 8);
          memcpy(&z, rec + info.off_z, 8);
          out_xyz[3 * (done + i) + 0] = (float)x;
          out_xyz[3 * (done + i) + 1] = (float)y;
          out_xyz[3 * (done + i) + 2] = (float)z;
        }
      }
      done += chunk;
    }
    fclose(f);
    return n;
  }
  // ascii — bail out (caller falls back to the python reader) rather than
  // mis-parse rows when a vertex has more properties than the buffer
  if (info.n_props > 64 || info.col_x >= 64 || info.col_y >= 64 ||
      info.col_z >= 64) {
    fclose(f);
    return -1;
  }
  for (long i = 0; i < n; i++) {
    double vals[64];
    for (int c = 0; c < info.n_props; c++) {
      if (fscanf(f, "%lf", &vals[c]) != 1) { fclose(f); return -1; }
    }
    out_xyz[3 * i + 0] = (float)vals[info.col_x];
    out_xyz[3 * i + 1] = (float)vals[info.col_y];
    out_xyz[3 * i + 2] = (float)vals[info.col_z];
  }
  fclose(f);
  return n;
}

// ---------------------------------------------------------------------------
// Voxel-hash downsampling: mean point per occupied voxel.
// out capacity >= n * 3. Returns #voxels.
// ---------------------------------------------------------------------------

long voxel_downsample_xyz(const float* pts, long n, float voxel, float* out) {
  if (n <= 0 || voxel <= 0.f) return 0;
  struct Acc { double x = 0, y = 0, z = 0; long cnt = 0; long order = 0; };
  std::unordered_map<uint64_t, Acc> cells;
  cells.reserve((size_t)n / 4 + 16);
  // voxel index = floor(p / voxel) (matches the numpy fallback's partition),
  // shifted by the per-axis minimum INDEX into 21-bit unsigned lanes
  int64_t minix = INT64_MAX, miniy = INT64_MAX, miniz = INT64_MAX;
  std::vector<int64_t> idx((size_t)n * 3);
  for (long i = 0; i < n; i++) {
    idx[3 * i + 0] = (int64_t)std::floor(pts[3 * i + 0] / voxel);
    idx[3 * i + 1] = (int64_t)std::floor(pts[3 * i + 1] / voxel);
    idx[3 * i + 2] = (int64_t)std::floor(pts[3 * i + 2] / voxel);
    minix = std::min(minix, idx[3 * i + 0]);
    miniy = std::min(miniy, idx[3 * i + 1]);
    miniz = std::min(miniz, idx[3 * i + 2]);
  }
  // key packs 3 x 21-bit shifted indices; an axis spanning >= 2^21 voxels
  // cannot be packed collision-free — signal the caller to use the
  // collision-free numpy path instead of silently merging distant voxels
  int64_t maxix = INT64_MIN, maxiy = INT64_MIN, maxiz = INT64_MIN;
  for (long i = 0; i < n; i++) {
    maxix = std::max(maxix, idx[3 * i + 0]);
    maxiy = std::max(maxiy, idx[3 * i + 1]);
    maxiz = std::max(maxiz, idx[3 * i + 2]);
  }
  const int64_t LIM = (int64_t)1 << 21;
  if (maxix - minix >= LIM || maxiy - miniy >= LIM || maxiz - miniz >= LIM) {
    return -1;
  }
  long next_order = 0;
  for (long i = 0; i < n; i++) {
    uint64_t ix = (uint64_t)(idx[3 * i + 0] - minix);
    uint64_t iy = (uint64_t)(idx[3 * i + 1] - miniy);
    uint64_t iz = (uint64_t)(idx[3 * i + 2] - miniz);
    uint64_t key = (ix << 42) | ((iy & 0x1FFFFF) << 21) | (iz & 0x1FFFFF);
    Acc& a = cells[key];
    if (a.cnt == 0) a.order = next_order++;
    a.x += pts[3 * i]; a.y += pts[3 * i + 1]; a.z += pts[3 * i + 2];
    a.cnt += 1;
  }
  for (const auto& kv : cells) {
    const Acc& a = kv.second;
    out[3 * a.order + 0] = (float)(a.x / a.cnt);
    out[3 * a.order + 1] = (float)(a.y / a.cnt);
    out[3 * a.order + 2] = (float)(a.z / a.cnt);
  }
  return (long)cells.size();
}

// ---------------------------------------------------------------------------
// Exact farthest point sampling. out_idx capacity >= k.
// ---------------------------------------------------------------------------

void fps_xyz(const float* pts, long n, long k, long start, long* out_idx) {
  if (n <= 0 || k <= 0) return;
  std::vector<float> d2((size_t)n);
  long cur = (start >= 0 && start < n) ? start : 0;
  out_idx[0] = cur;
  for (long i = 0; i < n; i++) {
    float dx = pts[3 * i] - pts[3 * cur];
    float dy = pts[3 * i + 1] - pts[3 * cur + 1];
    float dz = pts[3 * i + 2] - pts[3 * cur + 2];
    d2[i] = dx * dx + dy * dy + dz * dz;
  }
  for (long j = 1; j < k; j++) {
    long best = 0;
    float bestd = -1.f;
    for (long i = 0; i < n; i++) {
      if (d2[i] > bestd) { bestd = d2[i]; best = i; }
    }
    out_idx[j] = best;
    const float bx = pts[3 * best], by = pts[3 * best + 1], bz = pts[3 * best + 2];
    for (long i = 0; i < n; i++) {
      float dx = pts[3 * i] - bx;
      float dy = pts[3 * i + 1] - by;
      float dz = pts[3 * i + 2] - bz;
      float nd = dx * dx + dy * dy + dz * dz;
      if (nd < d2[i]) d2[i] = nd;
    }
  }
}

}  // extern "C"
