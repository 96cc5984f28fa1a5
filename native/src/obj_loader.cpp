// Wavefront OBJ parser: native asset loader.
//
// Counterpart of the reference's vendored objUtil (objloader.cpp:14-129 line
// parser + obj::buildVBOs flattening, obj.cpp:33-135), and of the pure-Python
// fallback in octree_slam_tpu/io/obj.py (kept in behavioral lockstep — see
// tests/test_native.py). Handles v/vt/vn, faces in the v, v/vt, v//vn,
// v/vt/vn forms with negative indices, polygon-fan triangulation, per-corner
// texcoords, and smooth vertex normals when the file carries none.
//
// C ABI, consumed via ctypes from octree_slam_tpu/io/native.py.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Corner {
  int32_t v, t, n;
};

struct ObjData {
  std::vector<float> vertices;   // nv*3
  std::vector<float> normals;    // nv*3 (smooth, always filled)
  std::vector<int32_t> faces;    // nf*3
  std::vector<float> uvs;        // nf*3*2
  float bbox[6] = {0, 0, 0, 0, 0, 0};
};

int32_t parse_index(const char* tok, size_t count) {
  long i = strtol(tok, nullptr, 10);
  return i > 0 ? static_cast<int32_t>(i - 1)
               : static_cast<int32_t>(count + i);
}

}  // namespace

extern "C" {

ObjData* oslam_obj_load(const char* path) {
  FILE* fp = fopen(path, "r");
  if (!fp) return nullptr;

  std::vector<float> pos, vt, vn;
  std::vector<std::vector<Corner>> tris;

  char line[4096];
  while (fgets(line, sizeof(line), fp)) {
    char* s = line;
    while (*s == ' ' || *s == '\t') ++s;
    if (*s == '#' || *s == '\0' || *s == '\n' || *s == '\r') continue;

    if (s[0] == 'v' && (s[1] == ' ' || s[1] == '\t')) {
      float x = 0, y = 0, z = 0;
      sscanf(s + 2, "%f %f %f", &x, &y, &z);
      pos.push_back(x); pos.push_back(y); pos.push_back(z);
    } else if (s[0] == 'v' && s[1] == 't') {
      float u = 0, v = 0;
      sscanf(s + 2, "%f %f", &u, &v);
      vt.push_back(u); vt.push_back(v);
    } else if (s[0] == 'v' && s[1] == 'n') {
      float x = 0, y = 0, z = 0;
      sscanf(s + 2, "%f %f %f", &x, &y, &z);
      vn.push_back(x); vn.push_back(y); vn.push_back(z);
    } else if (s[0] == 'f' && (s[1] == ' ' || s[1] == '\t')) {
      std::vector<Corner> corners;
      char* save = nullptr;
      for (char* tok = strtok_r(s + 1, " \t\r\n", &save); tok;
           tok = strtok_r(nullptr, " \t\r\n", &save)) {
        Corner c{-1, -1, -1};
        c.v = parse_index(tok, pos.size() / 3);
        char* slash1 = strchr(tok, '/');
        if (slash1) {
          char* slash2 = strchr(slash1 + 1, '/');
          if (slash1[1] != '\0' && slash1[1] != '/')
            c.t = parse_index(slash1 + 1, vt.size() / 2);
          if (slash2 && slash2[1] != '\0')
            c.n = parse_index(slash2 + 1, vn.size() / 3);
        }
        corners.push_back(c);
      }
      // Drop corners whose vertex index is out of range (malformed token or
      // forward reference): keeping them would emit faces indexing past the
      // vertex array and over-read pos[] in the normal fallback below.
      const size_t nv_now = pos.size() / 3;
      std::vector<Corner> ok;
      ok.reserve(corners.size());
      for (const Corner& c : corners)
        if (c.v >= 0 && static_cast<size_t>(c.v) < nv_now) ok.push_back(c);
      for (size_t k = 1; k + 1 < ok.size(); ++k)
        tris.push_back({ok[0], ok[k], ok[k + 1]});
    }
    // mtllib/usemtl/o/g/s lines are ignored, as in objloader.cpp
  }
  fclose(fp);

  auto* out = new ObjData();
  out->vertices = pos;
  const size_t nv = pos.size() / 3;
  const size_t nf = tris.size();
  out->faces.resize(nf * 3);
  out->uvs.assign(nf * 6, 0.0f);
  out->normals.assign(nv * 3, 0.0f);

  for (size_t i = 0; i < nf; ++i)
    for (int j = 0; j < 3; ++j) {
      const Corner& c = tris[i][j];
      out->faces[3 * i + j] = c.v;
      if (c.t >= 0 && static_cast<size_t>(c.t) < vt.size() / 2) {
        out->uvs[6 * i + 2 * j] = vt[2 * c.t];
        out->uvs[6 * i + 2 * j + 1] = vt[2 * c.t + 1];
      }
    }

  // Smooth vertex normals, matching io/obj.py: average referenced vn per
  // vertex when present; else accumulate area-weighted face normals.
  bool any = false;
  if (!vn.empty()) {
    std::vector<float> counts(nv, 0.0f);
    for (const auto& tri : tris)
      for (const Corner& c : tri)
        if (c.n >= 0 && static_cast<size_t>(c.n) < vn.size() / 3 &&
            c.v >= 0 && static_cast<size_t>(c.v) < nv) {
          for (int a = 0; a < 3; ++a)
            out->normals[3 * c.v + a] += vn[3 * c.n + a];
          counts[c.v] += 1.0f;
        }
    for (size_t v = 0; v < nv; ++v)
      if (counts[v] > 0)
        for (int a = 0; a < 3; ++a) out->normals[3 * v + a] /= counts[v];
    for (float x : out->normals) any = any || std::fabs(x) > 0.0f;
  }
  if (!any) {
    std::fill(out->normals.begin(), out->normals.end(), 0.0f);
    for (size_t i = 0; i < nf; ++i) {
      const int32_t* f = &out->faces[3 * i];
      const float* a = &pos[3 * f[0]];
      const float* b = &pos[3 * f[1]];
      const float* c = &pos[3 * f[2]];
      float ab[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
      float ac[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
      float n[3] = {ab[1] * ac[2] - ab[2] * ac[1],
                    ab[2] * ac[0] - ab[0] * ac[2],
                    ab[0] * ac[1] - ab[1] * ac[0]};
      for (int j = 0; j < 3; ++j)
        for (int axis = 0; axis < 3; ++axis)
          out->normals[3 * f[j] + axis] += n[axis];
    }
  }
  for (size_t v = 0; v < nv; ++v) {
    float* n = &out->normals[3 * v];
    float len = std::sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
    if (len > 1e-12f)
      for (int a = 0; a < 3; ++a) n[a] /= len;
  }

  if (nv) {
    for (int a = 0; a < 3; ++a)
      out->bbox[a] = out->bbox[3 + a] = pos[a];
    for (size_t v = 1; v < nv; ++v)
      for (int a = 0; a < 3; ++a) {
        float x = pos[3 * v + a];
        if (x < out->bbox[a]) out->bbox[a] = x;
        if (x > out->bbox[3 + a]) out->bbox[3 + a] = x;
      }
  }
  return out;
}

size_t oslam_obj_num_vertices(const ObjData* o) { return o->vertices.size() / 3; }
size_t oslam_obj_num_faces(const ObjData* o) { return o->faces.size() / 3; }
const float* oslam_obj_vertices(const ObjData* o) { return o->vertices.data(); }
const float* oslam_obj_normals(const ObjData* o) { return o->normals.data(); }
const int32_t* oslam_obj_faces(const ObjData* o) { return o->faces.data(); }
const float* oslam_obj_uvs(const ObjData* o) { return o->uvs.data(); }
const float* oslam_obj_bbox(const ObjData* o) { return o->bbox; }
void oslam_obj_free(ObjData* o) { delete o; }

}  // extern "C"
