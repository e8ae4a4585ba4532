// Single-threaded CPU volumetric path tracer for the BASELINE fog-box
// scene — the measured denominator for bench.py's vs_baseline.
//
// The reference (pbrt-v4) cannot be built in this container (its src/ext
// submodules are empty), so this microbench implements the SAME estimator
// the reference's VolPathIntegrator runs on this scene (delta tracking in a
// homogeneous medium degenerates to one exponential draw; NEE with analytic
// transmittance; HG phase sampling; env MIS — cpu/integrators.cpp:998-1319
// semantics) in tight scalar C++ (-O3), which upper-bounds a production CPU
// renderer's per-thread throughput on this scene. The bench multiplies the
// measured single-thread Mpaths/s by 64 for the "64-thread CPU" denominator
// (ideal scaling — again generous to the CPU).
//
// Build: g++ -O3 -march=native -o cpu_volpath_baseline cpu_volpath_baseline.cpp
// Run:   ./cpu_volpath_baseline [spp] [mode]
//        mode 0 (default): homogeneous fog box (BASELINE config 1)
//        mode 1: heterogeneous cloud — 64^3 density grid, 16^3 majorant
//                grid, DDA majorant traversal + delta tracking
//                (media.h:140-218 DDAMajorantIterator semantics)
// Prints "<Mpaths_per_sec> <img_mean>"

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <chrono>

struct V3 {
  float x, y, z;
};
static inline V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 operator*(float s, V3 a) { return {s * a.x, s * a.y, s * a.z}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 norm(V3 a) {
  float inv = 1.0f / std::sqrt(dot(a, a));
  return inv * a;
}

// pcg32 (pbrt util/rng.h)
struct Rng {
  uint64_t state = 0x853c49e6748fea9bULL, inc = 0xda3e39cb94b95bdbULL;
  void seed(uint64_t s, uint64_t seq) {
    state = 0; inc = (seq << 1u) | 1u; next(); state += s; next();
  }
  uint32_t next() {
    uint64_t old = state;
    state = old * 6364136223846793005ULL + inc;
    uint32_t xorshifted = (uint32_t)(((old >> 18u) ^ old) >> 27u);
    uint32_t rot = (uint32_t)(old >> 59u);
    return (xorshifted >> rot) | (xorshifted << ((~rot + 1u) & 31));
  }
  float uf() { return (next() >> 8) * (1.0f / (1 << 24)); }
};

static const float SA[3] = {0.05f, 0.05f, 0.05f};
static const float SS[3] = {0.5f, 0.6f, 0.7f};
static const float ST[3] = {0.55f, 0.65f, 0.75f};
static const float G = 0.3f;
static const V3 LP = {0.0f, 0.8f, 0.0f};
static const float LI[3] = {5.0f, 5.0f, 5.0f};
static const float ENVL[3] = {0.1f, 0.12f, 0.15f};
static const float INV4PI = 0.07957747f;
static const int MAXDEPTH = 32;
// cloud-mode light: external point above the cloud + the same env
static const V3 LP2 = {0.0f, 1.8f, 0.0f};
static const float LI2[3] = {8.0f, 8.0f, 8.0f};

// slab test: returns (hit, t, entering)
static inline bool boxHit(V3 o, V3 d, float *t, bool *entering) {
  float tn = -3e37f, tf = 3e37f;
  const float bmin[3] = {-1, -1, -1}, bmax[3] = {1, 1, 1};
  const float oc[3] = {o.x, o.y, o.z}, dc[3] = {d.x, d.y, d.z};
  for (int a = 0; a < 3; a++) {
    float inv = 1.0f / (std::fabs(dc[a]) < 1e-12f ? (dc[a] >= 0 ? 1e-12f : -1e-12f) : dc[a]);
    float t0 = (bmin[a] - oc[a]) * inv, t1 = (bmax[a] - oc[a]) * inv;
    if (t0 > t1) { float tmp = t0; t0 = t1; t1 = tmp; }
    if (t0 > tn) tn = t0;
    if (t1 < tf) tf = t1;
  }
  if (tn > tf || tf <= 1e-4f) return false;
  *entering = tn > 1e-4f;
  *t = *entering ? tn : tf;
  return true;
}

static inline float hg(float cosT) {
  float denom = 1.0f + G * G + 2.0f * G * cosT;
  return INV4PI * (1.0f - G * G) / (denom * std::sqrt(denom));
}

static inline void coordSys(V3 v, V3 *t1, V3 *t2) {
  float sign = v.z >= 0 ? 1.0f : -1.0f;
  float a = -1.0f / (sign + v.z), b = v.x * v.y * a;
  *t1 = {1.0f + sign * v.x * v.x * a, sign * b, -sign * v.x};
  *t2 = {b, sign + v.y * v.y * a, -v.y};
}

// ---- heterogeneous cloud mode (mode 1) ------------------------------------
static const int GN = 64;    // density grid res
static const int MJ = 16;    // majorant grid res
static float g_dens[GN * GN * GN];
static float g_maj[MJ * MJ * MJ];
static const float C_SA[3] = {0.1f, 0.1f, 0.1f};
static const float C_SS[3] = {2.0f, 2.0f, 2.0f};

static void initCloud() {
  for (int i = 0; i < GN; i++)
    for (int j = 0; j < GN; j++)
      for (int k = 0; k < GN; k++) {
        float x = -1.0f + 2.0f * (i + 0.5f) / GN;
        float y = -1.0f + 2.0f * (j + 0.5f) / GN;
        float z = -1.0f + 2.0f * (k + 0.5f) / GN;
        float r = std::sqrt(x * x + y * y + z * z);
        float d = r < 1.0f ? (1.0f - r) : 0.0f;
        // lumpy cloud: radial falloff modulated by a cheap harmonic
        d *= 0.75f + 0.25f * std::sin(7.1f * x) * std::sin(5.3f * y + 1.1f)
                         * std::sin(6.7f * z + 2.3f);
        g_dens[(i * GN + j) * GN + k] = d < 0 ? 0 : 4.0f * d;
      }
  for (int c = 0; c < MJ * MJ * MJ; c++) g_maj[c] = 0.0f;
  int S = GN / MJ;
  for (int i = 0; i < GN; i++)
    for (int j = 0; j < GN; j++)
      for (int k = 0; k < GN; k++) {
        int c = ((i / S) * MJ + j / S) * MJ + k / S;
        float d = g_dens[(i * GN + j) * GN + k];
        if (d > g_maj[c]) g_maj[c] = d;
      }
}

static inline float densAt(V3 p) {
  // nearest-cell lookup in [-1,1]^3 (GridMedium.density_at analog)
  int i = (int)((p.x + 1.0f) * 0.5f * GN); if (i < 0) i = 0; if (i >= GN) i = GN - 1;
  int j = (int)((p.y + 1.0f) * 0.5f * GN); if (j < 0) j = 0; if (j >= GN) j = GN - 1;
  int k = (int)((p.z + 1.0f) * 0.5f * GN); if (k < 0) k = 0; if (k >= GN) k = GN - 1;
  return g_dens[(i * GN + j) * GN + k];
}

// ratio-tracked transmittance through the cloud (gray medium)
static inline float ratioTrackTr(Rng &rng, V3 o, V3 d, float tEnd) {
  float T = 1.0f, t = 0.0f;
  const float st = C_SA[0] + C_SS[0];
  while (t < tEnd && T > 1e-4f) {
    V3 p = o + t * d;
    int ci = (int)((p.x + 1.0f) * 0.5f * MJ); if (ci < 0) ci = 0; if (ci >= MJ) ci = MJ - 1;
    int cj = (int)((p.y + 1.0f) * 0.5f * MJ); if (cj < 0) cj = 0; if (cj >= MJ) cj = MJ - 1;
    int ck = (int)((p.z + 1.0f) * 0.5f * MJ); if (ck < 0) ck = 0; if (ck >= MJ) ck = MJ - 1;
    float vx0 = -1.0f + 2.0f * ci / MJ, vx1 = vx0 + 2.0f / MJ;
    float vy0 = -1.0f + 2.0f * cj / MJ, vy1 = vy0 + 2.0f / MJ;
    float vz0 = -1.0f + 2.0f * ck / MJ, vz1 = vz0 + 2.0f / MJ;
    float tSeg = tEnd;
    {
      float inv, te;
      inv = 1.0f / (std::fabs(d.x) < 1e-12f ? (d.x >= 0 ? 1e-12f : -1e-12f) : d.x);
      te = ((d.x >= 0 ? vx1 : vx0) - o.x) * inv; if (te < tSeg) tSeg = te;
      inv = 1.0f / (std::fabs(d.y) < 1e-12f ? (d.y >= 0 ? 1e-12f : -1e-12f) : d.y);
      te = ((d.y >= 0 ? vy1 : vy0) - o.y) * inv; if (te < tSeg) tSeg = te;
      inv = 1.0f / (std::fabs(d.z) < 1e-12f ? (d.z >= 0 ? 1e-12f : -1e-12f) : d.z);
      te = ((d.z >= 0 ? vz1 : vz0) - o.z) * inv; if (te < tSeg) tSeg = te;
    }
    float majH = g_maj[(ci * MJ + cj) * MJ + ck] * st;
    if (tSeg <= t) { t += 1e-5f; continue; }  // stale voxel: float-rounded p still on the previous face puts tSeg behind t; nudge forward
    if (majH <= 0) { t = tSeg + 1e-5f; continue; }
    while (true) {
      t += -std::log1p(-rng.uf()) / majH;
      if (t >= tSeg) { t = tSeg + 1e-5f; break; }
      float dn = densAt(o + t * d);
      T *= 1.0f - dn * st / majH;
      if (T <= 1e-4f) return 0.0f;
    }
  }
  return T;
}

// delta tracking through the 16^3 majorant DDA; returns true if a real
// collision happens before tEnd (writes *tHit), beta/ru updated by caller
static inline bool deltaTrack(Rng &rng, V3 o, V3 d, float tEnd, int hero,
                              float *tHit, bool *absorbed) {
  // DDA setup over majorant voxels
  float t = 0.0f;
  while (t < tEnd) {
    V3 p = o + t * d;
    int ci = (int)((p.x + 1.0f) * 0.5f * MJ); if (ci < 0) ci = 0; if (ci >= MJ) ci = MJ - 1;
    int cj = (int)((p.y + 1.0f) * 0.5f * MJ); if (cj < 0) cj = 0; if (cj >= MJ) cj = MJ - 1;
    int ck = (int)((p.z + 1.0f) * 0.5f * MJ); if (ck < 0) ck = 0; if (ck >= MJ) ck = MJ - 1;
    // segment end = exit of this majorant voxel
    float vx0 = -1.0f + 2.0f * ci / MJ, vx1 = vx0 + 2.0f / MJ;
    float vy0 = -1.0f + 2.0f * cj / MJ, vy1 = vy0 + 2.0f / MJ;
    float vz0 = -1.0f + 2.0f * ck / MJ, vz1 = vz0 + 2.0f / MJ;
    float tSeg = tEnd;
    {
      float inv, te;
      inv = 1.0f / (std::fabs(d.x) < 1e-12f ? (d.x >= 0 ? 1e-12f : -1e-12f) : d.x);
      te = ((d.x >= 0 ? vx1 : vx0) - o.x) * inv; if (te < tSeg) tSeg = te;
      inv = 1.0f / (std::fabs(d.y) < 1e-12f ? (d.y >= 0 ? 1e-12f : -1e-12f) : d.y);
      te = ((d.y >= 0 ? vy1 : vy0) - o.y) * inv; if (te < tSeg) tSeg = te;
      inv = 1.0f / (std::fabs(d.z) < 1e-12f ? (d.z >= 0 ? 1e-12f : -1e-12f) : d.z);
      te = ((d.z >= 0 ? vz1 : vz0) - o.z) * inv; if (te < tSeg) tSeg = te;
    }
    float majH = g_maj[(ci * MJ + cj) * MJ + ck] * (C_SA[hero] + C_SS[hero]);
    if (tSeg <= t) { t += 1e-5f; continue; }  // stale voxel: float-rounded p still on the previous face puts tSeg behind t; nudge forward
    if (majH <= 0) { t = tSeg + 1e-5f; continue; }
    while (true) {
      t += -std::log1p(-rng.uf()) / majH;
      if (t >= tSeg) { t = tSeg + 1e-5f; break; }
      float dn = densAt(o + t * d);
      float saH = dn * C_SA[hero], ssH = dn * C_SS[hero];
      float u = rng.uf();
      if (u < saH / majH) { *tHit = t; *absorbed = true; return true; }
      if (u < (saH + ssH) / majH) { *tHit = t; *absorbed = false; return true; }
      // null collision: continue
    }
  }
  return false;
}

// ---- Cornell surface mode (mode 2, bench config 6's scene) ----------------
// Classic Cornell box, diffuse-only, ceiling area light; path tracing with
// one-sample NEE + BSDF-sampling MIS, depth cap 8 — the same estimator shape
// as ops/pallas_surface's cornell render, in tight scalar C++.
struct Tri { V3 p0, e1, e2, n; int mat, light; };
static Tri g_tris[14];
static const float C_ALB[3][3] = {{0.73f, 0.73f, 0.73f},
                                  {0.65f, 0.05f, 0.05f},
                                  {0.12f, 0.45f, 0.15f}};
static const float C_LE = 12.0f;
static const float LQ_AREA = 0.7f * 0.7f;  // light quad area (two tris)

static void pushQuad(int *n, V3 a, V3 b, V3 c, V3 dd, int mat, int light) {
  Tri t1 = {a, b - a, c - a, {0, 0, 0}, mat, light};
  Tri t2 = {a, c - a, dd - a, {0, 0, 0}, mat, light};
  g_tris[(*n)++] = t1;
  g_tris[(*n)++] = t2;
}

static void initCornell() {
  int n = 0;
  pushQuad(&n, {-1, 0, -1}, {1, 0, -1}, {1, 0, 1}, {-1, 0, 1}, 0, -1);
  pushQuad(&n, {-1, 2, 1}, {1, 2, 1}, {1, 2, -1}, {-1, 2, -1}, 0, -1);
  pushQuad(&n, {-1, 0, -1}, {1, 0, -1}, {1, 2, -1}, {-1, 2, -1}, 0, -1);
  pushQuad(&n, {-1, 0, -1}, {-1, 0, 1}, {-1, 2, 1}, {-1, 2, -1}, 1, -1);
  pushQuad(&n, {1, 0, 1}, {1, 0, -1}, {1, 2, -1}, {1, 2, 1}, 2, -1);
  pushQuad(&n, {-0.35f, 1.99f, -0.35f}, {0.35f, 1.99f, -0.35f},
           {0.35f, 1.99f, 0.35f}, {-0.35f, 1.99f, 0.35f}, 0, 0);
  for (int i = 0; i < 14; i++) {
    V3 c = {g_tris[i].e1.y * g_tris[i].e2.z - g_tris[i].e1.z * g_tris[i].e2.y,
            g_tris[i].e1.z * g_tris[i].e2.x - g_tris[i].e1.x * g_tris[i].e2.z,
            g_tris[i].e1.x * g_tris[i].e2.y - g_tris[i].e1.y * g_tris[i].e2.x};
    g_tris[i].n = norm(c);
  }
}

static inline int triHit(V3 o, V3 d, float tMax, float *tOut) {
  int best = -1;
  for (int i = 0; i < 14; i++) {
    const Tri &tr = g_tris[i];
    V3 pv = {d.y * tr.e2.z - d.z * tr.e2.y, d.z * tr.e2.x - d.x * tr.e2.z,
             d.x * tr.e2.y - d.y * tr.e2.x};
    float det = dot(tr.e1, pv);
    if (std::fabs(det) < 1e-12f) continue;
    float inv = 1.0f / det;
    V3 tv = o - tr.p0;
    float u = dot(tv, pv) * inv;
    if (u < 0 || u > 1) continue;
    V3 qv = {tv.y * tr.e1.z - tv.z * tr.e1.y, tv.z * tr.e1.x - tv.x * tr.e1.z,
             tv.x * tr.e1.y - tv.y * tr.e1.x};
    float v = dot(d, qv) * inv;
    if (v < 0 || u + v > 1) continue;
    float t = dot(tr.e2, qv) * inv;
    if (t > 1e-4f && t < tMax) { tMax = t; best = i; }
  }
  *tOut = tMax;
  return best;
}

static double renderCornell(int SPP) {
  initCornell();
  const int RES = 256;
  const V3 camO = {0, 1.0f, 3.2f};
  const float tanF = std::tan(45.0f * 0.5f * (float)M_PI / 180.0f);
  double sum = 0.0;
  Rng rng;
  auto start = std::chrono::steady_clock::now();
  for (int py = 0; py < RES; py++)
    for (int px = 0; px < RES; px++) {
      float acc[3] = {0, 0, 0};
      for (int s = 0; s < SPP; s++) {
        rng.seed((uint64_t)(py * RES + px), (uint64_t)s);
        float fx = (px + rng.uf()) / RES * 2.0f - 1.0f;
        float fy = 1.0f - (py + rng.uf()) / RES * 2.0f;
        V3 d = norm({fx * tanF, fy * tanF, -1.0f});
        V3 o = camO;
        float beta[3] = {1, 1, 1}, L[3] = {0, 0, 0};
        float bsdfPdf = 0.0f;  // pdf of the ray's BSDF sample (MIS)
        for (int depth = 0; depth < 8; depth++) {
          float tHit;
          int hi = triHit(o, d, 3e37f, &tHit);
          if (hi < 0) break;
          const Tri &tr = g_tris[hi];
          V3 p = o + tHit * d;
          V3 n = dot(tr.n, d) < 0 ? tr.n : -1.0f * tr.n;
          if (tr.light >= 0) {
            if (dot(tr.n, d) < 0) {  // emissive side faces down
              float w = 1.0f;
              if (depth > 0) {
                float cosL = std::fabs(dot(tr.n, d));
                float pL = tHit * tHit / (cosL * LQ_AREA);
                w = bsdfPdf / (bsdfPdf + pL);
              }
              for (int k = 0; k < 3; k++) L[k] += beta[k] * w * C_LE;
            }
            break;
          }
          const float *alb = C_ALB[tr.mat];
          // NEE: uniform point on the light quad
          float ua = rng.uf(), ub = rng.uf();
          V3 lp = {-0.35f + 0.7f * ua, 1.99f, -0.35f + 0.7f * ub};
          V3 toL = lp - p;
          float dist2 = dot(toL, toL), dist = std::sqrt(dist2);
          V3 wi = (1.0f / dist) * toL;
          float cosS = dot(n, wi), cosL = -wi.y;  // light faces -y
          if (cosS > 0 && cosL > 0) {
            float tOcc;
            V3 so = p + 1e-4f * n;
            int oc = triHit(so, wi, dist - 1e-3f, &tOcc);
            if (oc < 0 || g_tris[oc].light >= 0) {
              float pL = dist2 / (cosL * LQ_AREA);
              float pB = cosS * (1.0f / (float)M_PI);
              float w = pL / (pL + pB);
              for (int k = 0; k < 3; k++)
                L[k] += beta[k] * alb[k] * (1.0f / (float)M_PI) * cosS *
                        C_LE * w / pL;
            }
          }
          // cosine BSDF sample
          float u0 = rng.uf(), u1 = rng.uf();
          float r = std::sqrt(u0), ph = 2.0f * (float)M_PI * u1;
          V3 t1, t2; coordSys(n, &t1, &t2);
          float lz = std::sqrt(u0 < 1 ? 1 - u0 : 0);
          V3 nd = (r * std::cos(ph)) * t1 + (r * std::sin(ph)) * t2 + lz * n;
          bsdfPdf = (lz < 1e-6f ? 1e-6f : lz) * (1.0f / (float)M_PI);
          for (int k = 0; k < 3; k++) beta[k] *= alb[k];
          // RR after depth 3
          if (depth > 3) {
            float mb = beta[0] > beta[1] ? beta[0] : beta[1];
            if (beta[2] > mb) mb = beta[2];
            if (rng.uf() > mb) break;
            for (int k = 0; k < 3; k++) beta[k] /= (mb < 1 ? mb : 1.0f);
          }
          o = p + (dot(nd, n) >= 0 ? 1e-4f : -1e-4f) * n;
          d = nd;
        }
        for (int k = 0; k < 3; k++)
          acc[k] += std::isfinite(L[k]) ? L[k] : 0.0f;
      }
      sum += (acc[0] + acc[1] + acc[2]) / (3.0 * SPP);
    }
  auto end = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(end - start).count();
  double mpaths = (double)RES * RES * SPP / secs / 1e6;
  printf("%.4f %.5f\n", mpaths, sum / (RES * RES));
  return mpaths;
}

int main(int argc, char **argv) {
  const int RES = 256;
  const int SPP = argc > 1 ? atoi(argv[1]) : 8;
  const int MODE = argc > 2 ? atoi(argv[2]) : 0;
  if (MODE == 2) { renderCornell(SPP); return 0; }
  if (MODE == 1) initCloud();
  // camera: look_at (0,0,-4)->(0,0,0) up (0,1,0), fov 30, square
  const V3 camO = {0, 0, -4};
  const float tanF = std::tan(30.0f * 0.5f * (float)M_PI / 180.0f);
  double sum = 0.0;
  auto start = std::chrono::steady_clock::now();
  Rng rng;
  for (int py = 0; py < RES; py++)
    for (int px = 0; px < RES; px++) {
      float acc[3] = {0, 0, 0};
      for (int s = 0; s < SPP; s++) {
        rng.seed((uint64_t)(py * RES + px), (uint64_t)s);
        float fx = (px + rng.uf()) / RES * 2.0f - 1.0f;
        float fy = 1.0f - (py + rng.uf()) / RES * 2.0f;
        // look_at flips handedness the same way the TPU camera does; only
        // throughput matters here, not orientation
        V3 d = norm({fx * tanF, fy * tanF, 1.0f});
        V3 o = camO;
        int hero = (int)(rng.uf() * 3.0f); if (hero > 2) hero = 2;
        float beta[3] = {1, 1, 1}, ru[3] = {1, 1, 1}, rl[3] = {1, 1, 1};
        float L[3] = {0, 0, 0};
        int depth = 0; bool inMed = false;
        for (int ev = 0; ev < 256; ev++) {
          float tW; bool entering;
          bool hit = boxHit(o, d, &tW, &entering);
          float seg = hit ? tW : 3e37f;
          if (MODE == 1 && inMed) {
            // heterogeneous: DDA majorant walk + delta tracking (gray)
            float tHit; bool absorbed;
            if (deltaTrack(rng, o, d, seg, hero, &tHit, &absorbed)) {
              if (absorbed || depth >= MAXDEPTH) break;
              depth++;
              V3 p = o + tHit * d;
              V3 wo = -1.0f * d;
              // NEE (pmf 1/2 point/env), ratio-tracked shadow Tr
              float uSel = rng.uf(), u2a = rng.uf(), u2b = rng.uf();
              if (uSel < 0.5f) {
                V3 toL = LP2 - p;
                float dist2 = dot(toL, toL), dist = std::sqrt(dist2);
                V3 wi = (1.0f / dist) * toL;
                float f = hg(dot(wo, wi));
                if (f > 0) {
                  float tE; bool e2;
                  float tMed = boxHit(p, wi, &tE, &e2) ? (tE < dist ? tE : dist) : 0.0f;
                  float T = ratioTrackTr(rng, p, wi, tMed);
                  float den = 0.5f; // ru==1 gray; avg(ru*pmf)
                  for (int k = 0; k < 3; k++)
                    L[k] += beta[k] * T * LI2[k] * f / (dist2 * den);
                }
              } else {
                float ez = 1.0f - 2.0f * u2a;
                float er = std::sqrt(ez * ez < 1 ? 1 - ez * ez : 0);
                float ph = 2.0f * (float)M_PI * u2b;
                V3 wi = {er * std::cos(ph), er * std::sin(ph), ez};
                float f = hg(dot(wo, wi));
                if (f > 0) {
                  float tE; bool e2;
                  boxHit(p, wi, &tE, &e2);
                  float T = ratioTrackTr(rng, p, wi, tE);
                  float pl = 0.5f * INV4PI;
                  float den = pl + f;  // gray, ru==1
                  for (int k = 0; k < 3; k++)
                    L[k] += beta[k] * T * ENVL[k] * f / den;
                }
              }
              // HG phase sample
              float u0 = rng.uf(), u1 = rng.uf();
              float sq = (1 - G * G) / (1 + G - 2 * G * u0);
              float cosT = -(1 + G * G - sq * sq) / (2 * G);
              float sinT = std::sqrt(cosT * cosT < 1 ? 1 - cosT * cosT : 0);
              float ph2 = 2.0f * (float)M_PI * u1;
              V3 t1, t2; coordSys(wo, &t1, &t2);
              V3 wi = (sinT * std::cos(ph2)) * t1 + (sinT * std::sin(ph2)) * t2 + cosT * wo;
              float pdf = hg(cosT);
              if (pdf <= 0) break;
              for (int k = 0; k < 3; k++) rl[k] = ru[k] / pdf;
              o = p; d = wi;
              continue;
            }
            // no collision: fall through to escape / interface skip
          } else if (inMed) {
            float tColl = -std::log1p(-rng.uf()) / ST[hero];
            if (tColl < seg) {
              // collision: absorb or scatter
              if (rng.uf() < SA[hero] / ST[hero]) break;  // absorbed
              if (depth >= MAXDEPTH) break;
              depth++;
              float tmH = std::exp(-ST[hero] * tColl);
              for (int k = 0; k < 3; k++) {
                float sc = std::exp(-ST[k] * tColl) * SS[k] / (tmH * SS[hero]);
                beta[k] *= sc; ru[k] *= sc;
              }
              V3 p = o + tColl * d;
              V3 wo = -1.0f * d;
              // NEE: pick point light or env, pmf 1/2
              float uSel = rng.uf(), u2a = rng.uf(), u2b = rng.uf();
              if (uSel < 0.5f) {
                V3 toL = LP - p;
                float dist2 = dot(toL, toL), dist = std::sqrt(dist2);
                V3 wi = (1.0f / dist) * toL;
                float f = hg(dot(wo, wi));
                if (f > 0) {
                  float den = 0.0f;
                  for (int k = 0; k < 3; k++) den += ru[k] * 0.5f;
                  den = den / 3.0f; if (den < 1e-30f) den = 1e-30f;
                  for (int k = 0; k < 3; k++)
                    L[k] += beta[k] * std::exp(-ST[k] * dist) * LI[k] * f / (dist2 * den);
                }
              } else {
                float ez = 1.0f - 2.0f * u2a;
                float er = std::sqrt(ez * ez < 1 ? 1 - ez * ez : 0);
                float ph = 2.0f * (float)M_PI * u2b;
                V3 wi = {er * std::cos(ph), er * std::sin(ph), ez};
                float f = hg(dot(wo, wi));
                if (f > 0) {
                  float tE; bool ent2;
                  boxHit(p, wi, &tE, &ent2);
                  float pl = 0.5f * INV4PI, den = 0.0f;
                  for (int k = 0; k < 3; k++) den += ru[k] * pl + ru[k] * f;
                  den = den / 3.0f; if (den < 1e-30f) den = 1e-30f;
                  for (int k = 0; k < 3; k++)
                    L[k] += beta[k] * std::exp(-ST[k] * tE) * ENVL[k] * f / den;
                }
              }
              // HG phase sample
              float u0 = rng.uf(), u1 = rng.uf();
              float sq = (1 - G * G) / (1 + G - 2 * G * u0);
              float cosT = -(1 + G * G - sq * sq) / (2 * G);
              float sinT = std::sqrt(cosT * cosT < 1 ? 1 - cosT * cosT : 0);
              float ph2 = 2.0f * (float)M_PI * u1;
              V3 t1, t2; coordSys(wo, &t1, &t2);
              V3 wi = (sinT * std::cos(ph2)) * t1 + (sinT * std::sin(ph2)) * t2 + cosT * wo;
              float pdf = hg(cosT);
              if (pdf <= 0) break;
              for (int k = 0; k < 3; k++) rl[k] = ru[k] / pdf;
              o = p; d = wi;
              continue;
            }
            // ran to segment end: spectral rescale
            float teH = std::exp(-ST[hero] * seg);
            if (teH < 1e-30f) teH = 1e-30f;
            for (int k = 0; k < 3; k++) {
              float sc = std::exp(-ST[k] * seg) / teH;
              beta[k] *= sc; ru[k] *= sc; rl[k] *= sc;
            }
          }
          if (!hit) {  // escaped: env (+MIS)
            float den = 0.0f;
            if (depth == 0) {
              for (int k = 0; k < 3; k++) den += ru[k];
            } else {
              for (int k = 0; k < 3; k++) den += ru[k] + rl[k] * 0.5f * INV4PI;
            }
            den = den / 3.0f; if (den < 1e-30f) den = 1e-30f;
            for (int k = 0; k < 3; k++) L[k] += beta[k] * ENVL[k] / den;
            break;
          }
          // interface skip
          inMed = entering;
          o = o + (tW + 1e-4f) * d;
        }
        for (int k = 0; k < 3; k++)
          acc[k] += std::isfinite(L[k]) ? L[k] : 0.0f;
      }
      sum += (acc[0] + acc[1] + acc[2]) / (3.0 * SPP);
    }
  auto end = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(end - start).count();
  double mpaths = (double)RES * RES * SPP / secs / 1e6;
  printf("%.4f %.5f\n", mpaths, sum / (RES * RES));
  return 0;
}
