// Native PLY mesh loader (reference: src/ext/rply via util/mesh +
// Shape "plymesh"). Supports ascii and binary_little_endian PLY with
// float vertex properties x,y,z[,nx,ny,nz][,u/s,v/t] and int face lists
// (triangulated by fanning). Two-phase API for ctypes: open -> query
// counts -> fill caller buffers -> free.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Mesh {
    std::vector<float> pos, nrm, uv;
    std::vector<int32_t> idx;  // triangulated
    bool has_nrm = false, has_uv = false;
};

struct Prop {
    std::string name;
    int bytes;      // per scalar
    bool is_float;  // float/double vs int kinds
    bool is_list;
    int list_count_bytes;
    int list_elem_bytes;
};

int type_bytes(const std::string &t) {
    if (t == "char" || t == "uchar" || t == "int8" || t == "uint8") return 1;
    if (t == "short" || t == "ushort" || t == "int16" || t == "uint16") return 2;
    if (t == "int" || t == "uint" || t == "int32" || t == "uint32" ||
        t == "float" || t == "float32")
        return 4;
    if (t == "double" || t == "float64") return 8;
    return 0;
}
bool type_float(const std::string &t) {
    return t == "float" || t == "float32" || t == "double" || t == "float64";
}

double read_scalar(const uint8_t *p, int bytes, bool is_float) {
    if (is_float) {
        if (bytes == 4) { float v; std::memcpy(&v, p, 4); return v; }
        double v; std::memcpy(&v, p, 8); return v;
    }
    int64_t v = 0;
    std::memcpy(&v, p, bytes);  // little-endian host assumed
    // sign-extension unneeded for counts/indices in practice
    return (double)v;
}

}  // namespace

extern "C" {

void *vspg_ply_open(const char *path) {
    FILE *f = fopen(path, "rb");
    if (!f) return nullptr;
    char line[4096];
    bool binary = false;
    long n_vert = 0, n_face = 0;
    std::vector<Prop> vprops, fprops;
    std::vector<Prop> *cur = nullptr;
    bool cur_is_vertex = false;

    if (!fgets(line, sizeof line, f) || strncmp(line, "ply", 3)) {
        fclose(f);
        return nullptr;
    }
    while (fgets(line, sizeof line, f)) {
        char a[256] = {0}, b[256] = {0}, c[256] = {0}, d[256] = {0}, e[256] = {0};
        int nf = sscanf(line, "%255s %255s %255s %255s %255s", a, b, c, d, e);
        if (!strcmp(a, "format")) {
            binary = !strcmp(b, "binary_little_endian");
            if (!binary && strcmp(b, "ascii")) { fclose(f); return nullptr; }
        } else if (!strcmp(a, "element")) {
            if (!strcmp(b, "vertex")) { n_vert = atol(c); cur = &vprops; cur_is_vertex = true; }
            else if (!strcmp(b, "face")) { n_face = atol(c); cur = &fprops; cur_is_vertex = false; }
            else cur = nullptr;
        } else if (!strcmp(a, "property") && cur) {
            Prop p{};
            if (!strcmp(b, "list") && nf >= 5) {
                p.is_list = true;
                p.list_count_bytes = type_bytes(c);
                p.list_elem_bytes = type_bytes(d);
                p.name = e;
            } else {
                p.bytes = type_bytes(b);
                p.is_float = type_float(b);
                p.name = c;
            }
            cur->push_back(p);
        } else if (!strcmp(a, "end_header")) {
            break;
        }
        (void)cur_is_vertex;
    }

    auto find = [&](const char *n) {
        for (size_t i = 0; i < vprops.size(); ++i)
            if (vprops[i].name == n) return (int)i;
        return -1;
    };
    int ix = find("x"), iy = find("y"), iz = find("z");
    int inx = find("nx"), iny = find("ny"), inz = find("nz");
    int iu = find("u"), iv = find("v");
    if (iu < 0) iu = find("s");
    if (iv < 0) iv = find("t");
    if (ix < 0 || iy < 0 || iz < 0) { fclose(f); return nullptr; }

    Mesh *m = new Mesh();
    m->has_nrm = inx >= 0 && iny >= 0 && inz >= 0;
    m->has_uv = iu >= 0 && iv >= 0;
    m->pos.reserve(3 * n_vert);

    if (binary) {
        size_t stride = 0;
        std::vector<size_t> offs(vprops.size());
        for (size_t i = 0; i < vprops.size(); ++i) {
            offs[i] = stride;
            stride += vprops[i].bytes;
        }
        std::vector<uint8_t> buf(stride * (size_t)n_vert);
        if (fread(buf.data(), 1, buf.size(), f) != buf.size()) { delete m; fclose(f); return nullptr; }
        auto get = [&](long v, int pi) {
            const Prop &p = vprops[pi];
            return read_scalar(&buf[v * stride + offs[pi]], p.bytes, p.is_float);
        };
        for (long v = 0; v < n_vert; ++v) {
            m->pos.push_back((float)get(v, ix));
            m->pos.push_back((float)get(v, iy));
            m->pos.push_back((float)get(v, iz));
            if (m->has_nrm) {
                m->nrm.push_back((float)get(v, inx));
                m->nrm.push_back((float)get(v, iny));
                m->nrm.push_back((float)get(v, inz));
            }
            if (m->has_uv) {
                m->uv.push_back((float)get(v, iu));
                m->uv.push_back((float)get(v, iv));
            }
        }
        // faces
        for (long fi = 0; fi < n_face; ++fi) {
            for (const Prop &p : fprops) {
                if (p.is_list) {
                    uint8_t cb[8];
                    if (fread(cb, 1, p.list_count_bytes, f) != (size_t)p.list_count_bytes) { delete m; fclose(f); return nullptr; }
                    long cnt = (long)read_scalar(cb, p.list_count_bytes, false);
                    std::vector<int32_t> poly(cnt);
                    for (long k = 0; k < cnt; ++k) {
                        uint8_t eb[8];
                        if (fread(eb, 1, p.list_elem_bytes, f) != (size_t)p.list_elem_bytes) { delete m; fclose(f); return nullptr; }
                        poly[k] = (int32_t)read_scalar(eb, p.list_elem_bytes, false);
                    }
                    for (long k = 2; k < cnt; ++k) {  // fan triangulation
                        m->idx.push_back(poly[0]);
                        m->idx.push_back(poly[k - 1]);
                        m->idx.push_back(poly[k]);
                    }
                } else {
                    fseek(f, p.bytes, SEEK_CUR);
                }
            }
        }
    } else {  // ascii
        for (long v = 0; v < n_vert; ++v) {
            std::vector<double> vals(vprops.size());
            for (size_t i = 0; i < vprops.size(); ++i)
                if (fscanf(f, "%lf", &vals[i]) != 1) { delete m; fclose(f); return nullptr; }
            m->pos.push_back((float)vals[ix]);
            m->pos.push_back((float)vals[iy]);
            m->pos.push_back((float)vals[iz]);
            if (m->has_nrm) {
                m->nrm.push_back((float)vals[inx]);
                m->nrm.push_back((float)vals[iny]);
                m->nrm.push_back((float)vals[inz]);
            }
            if (m->has_uv) {
                m->uv.push_back((float)vals[iu]);
                m->uv.push_back((float)vals[iv]);
            }
        }
        for (long fi = 0; fi < n_face; ++fi) {
            long cnt;
            if (fscanf(f, "%ld", &cnt) != 1) break;
            std::vector<int32_t> poly(cnt);
            for (long k = 0; k < cnt; ++k)
                if (fscanf(f, "%d", &poly[k]) != 1) { delete m; fclose(f); return nullptr; }
            for (long k = 2; k < cnt; ++k) {
                m->idx.push_back(poly[0]);
                m->idx.push_back(poly[k - 1]);
                m->idx.push_back(poly[k]);
            }
        }
    }
    fclose(f);
    return m;
}

int64_t vspg_ply_n_vertices(void *h) { return ((Mesh *)h)->pos.size() / 3; }
int64_t vspg_ply_n_triangles(void *h) { return ((Mesh *)h)->idx.size() / 3; }
int32_t vspg_ply_has_normals(void *h) { return ((Mesh *)h)->has_nrm; }
int32_t vspg_ply_has_uv(void *h) { return ((Mesh *)h)->has_uv; }

void vspg_ply_fill(void *h, float *pos, float *nrm, float *uv, int32_t *idx) {
    Mesh *m = (Mesh *)h;
    std::memcpy(pos, m->pos.data(), m->pos.size() * 4);
    if (m->has_nrm && nrm) std::memcpy(nrm, m->nrm.data(), m->nrm.size() * 4);
    if (m->has_uv && uv) std::memcpy(uv, m->uv.data(), m->uv.size() * 4);
    std::memcpy(idx, m->idx.data(), m->idx.size() * 4);
}

void vspg_ply_free(void *h) { delete (Mesh *)h; }
}
