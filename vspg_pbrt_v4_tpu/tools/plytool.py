"""plytool: PLY mesh swiss-army knife (cmd/plytool.cpp analog).

Subcommands (same surface as the reference):
  info <file...>      vertex/face counts, bounds, attributes
  cat <file>          dump vertices/normals/uvs/faces as text
  displace            displace vertices along normals by an image
                      (--image, --scale, --uvscale, --edge-length,
                      --outfile) — edges longer than --edge-length are
                      subdivided first so the displacement resolves
                      (plytool.cpp displace semantics)
  split               split a big mesh into <= --maxfaces chunks
                      (--outbase) with per-chunk re-indexed vertices

Reading uses the native PLY loader (native/ply_loader.cpp) with a pure-
python ASCII fallback; writing emits binary-little-endian PLY readable by
pbrt and the native loader.
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np


def load_mesh(path):
    from ..scene import assets

    mesh = assets.get_ply(path)
    if mesh is None:
        raise SystemExit(f"plytool: cannot read '{path}'")
    return mesh


def write_ply(path, P, indices, N=None, uv=None):
    """Binary little-endian PLY writer."""
    P = np.asarray(P, "<f4")
    indices = np.asarray(indices, "<i4")
    nv, nt = P.shape[0], indices.shape[0]
    hdr = ["ply", "format binary_little_endian 1.0",
           f"element vertex {nv}",
           "property float x", "property float y", "property float z"]
    if N is not None:
        hdr += ["property float nx", "property float ny", "property float nz"]
    if uv is not None:
        hdr += ["property float u", "property float v"]
    hdr += [f"element face {nt}",
            "property list uchar int vertex_indices", "end_header"]
    cols = [P]
    if N is not None:
        cols.append(np.asarray(N, "<f4"))
    if uv is not None:
        cols.append(np.asarray(uv, "<f4"))
    vdata = np.concatenate(cols, axis=1).astype("<f4")
    with open(path, "wb") as f:
        f.write(("\n".join(hdr) + "\n").encode())
        f.write(vdata.tobytes())
        for tri in indices:
            f.write(struct.pack("<Biii", 3, int(tri[0]), int(tri[1]),
                                int(tri[2])))


def cmd_info(files):
    for path in files:
        m = load_mesh(path)
        P, idx = m["P"], m["indices"]
        lo, hi = P.min(0), P.max(0)
        attrs = [k for k in ("N", "uv") if k in m]
        print(f"{path}: {P.shape[0]} vertices, {idx.shape[0]} triangles, "
              f"bounds [{lo[0]:g} {lo[1]:g} {lo[2]:g}] - "
              f"[{hi[0]:g} {hi[1]:g} {hi[2]:g}]"
              + (f", attributes: {' '.join(attrs)}" if attrs else ""))
    return 0


def cmd_cat(files):
    for path in files:
        m = load_mesh(path)
        P = m["P"]
        print(f"# {path}")
        for i in range(P.shape[0]):
            line = f"v {P[i, 0]:g} {P[i, 1]:g} {P[i, 2]:g}"
            if "N" in m:
                n = m["N"][i]
                line += f"  n {n[0]:g} {n[1]:g} {n[2]:g}"
            if "uv" in m:
                u = m["uv"][i]
                line += f"  uv {u[0]:g} {u[1]:g}"
            print(line)
        for tri in m["indices"]:
            print(f"f {tri[0]} {tri[1]} {tri[2]}")
    return 0


def _subdivide_to_edge_length(P, idx, N, uv, max_edge):
    """Longest-edge midpoint subdivision until no edge exceeds max_edge
    (plytool.cpp displace pre-refinement)."""
    P = [p for p in np.asarray(P, np.float64)]
    N = [n for n in np.asarray(N, np.float64)] if N is not None else None
    uv = [u for u in np.asarray(uv, np.float64)] if uv is not None else None
    midcache = {}

    def midpoint(a, b):
        key = (min(a, b), max(a, b))
        if key in midcache:
            return midcache[key]
        P.append(0.5 * (P[a] + P[b]))
        if N is not None:
            n = N[a] + N[b]
            ln = np.linalg.norm(n)
            N.append(n / ln if ln > 0 else n)
        if uv is not None:
            uv.append(0.5 * (uv[a] + uv[b]))
        midcache[key] = len(P) - 1
        return midcache[key]

    work = [tuple(int(v) for v in t) for t in np.asarray(idx)]
    out = []
    guard = 0
    while work:
        guard += 1
        if guard > 40_000_000:
            raise SystemExit("plytool displace: runaway subdivision")
        a, b, c = work.pop()
        e = [np.linalg.norm(P[b] - P[a]), np.linalg.norm(P[c] - P[b]),
             np.linalg.norm(P[a] - P[c])]
        k = int(np.argmax(e))
        if e[k] <= max_edge:
            out.append((a, b, c))
            continue
        if k == 0:
            mid = midpoint(a, b)
            work += [(a, mid, c), (mid, b, c)]
        elif k == 1:
            mid = midpoint(b, c)
            work += [(a, b, mid), (a, mid, c)]
        else:
            mid = midpoint(c, a)
            work += [(a, b, mid), (mid, b, c)]
    return (np.asarray(P, np.float32), np.asarray(out, np.int32),
            np.asarray(N, np.float32) if N is not None else None,
            np.asarray(uv, np.float32) if uv is not None else None)


def cmd_displace(args):
    scale, uvscale, edge_len = 1.0, 1.0, 1.0
    image_file = outfile = filename = None
    it = iter(args)
    for a in it:
        if a == "--scale":
            scale = float(next(it))
        elif a == "--uvscale":
            uvscale = float(next(it))
        elif a == "--edge-length":
            edge_len = float(next(it))
        elif a == "--image":
            image_file = next(it)
        elif a == "--outfile":
            outfile = next(it)
        elif filename is None:
            filename = a
        else:
            raise SystemExit(f"plytool displace: unexpected '{a}'")
    if not (filename and image_file and outfile):
        raise SystemExit("plytool displace: need <file>, --image, --outfile")
    m = load_mesh(filename)
    if "N" not in m:
        raise SystemExit("plytool displace: mesh must have normals")
    if "uv" not in m:
        raise SystemExit("plytool displace: mesh must have uv coordinates")
    from ..utils.image import read_image

    img = np.asarray(read_image(image_file), np.float32)
    if img.ndim == 3:
        img = img.mean(-1)
    P, idx, N, uv = _subdivide_to_edge_length(
        m["P"], m["indices"], m["N"], m["uv"], edge_len)
    h, w = img.shape
    # bilinear lookup, v flipped + repeat wrap (plytool.cpp displace)
    fu = (uv[:, 0] * uvscale) % 1.0 * (w - 1)
    fv = (1.0 - (uv[:, 1] * uvscale) % 1.0) * (h - 1)
    x0 = np.clip(fu.astype(int), 0, w - 1)
    y0 = np.clip(fv.astype(int), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx, wy = fu - x0, fv - y0
    d = ((1 - wy) * ((1 - wx) * img[y0, x0] + wx * img[y0, x1])
         + wy * ((1 - wx) * img[y1, x0] + wx * img[y1, x1]))
    P = P + (d * scale)[:, None] * N
    write_ply(outfile, P, idx, N=N, uv=uv)
    print(f"wrote {outfile}: {P.shape[0]} vertices, {idx.shape[0]} faces")
    return 0


def cmd_split(args):
    maxfaces = 1_000_000
    outbase = filename = None
    it = iter(args)
    for a in it:
        if a == "--maxfaces":
            maxfaces = int(next(it))
        elif a == "--outbase":
            outbase = next(it)
        elif filename is None:
            filename = a
        else:
            raise SystemExit(f"plytool split: unexpected '{a}'")
    if filename is None:
        raise SystemExit("plytool split: need a PLY filename")
    if outbase is None:
        outbase = os.path.splitext(filename)[0]
    m = load_mesh(filename)
    P, idx = m["P"], m["indices"]
    if idx.shape[0] <= maxfaces:
        print(f"{filename}: {idx.shape[0]} faces <= {maxfaces}; not split")
        return 0
    n_out = (idx.shape[0] + maxfaces - 1) // maxfaces
    for i in range(n_out):
        sub = idx[i * maxfaces:(i + 1) * maxfaces]
        used, inv = np.unique(sub.reshape(-1), return_inverse=True)
        out = f"{outbase}{i}.ply"
        write_ply(out, P[used], inv.reshape(-1, 3).astype(np.int32),
                  N=m["N"][used] if "N" in m else None,
                  uv=m["uv"][used] if "uv" in m else None)
        print(f"wrote {out}: {used.size} vertices, {sub.shape[0]} faces")
    return 0


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "info":
        return cmd_info(rest)
    if cmd == "cat":
        return cmd_cat(rest)
    if cmd == "displace":
        return cmd_displace(rest)
    if cmd == "split":
        return cmd_split(rest)
    raise SystemExit(f"plytool: unknown command '{cmd}'")


if __name__ == "__main__":
    raise SystemExit(main())
