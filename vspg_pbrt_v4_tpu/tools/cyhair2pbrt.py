"""CyHair (.hair) -> pbrt curve shapes converter (cmd/cyhair2pbrt.cpp).

Reads the binary CyHair format (128-byte header; optional u16 segment
counts, f32 xyz points, per-point thickness/transparency/color arrays
gated by header flags) and emits `Shape "curve" "string type"
["cylinder"]` directives with cubic Bezier control points, one per
strand segment — the same output grammar the reference converter
produces, consumable by scene/parser.py.

Strand polylines are treated as Catmull-Rom splines and each segment is
converted to a cubic Bezier with the standard CR->Bezier basis change
(one-sided stencils at the strand ends). Differences from the reference
tool, on purpose: every segment of every strand is emitted (the
reference's loop drops each strand's two boundary segments), and
per-point thickness drives width0/width1 when present (the reference
leaves that as a TODO and uses a constant).

Usage: python -m vspg_pbrt_v4_tpu.tools.cyhair2pbrt in.hair out.pbrt
           [--max-strands N] [--thickness T]
"""

from __future__ import annotations

import argparse
import struct
import sys

import numpy as np

HAS_SEGMENTS, HAS_POINTS, HAS_THICKNESS = 0x1, 0x2, 0x4
HAS_TRANSPARENCY, HAS_COLOR = 0x8, 0x10

# Catmull-Rom segment (c[i-1], c[i], c[i+1], c[i+2]) -> cubic Bezier.
# Interior stencil plus one-sided variants for the first/last segment
# (missing neighbor replaced by a mirrored finite difference).
_CR2B_MID = np.array([[0, 1, 0, 0],
                      [-1 / 6, 1, 1 / 6, 0],
                      [0, 1 / 6, 1, -1 / 6],
                      [0, 0, 1, 0]], np.float64)
_CR2B_FIRST = np.array([[0, 1, 0, 0],
                        [0, 1 / 2, 2 / 3, -1 / 6],
                        [0, 1 / 6, 1, -1 / 6],
                        [0, 0, 1, 0]], np.float64)
_CR2B_LAST = np.array([[0, 1, 0, 0],
                       [-1 / 6, 1, 1 / 6, 0],
                       [-1 / 6, 2 / 3, 1 / 2, 0],
                       [0, 0, 1, 0]], np.float64)


def read_cyhair(path):
    """Parse a .hair file. Returns dict with 'points' (list of (m,3)
    float arrays, one per strand, already swapped Z-up -> Y-up) and
    'thickness' (matching list of (m,) arrays or None)."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != b"HAIR":
        raise ValueError(f"{path}: not a CyHair file (bad magic)")
    (n_strands, n_points, flags, d_segments) = struct.unpack_from(
        "<IIII", raw, 4)
    (d_thickness, _d_transparency) = struct.unpack_from("<ff", raw, 20)
    off = 128
    if flags & HAS_SEGMENTS:
        segs = np.frombuffer(raw, "<u2", n_strands, off).astype(np.int64)
        off += 2 * n_strands
    else:
        if d_segments < 1:
            raise ValueError(f"{path}: no segment information")
        segs = np.full(n_strands, d_segments, np.int64)
    if not flags & HAS_POINTS:
        raise ValueError(f"{path}: no point data")
    pts = np.frombuffer(raw, "<f4", 3 * n_points, off).reshape(-1, 3)
    off += 12 * n_points
    thick = None
    if flags & HAS_THICKNESS:
        thick = np.frombuffer(raw, "<f4", n_points, off)
        off += 4 * n_points
    # strand i owns segs[i]+1 consecutive points
    counts = segs + 1
    ends = np.cumsum(counts)
    if ends[-1] > n_points:
        raise ValueError(f"{path}: segment table addresses {ends[-1]} "
                         f"points but the file has {n_points}")
    starts = ends - counts
    # Z-up -> Y-up (reference converter swaps y/z)
    pts = pts[:, [0, 2, 1]].astype(np.float64)
    out_p, out_t = [], []
    for s, e in zip(starts, ends):
        out_p.append(pts[s:e])
        out_t.append(None if thick is None else thick[s:e])
    return {"points": out_p, "thickness": out_t,
            "default_thickness": float(d_thickness)}


def strand_to_beziers(cps):
    """(m,3) Catmull-Rom points -> (m-1, 4, 3) cubic Bezier segments.
    Bezier endpoints interpolate the CR points exactly."""
    m = cps.shape[0]
    if m < 2:
        return np.zeros((0, 4, 3))
    if m == 2:
        a, b = cps[0], cps[1]
        return np.stack([a, (2 * a + b) / 3, (a + 2 * b) / 3, b])[None]
    out = np.empty((m - 1, 4, 3))
    for i in range(m - 1):
        if i == 0:
            P = np.stack([np.zeros(3), cps[0], cps[1], cps[2]])
            out[i] = _CR2B_FIRST @ P
        elif i == m - 2:
            P = np.stack([cps[m - 3], cps[m - 2], cps[m - 1], np.zeros(3)])
            out[i] = _CR2B_LAST @ P
        else:
            P = np.stack([cps[i - 1], cps[i], cps[i + 1], cps[i + 2]])
            out[i] = _CR2B_MID @ P
    return out


def convert(in_path, out_file, max_strands=-1, thickness=-1.0):
    """Write pbrt curve directives; returns the number of curves."""
    hair = read_cyhair(in_path)
    strands = hair["points"]
    if max_strands > 0:
        strands = strands[:max_strands]
    n_curves = 0
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    chunks = []
    for si, cps in enumerate(strands):
        bez = strand_to_beziers(cps)
        if not len(bez):
            continue
        th = hair["thickness"][si]
        for i, q in enumerate(bez):
            if thickness > 0:
                w0 = w1 = thickness
            elif th is not None:
                w0, w1 = float(th[i]), float(th[min(i + 1, len(th) - 1)])
            else:
                w0 = w1 = hair["default_thickness"]
            lo = np.minimum(lo, q.min(0) - max(w0, w1))
            hi = np.maximum(hi, q.max(0) + max(w0, w1))
            p12 = " ".join(f"{v:.6g}" for v in q.reshape(-1))
            chunks.append(
                f'Shape "curve" "string type" [ "cylinder" ] '
                f'"point3 P" [ {p12} ] '
                f'"float width0" [ {w0:.6g} ] "float width1" [ {w1:.6g} ]\n')
            n_curves += 1
    out_file.write(f"# Converted from \"{in_path}\" by cyhair2pbrt\n"
                   f"# {n_curves} curves\n"
                   f"# Scene bounds: ({lo[0]:.6g}, {lo[1]:.6g}, {lo[2]:.6g})"
                   f" - ({hi[0]:.6g}, {hi[1]:.6g}, {hi[2]:.6g})\n\n")
    out_file.writelines(chunks)
    return n_curves


def main(argv=None):
    ap = argparse.ArgumentParser(prog="cyhair2pbrt")
    ap.add_argument("input", help=".hair file")
    ap.add_argument("output", help="output .pbrt ('-' for stdout)")
    ap.add_argument("--max-strands", type=int, default=-1)
    ap.add_argument("--thickness", type=float, default=-1.0,
                    help="override all widths (reference tool's 4th arg)")
    args = ap.parse_args(argv)
    out = sys.stdout if args.output == "-" else open(args.output, "w")
    n = convert(args.input, out, args.max_strands, args.thickness)
    if out is not sys.stdout:
        out.close()
    print(f"Converted {n} curves.", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
