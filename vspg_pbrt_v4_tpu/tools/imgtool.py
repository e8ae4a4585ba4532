"""imgtool — image swiss-army knife (analog of ``src/pbrt/cmd/imgtool.cpp``).

    python -m vspg_pbrt_v4_tpu.tools.imgtool <command> [args]

Commands (reference: imgtool.cpp:57-229):
  diff       --metric MAE|MSE|MRSE|FLIP  img ref (+ --outfile difference image)
  error      convergence-rate study over a series of images vs a reference
  falsecolor scalar visualization with a viridis-like ramp
  assemble   average multiple EXRs (independent-run merging, splitn inverse)
  convert    EXR <-> PNG (+ --scale)
  info       print image stats
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..utils.image import mae, mrse, mse, read_image, write_exr, write_png


def _falsecolor_map(x):
    """Small viridis-like ramp, x in [0,1] -> rgb."""
    x = np.clip(x, 0, 1)[..., None]
    stops = np.asarray([
        [0.267, 0.005, 0.329], [0.283, 0.141, 0.458], [0.254, 0.265, 0.530],
        [0.207, 0.372, 0.553], [0.164, 0.471, 0.558], [0.128, 0.567, 0.551],
        [0.135, 0.659, 0.518], [0.267, 0.749, 0.441], [0.478, 0.821, 0.318],
        [0.741, 0.873, 0.150], [0.993, 0.906, 0.144]])
    t = x * (len(stops) - 1)
    i0 = np.clip(t.astype(int), 0, len(stops) - 2)
    f = t - i0
    return stops[i0[..., 0]] * (1 - f) + stops[i0[..., 0] + 1] * f


def main(argv=None):
    ap = argparse.ArgumentParser(prog="imgtool")
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("diff")
    d.add_argument("image")
    d.add_argument("reference")
    d.add_argument("--metric", default="MSE",
                   choices=["MSE", "MAE", "MRSE", "FLIP"])
    d.add_argument("--outfile", default=None)

    e = sub.add_parser("error")
    e.add_argument("images", nargs="+")
    e.add_argument("--reference", required=True)
    e.add_argument("--metric", default="MSE",
                   choices=["MSE", "MAE", "MRSE", "FLIP"])

    f = sub.add_parser("falsecolor")
    f.add_argument("image")
    f.add_argument("--outfile", required=True)
    f.add_argument("--maxvalue", type=float, default=None)
    f.add_argument("--log", action="store_true")

    a = sub.add_parser("assemble")
    a.add_argument("images", nargs="+")
    a.add_argument("--outfile", required=True)

    c = sub.add_parser("convert")
    c.add_argument("image")
    c.add_argument("--outfile", required=True)
    c.add_argument("--scale", type=float, default=1.0)

    i = sub.add_parser("info")
    i.add_argument("images", nargs="+")

    me = sub.add_parser("makeequiarea")
    me.add_argument("image")
    me.add_argument("--outfile", required=True)
    me.add_argument("--resolution", type=int, default=None)

    av = sub.add_parser("average")  # cmd/imgtool.cpp:66 average
    av.add_argument("images", nargs="+")
    av.add_argument("--outfile", required=True)

    bl = sub.add_parser("bloom")  # cmd/imgtool.cpp:78 bloom
    bl.add_argument("image")
    bl.add_argument("--outfile", required=True)
    bl.add_argument("--level", type=float, default=1.0,
                    help="luminance threshold feeding the bloom")
    bl.add_argument("--width", type=int, default=15)
    bl.add_argument("--scale", type=float, default=0.3)
    bl.add_argument("--iterations", type=int, default=5)

    sp = sub.add_parser("splitn")  # cmd/imgtool.cpp:222 splitn
    sp.add_argument("image")
    sp.add_argument("--n", type=int, default=2, help="vertical strips")
    sp.add_argument("--outfile", required=True,
                    help="pattern with %%d for the strip index")

    ct = sub.add_parser("cat")  # cmd/imgtool.cpp:95 cat
    ct.add_argument("image")
    ct.add_argument("--csv", action="store_true")

    dn = sub.add_parser("denoise")  # cmd/imgtool.cpp:145 denoise-optix
    dn.add_argument("image")
    dn.add_argument("--outfile", required=True)
    dn.add_argument("--albedo", default=None)
    dn.add_argument("--normal", default=None)
    dn.add_argument("--steps", type=int, default=4)

    mk = sub.add_parser("makesky")  # cmd/imgtool.cpp:170 makesky
    mk.add_argument("--outfile", required=True)
    mk.add_argument("--albedo", type=float, default=0.5,
                    help="ground albedo")
    mk.add_argument("--elevation", type=float, default=10.0,
                    help="sun elevation in degrees")
    mk.add_argument("--turbidity", type=float, default=3.0)
    mk.add_argument("--resolution", type=int, default=512)
    mk.add_argument("--model", choices=("hosek", "preetham"),
                    default="hosek",
                    help="hosek = the reference's ArHosek sky "
                         "(imgtool.cpp:326)")

    mem = sub.add_parser("makeemitters")  # cmd/imgtool.cpp:184 makeemitters
    mem.add_argument("image")
    mem.add_argument("--outfile", required=True)
    mem.add_argument("--downsample", type=int, default=1)

    sn = sub.add_parser("scalenormalmap")  # cmd/imgtool.cpp:205
    sn.add_argument("image")
    sn.add_argument("--outfile", required=True)
    sn.add_argument("--scale", type=float, default=1.0)

    args = ap.parse_args(argv)
    from ..utils.flip import mean_flip

    metrics = {"MSE": mse, "MAE": mae, "MRSE": mrse,
               "FLIP": lambda a, b: mean_flip(b, a)}

    if args.cmd == "diff":
        img = read_image(args.image)
        ref = read_image(args.reference)
        v = metrics[args.metric](img, ref)
        print(f"{args.metric} = {v:.6g}")
        if args.outfile:
            write_exr(args.outfile, np.abs(img - ref))
        return 0

    if args.cmd == "error":
        ref = read_image(args.reference)
        print(f"# image,{args.metric}")
        vals = []
        for path in args.images:
            v = metrics[args.metric](read_image(path), ref)
            vals.append(v)
            print(f"{path},{v:.6g}")
        if len(vals) >= 2:
            # convergence exponent from first/last (imgtool error's rate fit)
            import math

            rate = math.log(vals[-1] / vals[0]) / math.log(len(vals))
            print(f"# empirical convergence rate: O(n^{rate:.2f})")
        return 0

    if args.cmd == "falsecolor":
        img = read_image(args.image)
        s = img.mean(-1)
        if args.log:
            s = np.log10(np.maximum(s, 1e-8))
            s = (s - s.min()) / max(s.max() - s.min(), 1e-8)
        else:
            mx = args.maxvalue or s.max()
            s = s / max(mx, 1e-8)
        out = _falsecolor_map(s)
        if args.outfile.endswith(".png"):
            write_png(args.outfile, out)
        else:
            write_exr(args.outfile, out.astype(np.float32))
        return 0

    if args.cmd == "assemble":
        imgs = [read_image(p) for p in args.images]
        write_exr(args.outfile, np.mean(imgs, axis=0).astype(np.float32))
        print(f"assembled {len(imgs)} images -> {args.outfile}")
        return 0

    if args.cmd == "convert":
        from ..utils.image import write_image

        img = read_image(args.image) * args.scale
        write_image(args.outfile, img)
        return 0

    if args.cmd == "makeequiarea":
        from ..utils.envmap import latlong_to_equal_area

        out = latlong_to_equal_area(read_image(args.image), args.resolution)
        write_exr(args.outfile, out)
        print(f"wrote equal-area {out.shape[0]}x{out.shape[1]} -> {args.outfile}")
        return 0

    if args.cmd == "average":
        imgs = [read_image(pth) for pth in args.images]
        write_exr(args.outfile, np.mean(imgs, axis=0).astype(np.float32))
        print(f"averaged {len(imgs)} -> {args.outfile}")
        return 0

    if args.cmd == "bloom":
        img = read_image(args.image)
        bright = np.where(img.mean(-1, keepdims=True) > args.level, img, 0.0)
        blur = bright
        k = max(int(args.width) | 1, 3)
        for _ in range(max(args.iterations, 1)):
            # separable box blur (iterated ~ gaussian)
            csum = np.cumsum(np.pad(blur, ((k // 2 + 1, k // 2), (0, 0), (0, 0))), 0)
            blur = (csum[k:] - csum[:-k]) / k
            csum = np.cumsum(np.pad(blur, ((0, 0), (k // 2 + 1, k // 2), (0, 0))), 1)
            blur = (csum[:, k:] - csum[:, :-k]) / k
        out = img + args.scale * blur
        write_exr(args.outfile, out.astype(np.float32))
        print(f"bloom -> {args.outfile}")
        return 0

    if args.cmd == "splitn":
        img = read_image(args.image)
        w = img.shape[1]
        for i in range(args.n):
            x0 = i * w // args.n
            x1 = (i + 1) * w // args.n
            path = args.outfile % i if "%" in args.outfile else                 f"{args.outfile}.{i}.exr"
            write_exr(path, img[:, x0:x1].astype(np.float32))
            print(f"strip {i}: {path}")
        return 0

    if args.cmd == "info":
        for p in args.images:
            img = read_image(p)
            print(f"{p}: {img.shape[1]}x{img.shape[0]} min {img.min():.4g} "
                  f"max {img.max():.4g} mean {img.mean():.4g}")
        return 0

    if args.cmd == "cat":
        img = read_image(args.image)
        sep = "," if args.csv else " "
        for y in range(img.shape[0]):
            row = []
            for x in range(img.shape[1]):
                row.append(sep.join(f"{v:.6g}" for v in img[y, x]))
            print((sep if args.csv else "  ").join(row))
        return 0

    if args.cmd == "denoise":
        # role of imgtool denoise-optix (imgtool.cpp:145): here the ISGB's
        # edge-aware a-trous filter with optional albedo/normal guides
        import jax.numpy as jnp

        from ..models.guiding.isgb import _atrous

        img = read_image(args.image).astype(np.float32)
        flat = np.zeros_like(img)
        alb = (read_image(args.albedo).astype(np.float32)
               if args.albedo else flat)
        nrm = (read_image(args.normal).astype(np.float32)
               if args.normal else flat)
        out = np.asarray(_atrous(jnp.asarray(img), jnp.asarray(alb),
                                 jnp.asarray(nrm), steps=args.steps))
        write_exr(args.outfile, out)
        print(f"denoised -> {args.outfile}")
        return 0

    if args.cmd == "makesky":
        from ..utils.sky import make_sky_equal_area

        out = make_sky_equal_area(args.resolution, args.elevation,
                                  args.turbidity, args.albedo,
                                  model=args.model)
        write_exr(args.outfile, out.astype(np.float32))
        print(f"sky ({args.model}) {args.resolution}^2 elevation "
              f"{args.elevation} turbidity {args.turbidity} "
              f"-> {args.outfile}")
        return 0

    if args.cmd == "makeemitters":
        # quad area emitters per (down-sampled) pixel (imgtool.cpp:184)
        img = read_image(args.image)
        ds = max(args.downsample, 1)
        h, w = img.shape[:2]
        hh, ww = h // ds, w // ds
        img = img[:hh * ds, :ww * ds].reshape(hh, ds, ww, ds, 3).mean((1, 3))
        with open(args.outfile, "w") as f:
            f.write("AttributeBegin\n")
            for y in range(hh):
                for x in range(ww):
                    r, g, b = (float(v) for v in img[y, x])
                    if max(r, g, b) <= 0:
                        continue
                    x0, x1 = x / ww, (x + 1) / ww
                    y0, y1 = y / hh, (y + 1) / hh
                    f.write(
                        f'AreaLightSource "diffuse" "rgb L" '
                        f"[ {r:.6g} {g:.6g} {b:.6g} ]\n"
                        f'Shape "trianglemesh" "integer indices" '
                        f"[ 0 1 2 0 2 3 ] \"point3 P\" "
                        f"[ {x0} {y0} 0 {x1} {y0} 0 {x1} {y1} 0 "
                        f"{x0} {y1} 0 ]\n")
            f.write("AttributeEnd\n")
        print(f"emitters ({hh}x{ww} quads) -> {args.outfile}")
        return 0

    if args.cmd == "scalenormalmap":
        # rescale tangent-space normals encoded in [0,1] (imgtool.cpp:205)
        img = read_image(args.image)
        n = img * 2.0 - 1.0
        n[..., :2] *= args.scale
        ln = np.sqrt(np.maximum((n * n).sum(-1, keepdims=True), 1e-12))
        n = n / ln
        out = (n + 1.0) * 0.5
        if args.outfile.endswith(".png"):
            write_png(args.outfile, out)
        else:
            write_exr(args.outfile, out.astype(np.float32))
        print(f"scaled normal map -> {args.outfile}")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
