"""Image IO + error metrics (analog of ``util/image.h`` IO surface).

EXR: minimal pure-Python OpenEXR 2.0 codec — uncompressed scanline FLOAT
(and HALF on read) RGB(A) images, enough for film output, guiding-buffer
caches and reference images (no OpenEXR binding is available in this
environment). PNG via imageio with sRGB encode.
"""

from __future__ import annotations

import struct

import numpy as np

_EXR_MAGIC = 20000630


def write_exr(path, img, channel_names=("R", "G", "B"), half=False):
    """Write (ny, nx, C) as an uncompressed scanline EXR (FLOAT, or HALF
    when half=True — the reference's default film pixel format,
    util/image.h PixelFormat::Half)."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    ny, nx, nc = img.shape
    assert nc == len(channel_names)
    # channels must be stored alphabetically
    order = np.argsort(channel_names)
    names = [channel_names[i] for i in order]
    ptype = 1 if half else 2  # 1=HALF, 2=FLOAT
    psize = 2 if half else 4

    def attr(name, typ, data):
        return (name.encode() + b"\0" + typ.encode() + b"\0"
                + struct.pack("<i", len(data)) + data)

    chlist = b""
    for n in names:
        # name, pixel type, pLinear+reserved, xSampling, ySampling
        chlist += n.encode() + b"\0" + struct.pack("<iBBBBii", ptype, 0, 0,
                                                   0, 0, 1, 1)
    chlist += b"\0"

    header = b""
    header += attr("channels", "chlist", chlist)
    header += attr("compression", "compression", b"\0")  # none
    header += attr("dataWindow", "box2i", struct.pack("<iiii", 0, 0, nx - 1, ny - 1))
    header += attr("displayWindow", "box2i", struct.pack("<iiii", 0, 0, nx - 1, ny - 1))
    header += attr("lineOrder", "lineOrder", b"\0")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", _EXR_MAGIC, 2))
        f.write(header)
        # scanline offset table
        offset0 = 8 + len(header) + 8 * ny
        line_size = 4 + 4 + nx * psize * nc
        for y in range(ny):
            f.write(struct.pack("<Q", offset0 + y * line_size))
        dt = "<f2" if half else "<f4"
        for y in range(ny):
            f.write(struct.pack("<ii", y, nx * psize * nc))
            for ci in order:
                f.write(img[y, :, ci].astype(dt).tobytes())


def read_exr(path):
    """Read an uncompressed scanline EXR (FLOAT or HALF channels).

    Returns (img (ny,nx,C) float32, channel_names sorted)."""
    with open(path, "rb") as f:
        data = f.read()
    magic, version = struct.unpack_from("<ii", data, 0)
    assert magic == _EXR_MAGIC, "not an EXR file"
    pos = 8
    attrs = {}
    while data[pos] != 0:
        e = data.index(b"\0", pos)
        name = data[pos:e].decode()
        pos = e + 1
        e = data.index(b"\0", pos)
        typ = data[pos:e].decode()
        pos = e + 1
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        attrs[name] = (typ, data[pos:pos + size])
        pos += size
    pos += 1  # header terminator

    # channels
    chdata = attrs["channels"][1]
    channels = []
    cpos = 0
    while chdata[cpos] != 0:
        e = chdata.index(b"\0", cpos)
        cname = chdata[cpos:e].decode()
        cpos = e + 1
        ptype = struct.unpack_from("<i", chdata, cpos)[0]
        cpos += 16
        channels.append((cname, ptype))
    comp = attrs["compression"][1][0]
    assert comp == 0, f"only uncompressed EXR supported (compression={comp})"
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    nx, ny = x1 - x0 + 1, y1 - y0 + 1

    pos += 8 * ny  # skip offset table
    nc = len(channels)
    img = np.zeros((ny, nx, nc), np.float32)
    for yi in range(ny):
        y, nbytes = struct.unpack_from("<ii", data, pos)
        pos += 8
        for ci, (cname, ptype) in enumerate(channels):
            if ptype == 2:  # FLOAT
                vals = np.frombuffer(data, "<f4", nx, pos)
                pos += nx * 4
            elif ptype == 1:  # HALF
                vals = np.frombuffer(data, "<f2", nx, pos).astype(np.float32)
                pos += nx * 2
            else:  # UINT
                vals = np.frombuffer(data, "<u4", nx, pos).astype(np.float32)
                pos += nx * 4
            img[y - y0, :, ci] = vals
    return img, [c[0] for c in channels]


def write_png(path, img):
    """Write linear (ny,nx,3) to sRGB PNG."""
    import imageio.v3 as iio

    img = np.asarray(img, np.float32)
    srgb = np.where(img <= 0.0031308, 12.92 * img,
                    1.055 * np.power(np.clip(img, 1e-8, None), 1 / 2.4) - 0.055)
    iio.imwrite(path, (np.clip(srgb, 0, 1) * 255).astype(np.uint8))


def read_image(path):
    """Read EXR or PNG into linear float (ny,nx,3)."""
    if str(path).endswith(".exr"):
        img, names = read_exr(path)
        if img.shape[-1] >= 3:
            # channels stored alphabetically: B,G,R(,A)
            idx = {n: i for i, n in enumerate(names)}
            if all(c in idx for c in "RGB"):
                img = np.stack([img[..., idx["R"]], img[..., idx["G"]],
                                img[..., idx["B"]]], -1)
        return img
    import imageio.v3 as iio

    raw = np.asarray(iio.imread(path), np.float32) / 255.0
    lin = np.where(raw <= 0.04045, raw / 12.92, ((raw + 0.055) / 1.055) ** 2.4)
    return lin[..., :3]


# -- error metrics (imgtool diff analogs) ------------------------------------


def mse(a, b):
    return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))


def mae(a, b):
    return float(np.mean(np.abs(np.asarray(a) - np.asarray(b))))


def mrse(a, b, eps=1e-2):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.mean((a - b) ** 2 / (b * b + eps)))
