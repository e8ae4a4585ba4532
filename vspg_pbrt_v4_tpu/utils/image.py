"""Image IO + error metrics (analog of ``util/image.h`` IO surface).

EXR: minimal pure-Python OpenEXR 2.0 codec — scanline FLOAT/HALF RGB(A)
images, NONE or ZIP compression (the reference writes ZIP by default;
codec scheme per OpenEXR ImfZip: byte reorder + delta predictor + zlib).
No OpenEXR binding is available in this environment. PNG via imageio
with sRGB encode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_EXR_MAGIC = 20000630
_ZIP_BLOCK = 16  # scanlines per ZIP chunk


def _zip_predict(raw):
    """OpenEXR ImfZip compress transform: split even/odd bytes into two
    halves, then delta-encode."""
    arr = np.frombuffer(raw, np.uint8)
    n = arr.size
    half = (n + 1) // 2
    tmp = np.empty(n, np.uint8)
    tmp[:half] = arr[0::2]
    tmp[half:] = arr[1::2]
    d = tmp.astype(np.int16)
    d[1:] = d[1:] - tmp[:-1].astype(np.int16) + 384
    return d.astype(np.uint8).tobytes()


def _zip_unpredict(buf):
    d = np.frombuffer(buf, np.uint8).astype(np.int64)
    d[1:] -= 384
    s = (np.cumsum(d) & 0xFF).astype(np.uint8)
    n = s.size
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = s[:half]
    out[1::2] = s[half:]
    return out.tobytes()


def write_exr(path, img, channel_names=("R", "G", "B"), half=False,
              compression="zip"):
    """Write (ny, nx, C) as a scanline EXR. HALF when half=True (the
    reference's default film pixel format, util/image.h
    PixelFormat::Half); compression "zip" (default, 16-line chunks) or
    "none"."""
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
    use_zip = compression == "zip"

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
    header += attr("compression", "compression",
                   bytes([3 if use_zip else 0]))  # 3=ZIP, 0=NONE
    header += attr("dataWindow", "box2i", struct.pack("<iiii", 0, 0, nx - 1, ny - 1))
    header += attr("displayWindow", "box2i", struct.pack("<iiii", 0, 0, nx - 1, ny - 1))
    header += attr("lineOrder", "lineOrder", b"\0")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"

    dt = "<f2" if half else "<f4"
    lines_per = _ZIP_BLOCK if use_zip else 1
    chunks = []
    for y0c in range(0, ny, lines_per):
        block = b"".join(
            img[y, :, ci].astype(dt).tobytes()
            for y in range(y0c, min(y0c + lines_per, ny)) for ci in order)
        if use_zip:
            comp = zlib.compress(_zip_predict(block))
            if len(comp) >= len(block):
                comp = block  # EXR rule: store raw if zip doesn't shrink
            chunks.append(struct.pack("<ii", y0c, len(comp)) + comp)
        else:
            chunks.append(struct.pack("<ii", y0c, len(block)) + block)

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", _EXR_MAGIC, 2))
        f.write(header)
        off = 8 + len(header) + 8 * len(chunks)
        for ch in chunks:
            f.write(struct.pack("<Q", off))
            off += len(ch)
        for ch in chunks:
            f.write(ch)


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
    assert comp in (0, 2, 3), \
        f"unsupported EXR compression {comp} (NONE/ZIPS/ZIP only)"
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"][1])
    nx, ny = x1 - x0 + 1, y1 - y0 + 1

    lines_per = {0: 1, 2: 1, 3: _ZIP_BLOCK}[comp]
    n_chunks = -(-ny // lines_per)
    pos += 8 * n_chunks  # skip offset table
    nc = len(channels)
    line_bytes = sum(nx * (2 if pt == 1 else 4) for _, pt in channels)
    img = np.zeros((ny, nx, nc), np.float32)
    for _ in range(n_chunks):
        yb, nbytes = struct.unpack_from("<ii", data, pos)
        pos += 8
        n_lines = min(lines_per, ny - (yb - y0))
        raw_size = line_bytes * n_lines
        payload = data[pos:pos + nbytes]
        pos += nbytes
        if comp in (2, 3) and nbytes < raw_size:
            payload = _zip_unpredict(zlib.decompress(payload))
        bpos = 0
        for li in range(n_lines):
            for ci, (cname, ptype) in enumerate(channels):
                if ptype == 2:  # FLOAT
                    vals = np.frombuffer(payload, "<f4", nx, bpos)
                    bpos += nx * 4
                elif ptype == 1:  # HALF
                    vals = np.frombuffer(payload, "<f2", nx,
                                         bpos).astype(np.float32)
                    bpos += nx * 2
                else:  # UINT
                    vals = np.frombuffer(payload, "<u4", nx,
                                         bpos).astype(np.float32)
                    bpos += nx * 4
                img[yb - y0 + li, :, ci] = vals
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
