"""Async scene-asset loading.

The reference parser kicks off asynchronous imports of PLY meshes and
texture images while directive parsing continues (scene.cpp RunAsync
usage in BasicSceneBuilder::Shape/Texture; util/parallel.h:RunAsync).
The TPU-native analog: a prefetch pass scans the directive list for every
file the build will touch and loads them on a thread pool; the builder's
load sites then consume the futures (or fall back to a synchronous load
for files the scan missed). Python threads overlap fine here — the
loaders are I/O- and numpy-bound (zlib/np release the GIL).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

_futures = {}  # (kind, fname) -> Future
_pool = None


def _submit(kind, fname, fn):
    global _pool
    if not fname or (kind, fname) in _futures:
        return
    if _pool is None:
        _pool = ThreadPoolExecutor(max_workers=4,
                                   thread_name_prefix="asset-loader")
    _futures[(kind, fname)] = _pool.submit(fn, fname)


def _load_image(fname):
    from ..utils.image import read_image

    return read_image(fname)


def _load_ply(fname):
    from ..native import load_ply

    return load_ply(fname)


def _load_volume(fname):
    from ..tools.nanovdb2grid import load_volume

    return load_volume(fname)


def prefetch(directives):
    """Scan directives and start background loads for every referenced
    asset file (PLY meshes, image textures, light images, volume grids)."""
    from .parser import ParameterDictionary

    for d in directives:
        try:
            name = d.name
            if name not in ("Shape", "Texture", "LightSource",
                            "MakeNamedMedium"):
                continue
            p = ParameterDictionary(d.params)
            if name == "Shape" and d.args and d.args[0] == "plymesh":
                _submit("ply", p.get_string("filename"), _load_ply)
            elif name == "Texture" and len(d.args) > 2 \
                    and d.args[2] == "imagemap":
                _submit("img", p.get_string("filename"), _load_image)
            elif name == "LightSource" and d.args and d.args[0] in (
                    "goniometric", "projection", "infinite"):
                _submit("img", p.get_string("filename"), _load_image)
            elif name == "MakeNamedMedium":
                gridfile = p.get_string("gridfile",
                                        p.get_string("filename", ""))
                mtype = p.get_string("type", "")
                if gridfile and (gridfile.endswith(".nvdb")
                                 or mtype == "nanovdb"):
                    _submit("vol", gridfile, _load_volume)
                hm = p.get_string("heightmap", "")
                if hm:
                    _submit("img", hm, _load_image)
        except Exception:  # a scan miss only loses the prefetch
            continue


def _get(kind, fname, fn):
    fut = _futures.pop((kind, fname), None)
    if fut is not None:
        return fut.result()
    return fn(fname)


def get_image(fname):
    """read_image via the prefetch cache (raises like read_image)."""
    return _get("img", fname, _load_image)


def get_ply(fname):
    return _get("ply", fname, _load_ply)


def get_volume(fname):
    return _get("vol", fname, _load_volume)
