"""imgtool / stats / display-packet tests."""

import numpy as np
import pytest

from vspg_pbrt_v4_tpu.tools import imgtool
from vspg_pbrt_v4_tpu.utils import stats
from vspg_pbrt_v4_tpu.utils.image import read_exr, read_image, write_exr


@pytest.fixture
def imgs(tmp_path):
    r = np.random.default_rng(0)
    a = r.uniform(0, 2, (16, 16, 3)).astype(np.float32)
    b = a + r.normal(0, 0.1, a.shape).astype(np.float32)
    pa, pb = str(tmp_path / "a.exr"), str(tmp_path / "b.exr")
    write_exr(pa, a)
    write_exr(pb, b)
    return pa, pb, a, b


def test_imgtool_diff(imgs, capsys, tmp_path):
    pa, pb, a, b = imgs
    assert imgtool.main(["diff", pb, pa, "--metric", "MSE",
                         "--outfile", str(tmp_path / "d.exr")]) == 0
    out = capsys.readouterr().out
    v = float(out.split("=")[1])
    assert abs(v - np.mean((a - b) ** 2)) < 1e-6
    d = read_image(str(tmp_path / "d.exr"))
    assert np.allclose(d, np.abs(a - b), atol=1e-6)


def test_imgtool_assemble_and_convert(imgs, tmp_path):
    pa, pb, a, b = imgs
    out = str(tmp_path / "avg.exr")
    assert imgtool.main(["assemble", pa, pb, "--outfile", out]) == 0
    avg = read_image(out)
    assert np.allclose(avg, 0.5 * (a + b), atol=1e-6)
    png = str(tmp_path / "x.png")
    assert imgtool.main(["convert", pa, "--outfile", png]) == 0
    back = read_image(png)
    assert back.shape == a.shape


def test_imgtool_falsecolor(imgs, tmp_path):
    pa, *_ = imgs
    out = str(tmp_path / "fc.exr")
    assert imgtool.main(["falsecolor", pa, "--outfile", out]) == 0
    fc = read_image(out)
    assert fc.min() >= 0 and fc.max() <= 1.01


def test_stats_registry():
    stats.clear()
    stats.counter_add("rays traced", 100)
    stats.counter_add("rays traced", 23)
    with stats.Timer("render time"):
        pass
    stats.distribution_add("path length", 3)
    stats.distribution_add("path length", 7)
    rep = stats.report()
    assert "rays traced" in rep and "123" in rep
    assert "render time" in rep
    assert "path length" in rep and "avg" in rep
    stats.clear()


def test_tev_packets_offline():
    """Client degrades to no-op without a server; packet building exercised."""
    from vspg_pbrt_v4_tpu.utils.display import TevClient

    c = TevClient("127.0.0.1", 59999)  # nothing listening
    assert not c.connected
    c.create_image("x", 8, 8)
    c.update_image("x", np.zeros((8, 8, 3), np.float32))
    c.close()


def test_filters_normalized():
    """Each filter's sampled offsets integrate any smooth function like the
    filter-weighted average; expected weight ~ 1 (mitchell slightly < 1 from
    negative lobes)."""
    import jax.numpy as jnp

    from vspg_pbrt_v4_tpu.models.filters import Filter
    from vspg_pbrt_v4_tpu.utils import rng

    n = 1 << 15
    pid = jnp.arange(n, dtype=jnp.uint32)
    u2 = rng.uniform2(jnp.uint32(1), pid, jnp.uint32(0), jnp.uint32(0))
    for kind in ("box", "triangle", "gaussian", "mitchell"):
        f = Filter.make(kind)
        off, w = f.sample(u2)
        off, w = np.asarray(off), np.asarray(w)
        assert np.isfinite(off).all()
        assert (np.abs(off) <= f.radius + 1e-5).all(), kind
        # mean offset ~ 0 (symmetric filters)
        assert np.abs(off.mean(0)).max() < 0.02, (kind, off.mean(0))
        # weights: +-1 and mostly +1
        assert set(np.unique(np.sign(w))).issubset({-1.0, 1.0})
        assert w.mean() > 0.7, (kind, w.mean())


@pytest.mark.slow
def test_gaussian_filter_render_unbiased():
    """Furnace through a gaussian filter still averages to L0."""
    import jax.numpy as jnp

    from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
    from vspg_pbrt_v4_tpu.models.film import RGBFilm
    from vspg_pbrt_v4_tpu.models.filters import Filter
    from vspg_pbrt_v4_tpu.models.integrators import volpath
    from vspg_pbrt_v4_tpu.utils import transform as tr

    scene = volpath.make_fog_box_scene([0, 0, 0], [1.0] * 3, g=0.3,
                                       env_L=[0.5] * 3)
    cam = PerspectiveCamera.make(tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)),
                                 30.0, (16, 16))
    film = RGBFilm.make((16, 16), filter=Filter.make("gaussian"))
    img = np.asarray(volpath.render(scene, cam, film, spp=64, seed=2,
                                    spp_per_pass=8))
    assert abs(img.mean() - 0.5) < 0.01, img.mean()


def test_pspec_low_discrepancy_suppresses_low_freq():
    """Sobol's power spectrum has lower low-frequency energy than
    independent sampling (the pspec tool's core claim)."""
    from vspg_pbrt_v4_tpu.tools.pspec import power_spectrum

    res = 64
    ind = power_spectrum("independent", spp=128, res=res, n_sets=24)
    sob = power_spectrum("paddedsobol", spp=128, res=res, n_sets=24)
    c = res // 2
    yy, xx = np.mgrid[0:res, 0:res]
    rr = np.sqrt((yy - c) ** 2 + (xx - c) ** 2)
    low = (rr > 0) & (rr < 6)
    assert sob[low].mean() < 0.5 * ind[low].mean(), (
        sob[low].mean(), ind[low].mean())


def test_guiding_gbuffer_cells():
    import jax.numpy as jnp

    from vspg_pbrt_v4_tpu.models.cameras import PerspectiveCamera
    from vspg_pbrt_v4_tpu.models.film import RGBFilm
    from vspg_pbrt_v4_tpu.models.guiding.field import GuidingField
    from vspg_pbrt_v4_tpu.models.integrators import extras, volpath
    from vspg_pbrt_v4_tpu.models.lights import Lights
    from vspg_pbrt_v4_tpu.models.materials import DIFFUSE, Materials
    from vspg_pbrt_v4_tpu.models.media import Media
    from vspg_pbrt_v4_tpu.models.shapes import Geometry
    from vspg_pbrt_v4_tpu.utils import transform as tr

    geom = Geometry.build(spheres=[dict(c=(0, 0, 0), r=1.0, mat=0, light=-1,
                                        med_in=-1, med_out=-1)])
    scene = volpath.Scene(geom, Materials.build([dict(type=DIFFUSE)]),
                          Media.make(), Lights.make(env_L=[1.0] * 3,
                                                    world_radius=10.0))
    field = GuidingField.make((-1, -1, -1), (1, 1, 1), res=4)
    cam = PerspectiveCamera.make(
        tr.look_at((0, 0, -4), (0, 0, 0), (0, 1, 0)), 30.0, (32, 32))
    rgb, cid = [np.asarray(x) for x in extras.render_guiding_gbuffer(
        scene, cam, RGBFilm.make((32, 32)), field)]
    # sphere hits produce several distinct cells; sky is black
    hit_cells = np.unique(cid[rgb.sum(-1) > 0])
    assert len(hit_cells) >= 3
    assert (rgb[0, 0] == 0).all()


def test_exr_half_roundtrip(tmp_path):
    """HALF-format EXR write (the reference film's default pixel format,
    util/image.h PixelFormat::Half) reads back within half precision."""
    import numpy as np

    from vspg_pbrt_v4_tpu.utils.image import read_exr, write_exr

    img = np.random.default_rng(1).random((7, 9, 3)).astype(np.float32) * 4
    p = str(tmp_path / "h.exr")
    write_exr(p, img, half=True)
    arr, names = read_exr(p)
    order = [names.index(c) for c in ("R", "G", "B")]
    err = np.abs(arr[..., order] - img).max() / img.max()
    assert err < 2e-3, err


def test_spectral_film_accumulation():
    """Spectral film path: flat-reflectance spectral samples under uniform
    wavelength sampling land near the grey RGB they represent."""
    import jax.numpy as jnp
    import numpy as np

    from vspg_pbrt_v4_tpu.models.film import RGBFilm
    from vspg_pbrt_v4_tpu.utils import spectrum as sp

    film = RGBFilm.make((2, 2))
    state = film.init_state()
    rng = np.random.default_rng(3)
    R = 4000
    pix = jnp.asarray(rng.integers(0, 4, R).astype(np.int32))
    lam, pdf = sp.sample_wavelengths_uniform(
        jnp.asarray(rng.random(R, np.float32)))
    vals = 0.6 * jnp.ones_like(lam)  # flat spectrum with luminance-ish 0.6
    state = film.add_spectral_samples(state, pix, vals, lam, pdf,
                                      jnp.ones(R))
    img = np.asarray(film.image(state))
    assert np.isfinite(img).all()
    # flat spectrum -> near-grey RGB around 0.6 (equal-energy white point
    # vs sRGB D65 gives a small tint)
    assert np.abs(img - 0.6).max() < 0.15, img.reshape(-1, 3)[0]
    assert np.abs(img.mean(-1) - 0.6).max() < 0.03


def test_imgtool_average_bloom_splitn(tmp_path):
    from vspg_pbrt_v4_tpu.tools.imgtool import main as imgtool_main
    from vspg_pbrt_v4_tpu.utils.image import read_image, write_exr

    a = np.full((16, 16, 3), 1.0, np.float32)
    b = np.full((16, 16, 3), 3.0, np.float32)
    write_exr(str(tmp_path / "a.exr"), a)
    write_exr(str(tmp_path / "b.exr"), b)
    out = str(tmp_path / "avg.exr")
    assert imgtool_main(["average", str(tmp_path / "a.exr"),
                         str(tmp_path / "b.exr"), "--outfile", out]) == 0
    assert np.allclose(read_image(out), 2.0)

    # bloom: bright spot spreads energy
    img = np.zeros((32, 32, 3), np.float32)
    img[16, 16] = 50.0
    write_exr(str(tmp_path / "spot.exr"), img)
    outb = str(tmp_path / "bloom.exr")
    assert imgtool_main(["bloom", str(tmp_path / "spot.exr"), "--outfile",
                         outb, "--level", "1.0"]) == 0
    bl = read_image(outb)
    assert bl[18, 18].mean() > 0  # energy spread beyond the spot
    assert bl[16, 16].mean() >= 50.0

    outs = str(tmp_path / "strip%d.exr")
    assert imgtool_main(["splitn", str(tmp_path / "spot.exr"),
                         "--n", "2", "--outfile", outs]) == 0
    s0 = read_image(str(tmp_path / "strip0.exr"))
    assert s0.shape == (32, 16, 3)


def test_imgtool_new_subcommands(tmp_path, capsys):
    """cat / denoise / makesky / makeemitters / scalenormalmap
    (cmd/imgtool.cpp:57-229 long tail)."""
    from vspg_pbrt_v4_tpu.tools.imgtool import main as imgtool_main
    from vspg_pbrt_v4_tpu.utils.image import read_image, write_exr

    rng = np.random.default_rng(0)
    img = rng.random((16, 16, 3)).astype(np.float32)
    src = str(tmp_path / "in.exr")
    write_exr(src, img)

    # cat prints every pixel
    assert imgtool_main(["cat", src]) == 0
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) == 16

    # denoise smooths noise but keeps the mean
    outd = str(tmp_path / "dn.exr")
    assert imgtool_main(["denoise", src, "--outfile", outd]) == 0
    dn = read_image(outd)
    assert abs(dn.mean() - img.mean()) < 0.05
    assert dn.std() < img.std()

    # makesky: positive finite radiance, brighter above the horizon
    outs = str(tmp_path / "sky.exr")
    assert imgtool_main(["makesky", "--outfile", outs, "--resolution", "64",
                         "--elevation", "30"]) == 0
    sky = read_image(outs)
    assert np.isfinite(sky).all() and sky.min() >= 0
    assert sky.max() > 1.0

    # makeemitters: one quad light per downsampled pixel
    oute = str(tmp_path / "em.pbrt")
    assert imgtool_main(["makeemitters", src, "--outfile", oute,
                         "--downsample", "8"]) == 0
    txt = open(oute).read()
    assert txt.count("AreaLightSource") == 4
    # and it parses through the scene pipeline
    from vspg_pbrt_v4_tpu.scene import parse_pbrt_string

    parse_pbrt_string("Camera \"perspective\"\nWorldBegin\n" + txt)

    # scalenormalmap: flattening scale pulls normals toward +z
    nm = rng.random((8, 8, 3)).astype(np.float32)
    nm[..., 2] = 1.0
    nmf = str(tmp_path / "nm.exr")
    write_exr(nmf, (nm / np.linalg.norm(nm * 2 - 1, axis=-1,
                                        keepdims=True) + 1) / 2)
    outn = str(tmp_path / "nm2.exr")
    assert imgtool_main(["scalenormalmap", nmf, "--outfile", outn,
                         "--scale", "0.3"]) == 0
    n2 = read_image(outn) * 2 - 1
    ln = np.linalg.norm(n2, axis=-1)
    assert np.allclose(ln, 1.0, atol=1e-3)
