"""Parser / builder / CLI / image-IO tests (parser_test.cpp analog + e2e)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from vspg_pbrt_v4_tpu.scene import build_render_setup, parse_pbrt_string
from vspg_pbrt_v4_tpu.scene.parser import parse_pbrt_file
from vspg_pbrt_v4_tpu.utils.image import read_exr, read_image, write_exr

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tokenizer_basics():
    ds = parse_pbrt_string('''
# comment
Integrator "volpath" "integer maxdepth" [ 7 ]
LookAt 0 1 2  3 4 5  0 1 0
WorldBegin
Material "diffuse" "rgb reflectance" [.1 .2 .3]
Shape "sphere" "float radius" 2.5
''')
    names = [d.name for d in ds]
    assert names == ["Integrator", "LookAt", "WorldBegin", "Material", "Shape"]
    assert ds[0].args == ["volpath"]
    assert ds[0].params["maxdepth"] == ("integer", [7])
    assert ds[1].args == [0, 1, 2, 3, 4, 5, 0, 1, 0]
    assert ds[3].params["reflectance"][1] == [0.1, 0.2, 0.3]
    assert ds[4].params["radius"][1] == [2.5]


def test_build_fogbox_scene():
    ds = parse_pbrt_file(os.path.join(REPO, "scenes/fogbox.pbrt"))
    setup = build_render_setup(ds)
    assert setup.integrator == "volpath"
    assert setup.spp == 16
    assert setup.scene.geometry.n_tri == 12
    assert setup.scene.lights.n_point == 1
    assert setup.scene.lights.has_env
    assert setup.scene.media.n_homog == 1
    # cube triangles carry the fog interface with no material
    assert int(setup.scene.geometry.tri_mat[0]) == -1
    assert int(setup.scene.geometry.tri_med_in[0]) == 0


def test_build_cornell_scene():
    ds = parse_pbrt_file(os.path.join(REPO, "scenes/cornell.pbrt"))
    setup = build_render_setup(ds)
    g = setup.scene.geometry
    assert g.n_tri == 12  # 5 quads * 2 + light quad * 2
    assert g.n_sph == 2
    assert setup.scene.lights.n_area == 2
    # sphere centers transformed by Translate
    c = np.asarray(g.sph_c)
    assert np.allclose(c[0], [-0.45, 0.4, -0.4], atol=1e-5)


@pytest.mark.slow
def test_render_fogbox_scene_through_api():
    """Parse + render end-to-end; fog glow is positive and finite."""
    from vspg_pbrt_v4_tpu.models.integrators import volpath

    ds = parse_pbrt_file(os.path.join(REPO, "scenes/fogbox.pbrt"))
    setup = build_render_setup(ds, spp_override=8, res_override=(32, 32))
    img = np.asarray(volpath.render(setup.scene, setup.camera, setup.film,
                                    spp=8, seed=1, spp_per_pass=4))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05


@pytest.mark.slow
def test_render_cornell_scene_through_api():
    from vspg_pbrt_v4_tpu.models.integrators import volpath

    ds = parse_pbrt_file(os.path.join(REPO, "scenes/cornell.pbrt"))
    setup = build_render_setup(ds, spp_override=16, res_override=(32, 32))
    img = np.asarray(volpath.render(
        setup.scene, setup.camera, setup.film, spp=16, seed=2,
        cfg=volpath.VolPathConfig(max_depth=8), spp_per_pass=8))
    assert np.isfinite(img).all()
    # pbrt LookAt: screen-right = world -x here, so the red wall (x=-1)
    # is on the image's right and the green wall (x=+1) on the left
    left = img[8:24, 2:10].mean((0, 1))
    right = img[8:24, 22:30].mean((0, 1))
    assert right[0] > right[1], right
    assert left[1] > left[0], left


def test_exr_roundtrip(tmp_path):
    img = np.random.default_rng(1).uniform(0, 4, (17, 23, 3)).astype(np.float32)
    path = str(tmp_path / "t.exr")
    write_exr(path, img)
    back, names = read_exr(path)
    assert sorted(names) == ["B", "G", "R"]
    rgb = read_image(path)
    assert np.allclose(rgb, img, atol=1e-6)


def test_cli_pixelmaterial_probe(tmp_path, capsys):
    """--pixelmaterial x,y prints the center-ray intersection chain:
    material family + params, world p/n, camera distance
    (cpu/render.cpp:110-161)."""
    from vspg_pbrt_v4_tpu import cli

    scene = tmp_path / "probe.pbrt"
    scene.write_text('''
Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
WorldBegin
Material "diffuse" "rgb reflectance" [.6 .3 .2]
Shape "sphere" "float radius" [1]
''')
    rc = cli.main([str(scene), "--pixelmaterial", "8,8", "--quiet"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Intersection depth 1" in out
    assert "diffuse" in out and "albedo=(0.6" in out
    assert "Distance from camera: 3" in out  # sphere front at z=-1
    # the ray continues through and reports the back side too
    assert "Intersection depth 2" in out
    # a miss pixel errors like the reference's ErrorExit
    rc = cli.main([str(scene), "--pixelmaterial", "0,0", "--quiet"])
    assert rc == 1


@pytest.mark.slow
def test_cli_renders(tmp_path):
    out = str(tmp_path / "o.exr")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO
    r = subprocess.run(
        [sys.executable, "-m", "vspg_pbrt_v4_tpu",
         os.path.join(REPO, "scenes/fogbox.pbrt"),
         "--spp", "4", "--resolution", "24x24", "--outfile", out, "--cpu",
         "--quiet"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    img = read_image(out)
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all() and img.mean() > 0.01


@pytest.mark.slow
def test_textures_checker():
    """Checker texture on a floor renders alternating albedo."""
    import jax.numpy as jnp

    from vspg_pbrt_v4_tpu.models.integrators import extras
    from vspg_pbrt_v4_tpu.models.textures import eval_texture

    scene_txt = '''
Film "rgb" "integer xresolution" [32] "integer yresolution" [32]
LookAt 0 3 0  0 0 0  0 0 1
Camera "perspective" "float fov" [40]
WorldBegin
Texture "checks" "spectrum" "checkerboard"
  "float uscale" [4] "float vscale" [4]
  "rgb tex1" [1 0 0] "rgb tex2" [0 0 1]
Material "diffuse" "texture reflectance" "checks"
Shape "sphere" "float radius" [1]
'''
    setup = build_render_setup(parse_pbrt_string(scene_txt))
    assert setup.scene.textures is not None
    assert int(setup.scene.materials.albedo_tex[1]) == 0
    # direct texture evaluation alternates between the two colors
    uv = jnp.asarray([[0.1, 0.1], [0.35, 0.1], [0.1, 0.35], [0.35, 0.35]])
    v = np.asarray(eval_texture(setup.scene.textures,
                                jnp.zeros(4, jnp.int32), uv))
    assert np.allclose(v[0], [1, 0, 0]) and np.allclose(v[3], [1, 0, 0])
    assert np.allclose(v[1], [0, 0, 1]) and np.allclose(v[2], [0, 0, 1])
    # gbuffer albedo of the textured sphere shows both colors
    alb, _, _, _ = extras.render_gbuffer(setup.scene, setup.camera, setup.film)
    alb = np.asarray(alb)
    hit = alb.sum(-1) > 0
    reds = (alb[..., 0] > 0.5) & hit
    blues = (alb[..., 2] > 0.5) & hit
    assert reds.sum() > 10 and blues.sum() > 10


def test_object_instance(tmp_path):
    """ObjectBegin/End/Instance: shapes replay under each instance CTM
    (scene.h ObjectInstance semantics, flattened geometry)."""
    import numpy as np

    scene_file = tmp_path / "inst.pbrt"
    scene_file.write_text("""
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
LookAt 0 0 -6  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
WorldBegin
LightSource "infinite" "rgb L" [0.5 0.5 0.5]
ObjectBegin "pair"
  Material "diffuse" "rgb reflectance" [0.8 0.2 0.2]
  Shape "sphere" "float radius" [0.5]
  Translate 1.2 0 0
  Shape "sphere" "float radius" [0.3]
ObjectEnd
ObjectInstance "pair"
AttributeBegin
  Translate -1.5 0 0
  ObjectInstance "pair"
AttributeEnd
""")
    from vspg_pbrt_v4_tpu.scene import builder
    from vspg_pbrt_v4_tpu.scene.parser import parse_pbrt_file

    setup = builder.build_render_setup(parse_pbrt_file(str(scene_file)))
    g = setup.scene.geometry
    assert g.n_sph == 4
    cs = sorted(np.asarray(g.sph_c)[:, 0].tolist())
    assert np.allclose(cs, [-1.5, -0.3, 0.0, 1.2], atol=1e-5)
    # instanced shapes carry the material defined inside the object block
    mats = np.asarray(g.sph_mat)
    assert (mats == mats[0]).all() and mats[0] >= 0


def test_parser_nanovdb_and_rgbgrid_media(tmp_path):
    """MakeNamedMedium 'nanovdb' loads a raw .nvdb (media.h:657) and
    'rgbgrid' builds an RGBGridMedium (media.h:392)."""
    import numpy as np

    from vspg_pbrt_v4_tpu.models.media import RGBGridMedium
    from vspg_pbrt_v4_tpu.scene import build_render_setup, parse_pbrt_string
    from vspg_pbrt_v4_tpu.tools import nvdb

    d = np.ones((16, 16, 16), np.float32) * 2.0
    pth = str(tmp_path / "cl.nvdb")
    nvdb.write_nvdb(pth, d, index_origin=(0, 0, 0), voxel_size=0.125)
    res = parse_pbrt_string(f'''
Camera "perspective" "float fov" [30]
WorldBegin
MakeNamedMedium "cl" "string type" "nanovdb" "string filename" "{pth}"
AttributeBegin
MediumInterface "cl" ""
Material "none"
Shape "sphere" "float radius" [3]
AttributeEnd
LightSource "infinite" "rgb L" [0.5 0.5 0.5]
''')
    setup = build_render_setup(res, res_override=(16, 16))
    assert len(setup.scene.media.grids) == 1
    gm = setup.scene.media.grids[0]
    assert np.allclose(np.asarray(gm.density), 2.0)
    # world bounds from index bbox * voxel size
    assert np.allclose(np.asarray(gm.b_max) - np.asarray(gm.b_min), 2.0)

    res2 = parse_pbrt_string('''
Camera "perspective"
WorldBegin
MakeNamedMedium "m" "string type" "rgbgrid"
  "integer nx" [2] "integer ny" [2] "integer nz" [2]
  "rgb sigma_a" [''' + " ".join(["0.5 1.0 1.5"] * 8) + ''']
AttributeBegin
MediumInterface "m" ""
Material "none"
Shape "sphere" "float radius" [1]
AttributeEnd
LightSource "infinite" "rgb L" [1 1 1]
''')
    setup2 = build_render_setup(res2, res_override=(8, 8))
    gm2 = setup2.scene.media.grids[0]
    assert isinstance(gm2, RGBGridMedium)
    assert np.allclose(np.asarray(gm2.sigma_a_grid)[0, 0, 0], [0.5, 1.0, 1.5])
