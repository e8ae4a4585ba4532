"""Terminal GUI analog: key map, DisplayState contract, frame drawing,
and the interactive accumulate/reset loop
(ref: src/pbrt/util/gui.h:26-60, util/gui.cpp:96-176, pbrt.cpp:127)."""

import io

import numpy as np

from vspg_pbrt_v4_tpu.utils import gui
from vspg_pbrt_v4_tpu.utils import transform as tr


def _gui_with(keys, **kw):
    return gui.GUI("t", (8, 8), infile=io.StringIO(keys),
                   outfile=io.StringIO(), **kw)


def test_translate_keys_move_camera_space():
    g = _gui_with("")
    g.move_scale = 0.25
    reset, ex = g.process_keys(list("wd"))
    assert reset and not ex
    p = tr.apply_point(g.moving_from_camera, np.zeros(3))
    np.testing.assert_allclose(np.asarray(p), [0.25, 0.0, 0.25], atol=1e-6)


def test_arrow_rotation_and_exit():
    g = _gui_with("")
    reset, ex = g.process_keys(["left", "escape"])
    assert reset and ex
    # yaw by -0.5 deg about +y (gui.cpp:96)
    v = tr.apply_vector(g.moving_from_camera, np.asarray([0.0, 0.0, 1.0]))
    assert abs(float(v[1])) < 1e-6
    assert abs(float(np.degrees(np.arctan2(v[0], v[2]))) + 0.5) < 1e-3


def test_exposure_and_move_scale_keys():
    g = _gui_with("")
    g.process_keys(["b", "b", "B", "=", "-", "-"])
    assert abs(g.exposure - 1.125) < 1e-9
    assert abs(g.move_scale - (1.0 / 1000.0)) < 1e-9  # 0.002 x2 then x0.25


def test_refresh_display_states_and_ansi_frame():
    img = np.full((8, 8, 3), 0.5, np.float32)
    g = _gui_with("w")
    assert g.refresh_display(img) == gui.RESET
    out = g.outfile.getvalue()
    assert "\x1b[38;2;" in out and "▀" in out  # truecolor half-blocks
    g2 = _gui_with("\x1b")
    assert g2.refresh_display(img) == gui.EXIT
    g3 = _gui_with("")
    assert g3.refresh_display(img) == gui.NONE


def test_arrow_sequence_decoding():
    g = _gui_with("")
    keys = g._decode_keys(list("\x1b[Aw\x1b[D\x1b"))
    assert keys == ["up", "w", "left", "escape"]


def test_interactive_loop_accumulates_then_resets():
    calls = []

    class Cam:
        def __init__(self, c2w):
            self.camera_to_world = c2w

        def replace(self, camera_to_world):
            return Cam(camera_to_world)

    def render(cam, wave):
        calls.append((np.asarray(cam.camera_to_world.m).copy(), wave))
        return np.full((4, 4, 3), float(wave + 1), np.float32)

    # wave0 render -> 'w' pressed -> RESET moves camera; wave1-2 accumulate
    g = _gui_with("w")
    g.move_scale = 1.0
    img = gui.interactive_loop(g, Cam(tr.identity()), render, max_waves=3)
    assert len(calls) == 3
    # camera moved by +z after the reset
    assert abs(calls[1][0][2, 3] - 1.0) < 1e-6
    # accumulation restarted at wave 1: mean of waves 1,2 -> (2+3)/2
    np.testing.assert_allclose(img, 2.5)
    # moving_from_camera was consumed back to identity
    np.testing.assert_allclose(np.asarray(g.moving_from_camera.m), np.eye(4),
                               atol=1e-7)


def test_cli_interactive_scripted(tmp_path, monkeypatch):
    # end-to-end: a tiny scene through `pbrt --interactive` with a piped
    # key script (ESC after the first wave), writing the accumulated film
    scene = tmp_path / "s.pbrt"
    scene.write_text("""
Integrator "volpath"
Sampler "independent" "integer pixelsamples" [1]
Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
Camera "perspective" "float fov" [40]
WorldBegin
LightSource "infinite" "rgb L" [.5 .5 .5]
""")
    out = tmp_path / "o.exr"
    import sys

    monkeypatch.setattr(sys, "stdin", io.StringIO(""))
    from vspg_pbrt_v4_tpu import cli

    rc = cli.main([str(scene), "--interactive", "--max-waves", "2",
                   "--outfile", str(out), "--quiet", "--cpu"])
    assert rc == 0
    from vspg_pbrt_v4_tpu.utils.image import read_image

    img = read_image(out)
    assert img.shape == (16, 16, 3)
    assert np.all(np.isfinite(img)) and img.mean() > 0.1
