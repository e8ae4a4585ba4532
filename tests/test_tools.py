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
