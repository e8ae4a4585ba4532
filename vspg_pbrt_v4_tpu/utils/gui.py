"""Interactive GUI analog of the reference's GLFW/OpenGL window
(ref: src/pbrt/util/gui.h:27, util/gui.cpp:125-176, cmd/pbrt.cpp:59
``--interactive``).

TPU-native disposition: the reference maps a CUDA framebuffer into an
OpenGL texture and polls GLFW keys; in this container there is no display
server, so the analog draws the film into the *terminal* with 24-bit ANSI
half-block cells (two film rows per character row) and polls raw keyboard
input via termios/select. The interaction model is the reference's,
key-for-key (gui.cpp:136-176):

    w/a/s/d/q/e  translate the camera in camera space by ``move_scale``
    arrow keys   rotate (yaw left/right, pitch up/down)
    b / B        exposure x1.125 / /1.125
    = / -        move_scale x2 / x0.5
    c            print the accumulated camera transform
    ESC          exit

Any camera motion returns ``RESET`` from ``refresh_display`` so the
caller restarts film accumulation — exactly the reference's
``DisplayState`` contract (gui.h:26 ``enum DisplayState {EXIT, RESET,
NONE}``). Streams are injectable so the loop is testable headless."""

import select
import sys

import numpy as np

from . import transform as tr

# DisplayState (gui.h:26)
EXIT, RESET, NONE = "exit", "reset", "none"

_CSI = "\x1b["


class GUI:
    def __init__(self, title, resolution, scene_diag=2.0,
                 infile=None, outfile=None, max_cols=100):
        self.title = title
        self.resolution = resolution  # (nx, ny) film pixels
        self.exposure = 1.0
        # gui.cpp:229 moveScale = |scene diagonal| / 1000
        self.move_scale = float(scene_diag) / 1000.0
        self.moving_from_camera = tr.identity()
        self.print_camera_transform = False
        self.infile = infile if infile is not None else sys.stdin
        self.outfile = outfile if outfile is not None else sys.stdout
        self.max_cols = max_cols
        self._raw = False
        self._saved_attrs = None
        if self.infile is sys.stdin and sys.stdin.isatty():
            import termios
            import tty

            self._saved_attrs = termios.tcgetattr(sys.stdin.fileno())
            tty.setcbreak(sys.stdin.fileno())
            self._raw = True

    def close(self):
        if self._raw and self._saved_attrs is not None:
            import termios

            termios.tcsetattr(sys.stdin.fileno(), termios.TCSADRAIN,
                              self._saved_attrs)
            self._raw = False
        try:
            self.outfile.write(_CSI + "0m\n")
            self.outfile.flush()
        except (ValueError, OSError):
            pass

    # -- input ---------------------------------------------------------------

    def _pending_chars(self):
        """Drain available input without blocking (GLFW pollEvents analog)."""
        chars = []
        f = self.infile
        has_fd = hasattr(f, "fileno")
        if has_fd:
            try:
                f.fileno()
            except (OSError, ValueError):
                has_fd = False
        if has_fd:
            # any real file descriptor (tty or pipe) polls with a zero
            # timeout — a blocking read() on a long-lived non-tty stdin
            # pipe would hang the render loop after the first wave
            while select.select([f], [], [], 0)[0]:
                c = f.read(1)
                if not c:
                    break
                chars.append(c)
        else:  # fd-less stream (tests / StringIO): read all that's left
            data = f.read()
            if data:
                chars.extend(data)
        return chars

    def _decode_keys(self, chars):
        """Collapse ESC [ A/B/C/D arrow sequences into 'up/down/right/left'
        tokens; a bare ESC is exit."""
        keys, i = [], 0
        while i < len(chars):
            c = chars[i]
            if c == "\x1b":
                if i + 2 < len(chars) and chars[i + 1] == "[":
                    keys.append({"A": "up", "B": "down", "C": "right",
                                 "D": "left"}.get(chars[i + 2], ""))
                    i += 3
                    continue
                keys.append("escape")
                i += 1
                continue
            keys.append(c)
            i += 1
        return keys

    def process_keys(self, keys):
        """Apply the reference key map (gui.cpp:96-176). Returns
        (needs_reset, wants_exit)."""
        needs_reset = False
        wants_exit = False
        m = self.moving_from_camera
        for k in keys:
            if k == "escape":
                wants_exit = True
            elif k == "a":
                m = m @ tr.translate(-self.move_scale, 0, 0)
                needs_reset = True
            elif k == "d":
                m = m @ tr.translate(self.move_scale, 0, 0)
                needs_reset = True
            elif k == "s":
                m = m @ tr.translate(0, 0, -self.move_scale)
                needs_reset = True
            elif k == "w":
                m = m @ tr.translate(0, 0, self.move_scale)
                needs_reset = True
            elif k == "q":
                m = m @ tr.translate(0, -self.move_scale, 0)
                needs_reset = True
            elif k == "e":
                m = m @ tr.translate(0, self.move_scale, 0)
                needs_reset = True
            # gui.cpp:96-111: arrows rotate by 0.5 deg about camera axes
            elif k == "left":
                m = m @ tr.rotate(-0.5, (0, 1, 0))
                needs_reset = True
            elif k == "right":
                m = m @ tr.rotate(0.5, (0, 1, 0))
                needs_reset = True
            elif k == "up":
                m = m @ tr.rotate(-0.5, (1, 0, 0))
                needs_reset = True
            elif k == "down":
                m = m @ tr.rotate(0.5, (1, 0, 0))
                needs_reset = True
            elif k == "b":
                self.exposure *= 1.125
            elif k == "B":
                self.exposure /= 1.125
            elif k == "=":
                self.move_scale *= 2.0
            elif k == "-":
                self.move_scale *= 0.5
            elif k == "r":
                # gui.cpp processKeys: 'r' cancels accumulated camera
                # motion (movingFromCamera = identity) and resets
                m = tr.identity()
                needs_reset = True
            elif k == "c":
                self.print_camera_transform = True
        self.moving_from_camera = m
        return needs_reset, wants_exit

    def get_camera_transform(self):
        return self.moving_from_camera

    # -- output --------------------------------------------------------------

    def draw_frame(self, img):
        """Render (ny,nx,3) linear radiance as ANSI half-blocks.

        Two film rows share one character cell: the upper row is the
        foreground of '▀', the lower the background — the terminal
        equivalent of gui.cpp's glTexImage2D framebuffer blit."""
        img = np.asarray(img, np.float32) * self.exposure
        ny, nx, _ = img.shape
        cols = min(self.max_cols, nx)
        step = max(nx // cols, 1)
        small = img[:: 2 * step, ::step]  # row pairs
        low = img[step :: 2 * step, ::step]
        if low.shape[0] < small.shape[0]:
            low = np.concatenate([low, low[-1:]], 0)
        low = low[: small.shape[0], : small.shape[1]]

        def to8(x):
            s = np.where(x <= 0.0031308, 12.92 * x,
                         1.055 * np.power(np.clip(x, 1e-8, None), 1 / 2.4)
                         - 0.055)
            return (np.clip(s, 0, 1) * 255 + 0.5).astype(np.uint8)

        top8, bot8 = to8(small), to8(low)
        out = [_CSI + "H"]  # home (frame overdraw, no flicker)
        for r in range(top8.shape[0]):
            row = []
            for cix in range(top8.shape[1]):
                tr_, tg, tb = (int(v) for v in top8[r, cix])
                br, bg, bb = (int(v) for v in bot8[r, cix])
                row.append(f"{_CSI}38;2;{tr_};{tg};{tb}m"
                           f"{_CSI}48;2;{br};{bg};{bb}m▀")
            out.append("".join(row) + _CSI + "0m\n")
        out.append(f"{self.title}  exposure={self.exposure:.3f} "
                   f"move={self.move_scale:.4g}  "
                   "(wasdqe move, arrows rotate, b/B exposure, ESC quit)\n")
        self.outfile.write("".join(out))
        self.outfile.flush()

    def refresh_display(self, img):
        """Draw the frame, poll keys, return EXIT / RESET / NONE
        (gui.cpp:114-122 RefreshDisplay)."""
        self.draw_frame(img)
        needs_reset, wants_exit = self.process_keys(
            self._decode_keys(self._pending_chars()))
        if self.print_camera_transform:
            self.print_camera_transform = False
            np.set_printoptions(precision=4, suppress=True)
            self.outfile.write(
                f"camera-from-moving:\n{np.asarray(self.moving_from_camera.m)}\n")
        if wants_exit:
            return EXIT
        return RESET if needs_reset else NONE


def interactive_loop(gui, camera, render_wave, spp_per_pass=1,
                     max_waves=None):
    """The reference's interactive render loop (pbrt.cpp:127 +
    wavefront/integrator.cpp camera-motion reset): accumulate waves into a
    running mean; on RESET restart accumulation with the moved camera.

    ``render_wave(camera, wave_index) -> (ny, nx, 3)`` renders one wave.
    Returns the final accumulated image."""
    accum = None
    n = 0
    wave = 0
    cam = camera
    while max_waves is None or wave < max_waves:
        img = np.asarray(render_wave(cam, wave))
        accum = img if accum is None else accum + (img - accum) / (n + 1)
        n += 1
        wave += 1
        state = gui.refresh_display(accum)
        if state == EXIT:
            break
        if state == RESET:
            # move the camera by the GUI's camera-space transform and
            # restart accumulation (integrator.cpp: film.Clear())
            delta = gui.get_camera_transform()
            cam = cam.replace(
                camera_to_world=cam.camera_to_world @ delta)
            gui.moving_from_camera = tr.identity()
            accum, n = None, 0
    return accum
