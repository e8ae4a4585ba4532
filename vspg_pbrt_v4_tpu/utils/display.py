"""tev display-server client (analog of ``util/display.h:23-36``).

Streams in-progress images to a running tev viewer over its TCP protocol
(little-endian packets: [u32 total_len][u8 type][payload]; type 4 =
CreateImage, 3 = UpdateImageV3). Failure-tolerant: if the server is
unreachable every call degrades to a no-op, matching the reference's
non-fatal DisplayDynamic behavior.
"""

from __future__ import annotations

import socket
import struct

import numpy as np


class TevClient:
    def __init__(self, host="127.0.0.1", port=14158):
        self.addr = (host, port)
        self.sock = None
        try:
            self.sock = socket.create_connection(self.addr, timeout=1.0)
        except OSError:
            self.sock = None

    @property
    def connected(self):
        return self.sock is not None

    def _send(self, payload):
        if not self.sock:
            return
        try:
            self.sock.sendall(struct.pack("<I", len(payload) + 4) + payload)
        except OSError:
            self.sock = None

    def create_image(self, name, width, height, channels=("R", "G", "B")):
        p = struct.pack("<bb", 4, 1)  # CreateImage, grabFocus
        p += name.encode() + b"\0"
        p += struct.pack("<ii", width, height)
        p += struct.pack("<i", len(channels))
        for c in channels:
            p += c.encode() + b"\0"
        self._send(p)

    def update_image(self, name, img):
        """img: (ny, nx, 3) float32, full-frame update."""
        img = np.asarray(img, np.float32)
        ny, nx, nc = img.shape
        channels = ("R", "G", "B")[:nc]
        p = struct.pack("<bb", 3, 0)  # UpdateImageV3
        p += name.encode() + b"\0"
        p += struct.pack("<i", nc)
        for c in channels:
            p += c.encode() + b"\0"
        p += struct.pack("<iiii", 0, 0, nx, ny)  # x, y, w, h
        for c in range(nc):  # channel offsets/strides (in samples)
            p += struct.pack("<q", c)
        for c in range(nc):
            p += struct.pack("<q", nc)
        p += img.astype("<f4").tobytes()
        self._send(p)

    def close(self):
        if self.sock:
            try:
                self.sock.close()
            except OSError:
                pass
            self.sock = None
