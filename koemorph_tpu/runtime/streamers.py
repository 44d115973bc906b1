"""Blendshape output streamers: JSON-over-UDP, OSC, JSONL file.

Parity target: reference scripts/rt.py:175-238 (BlendshapeStreamer). Packet
formats are byte-compatible:

- udp: JSON ``{"timestamp": t, "blendshapes": [52 floats]}``
- osc: one message at ``osc_address`` carrying 52 floats (the reference uses
  python-osc; that package isn't in this image, so the OSC 1.0 binary framing
  is encoded directly — same bytes on the wire)
- file: one JSON object per line, same schema as udp
"""

from __future__ import annotations

import json
import socket
import struct
from typing import Optional

import numpy as np

__all__ = ["BlendshapeStreamer", "encode_osc_message"]


def _osc_pad(b: bytes) -> bytes:
    """Zero-pad to a 4-byte boundary (OSC strings/blobs are 32-bit aligned)."""
    return b + b"\x00" * (4 - len(b) % 4 if len(b) % 4 else 4)


def encode_osc_message(address: str, values: list[float]) -> bytes:
    """Minimal OSC 1.0 message: address, float32 typetags, big-endian args."""
    out = _osc_pad(address.encode("utf-8"))
    out += _osc_pad(("," + "f" * len(values)).encode("ascii"))
    for v in values:
        out += struct.pack(">f", float(v))
    return out


class BlendshapeStreamer:
    """Streams 52-coefficient frames via UDP / OSC / JSONL file."""

    def __init__(
        self,
        output_mode: str = "udp",           # udp | osc | file
        host: str = "127.0.0.1",
        port: int = 9001,
        osc_address: str = "/blendshapes",
        output_file: Optional[str] = None,
    ):
        self.output_mode = output_mode
        self.host = host
        self.port = port
        self.osc_address = osc_address
        self.output_file = output_file
        self.frames_sent = 0

        if output_mode in ("udp", "osc"):
            self.socket = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        elif output_mode == "file":
            if not output_file:
                raise ValueError("output_file required for file mode")
            self.file_handle = open(output_file, "w")
        else:
            raise ValueError(f"Unknown output mode: {output_mode}")

    def send(self, blendshapes: np.ndarray, timestamp: float) -> None:
        values = np.asarray(blendshapes, np.float32).reshape(-1)
        if self.output_mode == "udp":
            payload = json.dumps({
                "timestamp": timestamp,
                "blendshapes": values.tolist(),
            }).encode("utf-8")
            self.socket.sendto(payload, (self.host, self.port))
        elif self.output_mode == "osc":
            self.socket.sendto(
                encode_osc_message(self.osc_address, values.tolist()),
                (self.host, self.port))
        else:
            self.file_handle.write(json.dumps({
                "timestamp": timestamp,
                "blendshapes": values.tolist(),
            }) + "\n")
            self.file_handle.flush()
        self.frames_sent += 1

    def close(self) -> None:
        if hasattr(self, "socket"):
            self.socket.close()
        if hasattr(self, "file_handle"):
            self.file_handle.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
