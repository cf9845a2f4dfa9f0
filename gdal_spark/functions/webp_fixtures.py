"""Tiny committed WebP fixtures for codec contract tests/queries.

Both are deterministic libwebp encodings of the same smooth 16x16
gradient (r*8, c*8, 255-(r+c)*4), generated once and embedded so
executors need no filesystem fixtures:

* ``LOSSY_WEBP``  — plain lossy VP8 key frame ("VP8 " chunk, q85).
  Decodable by the RFC 6386 decoder (functions/vp8.py): classifies
  ``ok``; decodes to >= 39 dB PSNR vs the generating gradient.
* ``ALPHA_WEBP``  — extended container (VP8X + ALPH + VP8) carrying an
  alpha plane; both the VP8 frame and the (header-less VP8L) ALPH
  chunk decode -> RGBA: classifies ``ok``.
* ``ANIM_WEBP``   — minimal animated container (VP8X + ANIM + ANMF).
  Animation is not decoded: classifies ``unsupported_codec``
  (quarantine).
"""

import numpy as np

LOSSY_WEBP = bytes.fromhex(
    "524946465800000057454250565038204c0000009002009d012a100010000100"
    "1c25b00274ba01440360000c9763aba00000fefea9aee5a5f1b07241ee7fbf44"
    "abd16f43dfffa61a53ff76be3bff81e62bcca5cfbdc49ff2d76e751151800000"
)

ALPHA_WEBP = bytes.fromhex(
    "52494646ac00000057454250565038580a000000100000000f00000f0000414c"
    "504839000000017f20164cdea1e42f994244640ea822db860a2aa8a0820a2aa8"
    "a0820a2aa8a0820a2aa8e06b3b44f43f039144a65069740693c5e670797c0000"
    "565038204c0000009002009d012a1000100001001c25b00274ba01440360000c"
    "9763aba00000fefea9aee5a5f1b07241ee7fbf44abd16f43dfffa61a53ff76be"
    "3bff81e62bcca5cfbdc49ff2d76e751151800000"
)


def fixture_gradient() -> np.ndarray:
    """The 16x16 RGB image both fixtures encode."""
    r, c = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    return np.stack([r * 8, c * 8, 255 - (r + c) * 4], -1).astype(np.uint8)

ANIM_WEBP = bytes.fromhex(
    "524946464200000057454250565038580a000000020000000f00000f0000414e"
    "494d06000000ffffffff0000414e4d461500000000000000000000000000000000"
    "0000006672616d6500"
)
