"""Generate golden-vector fixtures for the VP8L (WebP lossless)
decoder.

Each fixture is a (.webp, expected-RGBA .npy) pair committed under
tests/fixtures/webp/. The stream bytes come from the test-side
encoder (tests/test_webp_codec.encode_webp); because VP8L is
LOSSLESS, the expected pixels are simply the original image the
encoder was given — computed here with no decoder involvement, so a
decoder regression anywhere (prefix codes, LZ77, transforms, cache)
breaks exact equality, not a round-trip tolerance.

Run once; outputs are committed. PIL is not required (the container
has none) — when PIL is present, tests/test_webp_codec.py
additionally cross-checks a stream against it.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from test_webp_codec import (  # noqa: E402
    _gradient_image,
    _rand_image,
    _subsample,
    encode_webp,
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "webp",
)


def _to_rgba(argb: list[int], w: int, h: int) -> np.ndarray:
    a = np.asarray(argb, dtype=np.uint32)
    rgba = np.empty((h * w, 4), dtype=np.uint8)
    rgba[:, 0] = (a >> 16) & 0xFF
    rgba[:, 1] = (a >> 8) & 0xFF
    rgba[:, 2] = a & 0xFF
    rgba[:, 3] = (a >> 24) & 0xFF
    return rgba.reshape(h, w, 4)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    fixtures = []

    w, h = 24, 17
    img = _gradient_image(w, h)
    fixtures.append(("gradient_rgb", w, h, img, {"subtract_green": True, "lz77": True}))

    w, h = 13, 9
    img = _rand_image(w, h, 42)
    fixtures.append(("random_rgba", w, h, img, {"cache_bits": 4}))

    w, h = 21, 6
    import random

    rng = random.Random(16)
    colors = sorted({(255 << 24) | rng.randrange(1 << 24) for _ in range(30)})[:16]
    img = [colors[rng.randrange(len(colors))] for _ in range(w * h)]
    for i, c in enumerate(colors):
        img[i] = c
    fixtures.append(("palette_16", w, h, img, {"palette": True}))

    w, h = 32, 32
    bits = 3
    modes = [(i % 14) for i in range(_subsample(w, bits) * _subsample(h, bits))]
    img = _gradient_image(w, h)
    fixtures.append(("predictor_mix", w, h, img, {"predictor": (bits, modes)}))

    for name, w, h, img, kw in fixtures:
        data = encode_webp(w, h, img, **kw)
        with open(os.path.join(OUT, f"{name}.webp"), "wb") as f:
            f.write(data)
        np.save(os.path.join(OUT, f"{name}.npy"), _to_rgba(img, w, h))
        print(f"{name}: {w}x{h}, {len(data)} bytes, opts={kw.keys()}")


if __name__ == "__main__":
    main()
