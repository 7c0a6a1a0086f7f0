"""Generate golden-vector fixtures for the baseline JPEG decoder
(VERDICT r5 item 6).

Each fixture is a (tiny .jpg, expected-pixels .npy) pair committed
under tests/fixtures/jpeg/. The JPEG bytes come from the test-side
encoder (tests/test_jpeg_codec.encode_baseline_jpeg). The expected
pixels are computed HERE, independently of the decoder module: the
encoder's quantized coefficients are dequantized and reconstructed
with a direct cosine-sum IDCT (T.81 A.3.3 written out literally, no
shared matrix code), assembled in MCU order, nearest-neighbor
upsampled, and JFIF YCbCr→RGB converted. The decoder must reproduce
these pixels byte-exactly — any regression in entropy decoding, block
layout, upsampling or color math breaks equality, not a round-trip
tolerance.

Run once; outputs are committed. PIL is not required (the container
has none) — if PIL is present, tests/test_jpeg_codec.py additionally
cross-checks against it.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from test_jpeg_codec import (  # noqa: E402
    _FLAT_Q,
    _plane_blocks,
    encode_baseline_jpeg,
    encode_progressive_jpeg,
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "jpeg",
)

# zigzag order, written out (same public constant as the spec table)
ZIG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _idct_direct(coef_nat: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 inverse DCT as the literal double sum — deliberately
    NOT the matrix factorization the decoder uses."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                cu = 1 / np.sqrt(2) if u == 0 else 1.0
                for v in range(8):
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef_nat[u, v]
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out


def _reference_plane(plane: np.ndarray, q: list[int], mcu_h: int, mcu_w: int) -> np.ndarray:
    """Quantize+reconstruct one component plane exactly as an MCU-tiled
    decoder sees it: pad to the MCU grid, per-block forward-quantize
    (the encoder's own math via _plane_blocks), dequantize, direct IDCT."""
    h, w = plane.shape
    ph = -(-h // mcu_h) * mcu_h
    pw = -(-w // mcu_w) * mcu_w
    padded = np.pad(plane.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")
    blocks, bh, bw = _plane_blocks(padded, q)
    qnat = np.zeros(64)
    qnat[np.array(ZIG)] = q
    qnat = qnat.reshape(8, 8)
    out = np.zeros((bh * 8, bw * 8))
    for bi, zz in enumerate(blocks):
        nat = np.zeros(64)
        nat[np.array(ZIG)] = zz
        deq = nat.reshape(8, 8) * qnat
        by, bx = divmod(bi, bw)
        out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct_direct(deq) + 128.0
    return out


def expected_pixels(
    img: np.ndarray,
    q: list[int] = _FLAT_Q,
    subsample_420: bool = False,
    subsample_422: bool = False,
) -> np.ndarray:
    """Spec-math expected decode of encode_baseline_jpeg(img, ...)."""
    color = img.ndim == 3
    h, w = img.shape[:2]
    if not color:
        y = _reference_plane(img.astype(np.float64), q, 8, 8)[:h, :w]
        return np.clip(np.round(y), 0, 255).astype(np.uint8)

    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    if subsample_420:
        hmax = vmax = 2
        ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
        cbs = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        crs = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        cbs = cbs.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        crs = crs.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    elif subsample_422:
        hmax, vmax = 2, 1
        pw = -(-w // 2) * 2
        cbs = np.pad(cb, ((0, 0), (0, pw - w)), mode="edge")
        crs = np.pad(cr, ((0, 0), (0, pw - w)), mode="edge")
        cbs = cbs.reshape(h, pw // 2, 2).mean(axis=2)
        crs = crs.reshape(h, pw // 2, 2).mean(axis=2)
    else:
        hmax = vmax = 1
        cbs, crs = cb, cr
    # luma tiles the full MCU grid; chroma tiles its own 8×8 grid
    yr = _reference_plane(y, q, 8 * vmax, 8 * hmax)
    cbr = _reference_plane(cbs, q, 8, 8)
    crr = _reference_plane(crs, q, 8, 8)
    cbr = np.repeat(np.repeat(cbr, vmax, axis=0), hmax, axis=1)
    crr = np.repeat(np.repeat(crr, vmax, axis=0), hmax, axis=1)
    yr, cbr, crr = yr[:h, :w], cbr[:h, :w], crr[:h, :w]
    rr = yr + 1.402 * (crr - 128.0)
    gg = yr - 0.344136 * (cbr - 128.0) - 0.714136 * (crr - 128.0)
    bb = yr + 1.772 * (cbr - 128.0)
    rgb = np.stack([rr, gg, bb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def cases() -> dict[str, tuple[np.ndarray, dict]]:
    yy, xx = np.mgrid[0:23, 0:17]
    grad = ((xx * 6 + yy * 4) % 220 + 18).astype(np.uint8)

    yy, xx = np.mgrid[0:32, 0:32]
    rgb = np.stack(
        [
            ((xx * 5 + yy) % 240).astype(np.uint8),
            ((xx + yy * 7) % 230 + 10).astype(np.uint8),
            ((xx * 3 + yy * 3) % 200 + 30).astype(np.uint8),
        ],
        axis=-1,
    )

    yy, xx = np.mgrid[0:24, 0:40]
    rgb420 = np.stack(
        [
            ((xx * 4 + yy * 2) % 250).astype(np.uint8),
            ((xx * 2 + yy * 5) % 225 + 15).astype(np.uint8),
            ((xx + yy * 9) % 210 + 20).astype(np.uint8),
        ],
        axis=-1,
    )

    yy, xx = np.mgrid[0:20, 0:36]
    rgb422 = np.stack(
        [
            ((xx * 7 + yy * 3) % 235).astype(np.uint8),
            ((xx * 3 + yy * 4) % 245 + 5).astype(np.uint8),
            ((xx * 5 + yy * 6) % 190 + 40).astype(np.uint8),
        ],
        axis=-1,
    )

    return {
        "grey_gradient_odd": (grad, {}),
        "rgb_444": (rgb, {}),
        "rgb_420": (rgb420, {"subsample_420": True}),
        "rgb_422_dri": (rgb422, {"subsample_422": True, "restart_interval": 2}),
        # PROGRESSIVE (SOF2) fixtures, round 7 (VERDICT r6 item 6): the
        # progressive encoder writes the SAME quantized coefficients as
        # the baseline encoder across DC first/refine + per-component AC
        # band + AC refinement scans, so the independent spec-math
        # reconstruction above is the expected decode here too.
        "prog_grey": (grad, {"progressive": True}),
        "prog_rgb_420": (rgb420, {"subsample_420": True, "progressive": True}),
    }


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name, (img, kw) in cases().items():
        progressive = kw.pop("progressive", False)
        if progressive:
            payload = encode_progressive_jpeg(img, **kw)
        else:
            payload = encode_baseline_jpeg(img, **kw)
        enc_kw = {k: v for k, v in kw.items() if k != "restart_interval"}
        golden = expected_pixels(img, **enc_kw)
        with open(os.path.join(OUT, f"{name}.jpg"), "wb") as f:
            f.write(payload)
        np.save(os.path.join(OUT, f"{name}.npy"), golden)
        print(f"{name}: jpeg {len(payload)}B, golden {golden.shape} {golden.dtype}")


if __name__ == "__main__":
    main()
