"""Bilinear/bicubic baselines and the information-preservation comparison.

Reproduces the reference README's qualitative claim (README.md:8-9 — area
averaging "prevents the loss of image information" during reduction, unlike
bilinear/bicubic) quantitatively: `compare_downscale` resamples with all
three methods and reports PSNR of the round trip plus mean-flux error.
Baselines use jax.image.resize (XLA-native convolutional resize).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from . import metrics
from .api import area_average_interpolate


def resize_baseline(src, dst_shape: Tuple[int, int], method: str):
    """Bilinear ('linear') or bicubic ('cubic') resize on trailing 2 axes."""
    src = jnp.asarray(src)
    out_shape = src.shape[:-2] + tuple(dst_shape)
    return jax.image.resize(src, out_shape, method=method)


def compare_rotation_roundtrip(
    src,
    angle: float = 30.0,
    resolution: float = 1.0,
) -> Dict[str, float]:
    """Rotate by +angle then -angle and PSNR the central region vs the
    original — information preservation under rotation, area-average vs
    scipy's bilinear/bicubic rotation (the interpolators the reference's
    README positions itself against).

    Returns {method: psnr_db}.
    """
    import numpy as np
    from scipy import ndimage

    src = np.asarray(src, np.float64)
    H, W = src.shape
    iso = (W / 2.0, H / 2.0)
    results = {}

    r1 = area_average_interpolate(src, resolution, resolution, iso, angle)
    fwd = np.asarray(r1.dst, np.float64)
    h2, w2 = fwd.shape
    r2 = area_average_interpolate(
        fwd, resolution, resolution, (w2 / 2.0, h2 / 2.0), -angle
    )
    back = np.asarray(r2.dst, np.float64)

    def center_crop_psnr(rt):
        hh, ww = rt.shape
        cy, cx = hh // 2, ww // 2
        k = min(H, W) // 4
        crop_rt = rt[cy - k: cy + k, cx - k: cx + k]
        crop_src = src[H // 2 - k: H // 2 + k, W // 2 - k: W // 2 + k]
        mse = float(np.mean((crop_rt - crop_src) ** 2))
        rng = float(crop_src.max() - crop_src.min()) or 1.0
        return 10.0 * math.log10(rng * rng / max(mse, 1e-30)) \
            if mse > 0 else float("inf")

    results["area_average"] = center_crop_psnr(back)
    for name, order in (("bilinear", 1), ("bicubic", 3)):
        fwd_s = ndimage.rotate(src, -angle, reshape=True, order=order)
        back_s = ndimage.rotate(fwd_s, angle, reshape=True, order=order)
        results[name] = center_crop_psnr(back_s)
    return results


def compare_downscale(
    src,
    src_resolution: float,
    dst_resolution: float,
    src_isocenter=(0.0, 0.0),
) -> Dict[str, Dict[str, float]]:
    """Downscale with area-average / bilinear / bicubic and score each.

    Returns {method: {psnr_roundtrip, mean_flux_error}}.
    """
    src = jnp.asarray(src, jnp.float32)
    r = area_average_interpolate(
        src, src_resolution, dst_resolution, src_isocenter, 0.0
    )
    dst_shape = r.dst.shape[-2:]
    results = {}
    candidates = {
        "area_average": r.dst,
        "bilinear": resize_baseline(src, dst_shape, "linear"),
        "bicubic": resize_baseline(src, dst_shape, "cubic"),
    }
    for name, dst in candidates.items():
        up = resize_baseline(dst, src.shape[-2:], "linear")
        results[name] = {
            "psnr_roundtrip": float(metrics.psnr(src, up).mean()),
            "mean_flux_error": float(metrics.mean_flux_error(src, dst).mean()),
        }
    return results
