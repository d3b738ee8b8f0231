"""Bilinear/bicubic baselines and the information-preservation comparison.

Reproduces the reference README's qualitative claim (README.md:8-9 — area
averaging "prevents the loss of image information" during reduction, unlike
bilinear/bicubic) quantitatively: `compare_downscale` resamples with all
three methods and reports PSNR of the round trip plus mean-flux error.
Baselines use jax.image.resize (XLA-native convolutional resize).
"""

from __future__ import annotations

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
