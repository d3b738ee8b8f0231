"""Quality metrics: PSNR and information-loss harness.

Quantifies the README's qualitative claim (reference README.md:8-9) that
area-average interpolation preserves image information during reduction,
unlike bilinear/bicubic: after a downscale, the *total flux* (mean x area)
of a conservative resample matches the source, and round-trip error is
lower.  Used by the baselines comparison harness (aainterp.baselines).
"""

from __future__ import annotations

import jax.numpy as jnp


def psnr(a, b, data_range: float | None = None):
    """Peak signal-to-noise ratio in dB over the trailing 2 axes."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if data_range is None:
        data_range = jnp.maximum(
            a.max(axis=(-2, -1)) - a.min(axis=(-2, -1)), 1e-12
        )
    mse = jnp.mean((a - b) ** 2, axis=(-2, -1))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-30))


def mean_flux_error(src, dst):
    """Relative error of the image mean ('flux') after resampling.

    Conservative (area-average) resampling of a fully-covered grid keeps the
    mean intact; bilinear/bicubic with even kernels generally does not at
    non-integer ratios.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    ms = jnp.mean(src, axis=(-2, -1))
    md = jnp.mean(dst, axis=(-2, -1))
    return jnp.abs(md - ms) / jnp.maximum(jnp.abs(ms), 1e-12)


def information_loss(src, roundtrip):
    """RMS error of downscale->upscale round trip, normalised to src RMS."""
    src = jnp.asarray(src, jnp.float32)
    rt = jnp.asarray(roundtrip, jnp.float32)
    num = jnp.sqrt(jnp.mean((src - rt) ** 2, axis=(-2, -1)))
    den = jnp.sqrt(jnp.mean(src**2, axis=(-2, -1)))
    return num / jnp.maximum(den, 1e-12)
