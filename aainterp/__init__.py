"""aainterp — TPU-native area-average (conservative) image resampling.

A brand-new JAX/XLA/Pallas framework with the capabilities of
Ishikawa-lab/Area_average_interpolation (see SURVEY.md): exact
overlap-area-weighted resampling to arbitrary resolution with arbitrary
rotation about an isocenter, plus the reference's fast approximate mode,
bilinear/bicubic baselines, a PSNR/information-loss harness, CSV I/O, a CLI,
and multi-chip spatial sharding.
"""

from .api import (
    InterpResult,
    apply_operator,
    area_average_interpolate,
    area_average_interpolation,
    area_pyramid,
    area_resize,
    area_resize_nd,
    resize,
    area_rotate,
    build_operator,
    fast_area_average_interpolation,
    propagate_variance,
    resize_bands,
)
from .autodiff import apply_operator_transpose
from .grids import GridSpec, ValidationError, make_grid_spec
from .ops.weights import compose_separable
from .pipeline import stream_apply

__version__ = "0.1.0"

__all__ = [
    "InterpResult",
    "GridSpec",
    "ValidationError",
    "apply_operator",
    "apply_operator_transpose",
    "area_average_interpolate",
    "area_average_interpolation",
    "area_pyramid",
    "area_resize",
    "area_resize_nd",
    "resize",
    "area_rotate",
    "build_operator",
    "compose_separable",
    "fast_area_average_interpolation",
    "make_grid_spec",
    "propagate_variance",
    "resize_bands",
    "stream_apply",
    "__version__",
]
