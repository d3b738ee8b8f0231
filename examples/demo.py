"""End-to-end demo of the aainterp API.

Run:  python examples/demo.py  (CPU is fine: JAX_PLATFORMS=cpu)

Covers the capabilities of the reference program and what this framework
adds: exact/fast/compat modes, rotation about an isocenter, batching,
operator reuse + disk cache, quality comparison against bilinear/bicubic,
and conservative lat-lon regridding.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# honor JAX_PLATFORMS even on machines whose sitecustomize force-sets the
# platform list after env parsing (this box pins "axon,cpu")
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import aainterp as aa  # noqa: E402
from aainterp.baselines import compare_downscale, compare_rotation_roundtrip
from aainterp.regrid import (
    LatLonGrid, area_weighted_mean, conservative_regrid,
)
from aainterp.utils.cache import build_operator_cached


def main():
    rng = np.random.default_rng(0)
    film = rng.uniform(0.0, 2.0, (256, 256)).astype(np.float32)

    # 1. The reference's shipped configuration: 150 dpi film scan to 25.4
    #    dpi (1 px/mm), rotated 1.5 degrees about the isocenter.
    result = aa.area_average_interpolate(
        film, 150.0, 25.4, src_isocenter=(128.0, 128.0), rotation_angle=1.5,
        mode="fast",   # the reference's default mode 2
    )
    print(f"film {film.shape} -> {result.dst.shape}, "
          f"dst isocenter {result.dst_isocenter}")

    # 2. Exact mode (true overlap areas) and reference-compat mode
    #    (bug-for-bug with the C++ exact mode under rotation):
    exact = aa.area_average_interpolate(film, 150.0, 25.4, (128, 128), 1.5)
    compat = aa.area_average_interpolate(
        film, 150.0, 25.4, (128, 128), 1.5, mode="compat"
    )
    diff = np.abs(np.asarray(exact.dst) - np.asarray(compat.dst)).max()
    print(f"exact vs reference-compat max diff: {diff:.2e} "
          "(the reference's type-2 area defect)")

    # 3. Batched frames (leading dims) with a cached operator:
    spec = aa.make_grid_spec((256, 256), 2.0, 1.0, (128, 128), 0.0)
    op = build_operator_cached(spec)     # persisted in ~/.cache/aainterp
    frames = rng.uniform(0, 1, (8, 256, 256)).astype(np.float32)
    batch_out = aa.apply_operator(op, frames)
    print(f"batched apply: {frames.shape} -> {batch_out.shape}")

    # 4. Information preservation vs bilinear/bicubic:
    y, x = np.mgrid[0:96, 0:96].astype(np.float32)
    img = (np.sin(x * 1.3) * np.cos(y * 0.7) + 1.0) / 2.0
    flux = compare_downscale(img, 2.0, 1.0, src_isocenter=(0.5, 0.5))
    print("mean-flux error  :",
          {k: f"{v['mean_flux_error']:.2e}" for k, v in flux.items()})
    rt = compare_rotation_roundtrip(img.astype(np.float64), 30.0)
    print("rotate +/-30 PSNR:", {k: f"{v:.1f} dB" for k, v in rt.items()})

    # 5. Conservative lat-lon regrid (spherical cell areas):
    src_g, dst_g = LatLonGrid(180, 360), LatLonGrid(45, 90)
    field = rng.uniform(250.0, 300.0, (180, 360)).astype(np.float32)
    coarse = conservative_regrid(field, src_g, dst_g)
    print(f"regrid 1deg -> 4deg: global mean "
          f"{float(area_weighted_mean(field, src_g)):.4f} -> "
          f"{float(area_weighted_mean(coarse, dst_g)):.4f} (conserved)")

    # 6. Operator composition: fuse chained stages into ONE exact
    #    operator — one pass over the pixels, intermediate never built.
    op1 = aa.build_operator(aa.make_grid_spec((256, 256), 4.0, 2.0,
                                              (0.0, 0.0), 0.0))
    op2 = aa.build_operator(aa.make_grid_spec((128, 128), 150.0, 60.0,
                                              (0.0, 0.0), 0.0))
    fused = aa.compose_separable(op2, op1)
    two = aa.apply_operator(op2, aa.apply_operator(op1, frames))
    one = aa.apply_operator(fused, frames)
    print(f"fused 2-stage pipeline {frames.shape} -> {one.shape}, "
          f"max diff vs chained {np.abs(np.asarray(one - two)).max():.2e}")

    # 7. Everyday conservative resize to any (even anisotropic) shape —
    #    something the reference rejects (isotropic resolutions only):
    wide = aa.area_resize(frames, (100, 180))
    print(f"area_resize {frames.shape} -> {wide.shape}: mean "
          f"{float(frames.mean()):.6f} -> {float(wide.mean()):.6f} "
          "(flux conserved)")

    # 8. Masked conservative regrid: destination cells average VALID
    #    source cells only (e.g. SST over an ocean mask) — values under
    #    the mask never leak into the output.
    ocean = (rng.uniform(0, 1, field.shape) > 0.3).astype(np.float32)
    sst = conservative_regrid(field, src_g, dst_g, src_mask=ocean)
    print(f"masked regrid: {int((1 - ocean).sum())} land cells ignored, "
          f"{int(np.isnan(np.asarray(sst)).sum())} dst cells fully masked")

    # 9. Streaming executor: host->device->host serving with depth-k
    #    batches in flight (H2D/compute/D2H overlap; the reference's
    #    main loop is strictly serial).
    op = aa.build_operator(aa.make_grid_spec((256, 256), 4.0, 2.0,
                                             (0.0, 0.0), 0.0))
    outs = list(aa.stream_apply(
        op, (rng.uniform(0, 1, (256, 256)).astype(np.float32)
             for _ in range(10)), batch=4, depth=2))
    print(f"stream_apply: 10 frames -> {len(outs)} outputs of "
          f"shape {outs[0].shape} (pipelined)")

    # 10. Uncertainty propagation: the squared-weight operator gives the
    #     EXACT output variance for independent input noise — one extra
    #     apply next to the mean.
    sigma2 = rng.uniform(0.5, 1.5, (256, 256)).astype(np.float32)
    var_out = aa.propagate_variance(op, sigma2)
    print(f"propagate_variance: {sigma2.shape} -> {var_out.shape}, "
          f"max var ratio {float(var_out.max() / sigma2.max()):.3f} "
          "(averaging never amplifies noise)")

    # 11. Volumetric: conservative N-D resize (the reference is strictly
    #     2-D) — a CT/dose cube downsampled along all three axes, with a
    #     validity mask; plus a flux-conserving pyramid.
    ct = rng.uniform(0, 1, (40, 96, 96)).astype(np.float32)
    small = aa.area_resize_nd(ct, (10, 48, 48))
    print(f"area_resize_nd {ct.shape} -> {small.shape}: mean "
          f"{float(ct.mean()):.6f} -> {float(small.mean()):.6f}")
    body = np.ones_like(ct)
    body[:, :10, :] = 0.0  # couch rows excluded from the average
    masked = aa.area_resize_nd(ct, (10, 48, 48), mask=body)
    print(f"masked volumetric resize: {int(np.isnan(np.asarray(masked)).sum())}"
          " fully-outside cells")
    levels = aa.area_pyramid(frames, 4)
    print("area_pyramid levels:", [tuple(l.shape[-2:]) for l in levels],
          f"means all {float(levels[-1].mean()):.6f}")

    # 12. uint8 serving: u8 frames stream u8-in -> u8-out end to end —
    #     no float copies of the video anywhere on the host side, and on
    #     TPU the kernel unpacks the bytes in-register (266 Gpixel/s at
    #     the 4K flagship; see BENCHMARKS.md).
    u8_frames = (rng.integers(0, 256, (256, 256), dtype=np.uint8)
                 for _ in range(6))
    u8_out = list(aa.stream_apply(op, u8_frames, batch=2, depth=2))
    print(f"u8 serving: 6 u8 frames -> {len(u8_out)} outputs, dtype "
          f"{u8_out[0].dtype}, shape {u8_out[0].shape}")

    # 13. One resize front door, method switchable per call:
    area = aa.resize(frames[0], (128, 96))             # conservative
    cubic = aa.resize(frames[0], (128, 96), method="bicubic")
    print(f"resize(method=): area mean {float(area.mean()):.6f} "
          f"(== source {float(frames[0].mean()):.6f}), bicubic mean "
          f"{float(cubic.mean()):.6f} (not conservative)")


if __name__ == "__main__":
    main()
