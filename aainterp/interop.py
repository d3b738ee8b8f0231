"""Zero-copy interop with PyTorch (and any DLPack producer).

The reference is a standalone C++ program fed by CSV files
(Source.cpp:1216-1320); real resampling pipelines live inside training /
serving stacks whose tensors are often torch.  This module bridges them
without host copies: torch CPU/CUDA tensors and jax arrays both speak
DLPack, so ``apply_operator_torch`` runs the same jitted TPU/XLA applies
on data that starts and ends life as torch tensors.

Torch is an OPTIONAL dependency: importing this module without torch
installed raises only when a torch<->jax conversion is actually used.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _torch():
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "aainterp.interop needs torch for torch<->jax bridging "
            "(pip install torch)") from e
    return torch


def from_torch(tensor) -> jax.Array:
    """torch.Tensor -> jax.Array via DLPack (zero-copy on shared
    platforms; torch CUDA tensors destined for TPU fall back to a host
    transfer).  Non-contiguous tensors are made contiguous first (DLPack
    requires it)."""
    torch = _torch()
    t = tensor.detach()
    if not t.is_contiguous():
        t = t.contiguous()
    try:
        return jnp.from_dlpack(t)
    except Exception:
        # cross-device (e.g. torch CUDA -> TPU backend): stage via host
        return jnp.asarray(t.cpu().numpy())


def to_torch(array: jax.Array):
    """jax.Array -> torch.Tensor via DLPack.  TPU-backed arrays are
    fetched to host first (torch has no TPU device); CPU arrays share
    memory."""
    torch = _torch()
    arr = jax.block_until_ready(array)
    if arr.devices() and next(iter(arr.devices())).platform not in (
            "cpu", "cuda", "gpu"):
        import numpy as np

        return torch.from_numpy(np.asarray(arr))
    return torch.from_dlpack(arr)


def apply_operator_torch(op, tensor, **kwargs):
    """``aa.apply_operator`` on a torch tensor, returning a torch tensor.

    Accepts every apply_operator knob (impl=, weight_dtype=,
    differentiable=...).  The compute runs under jax (Pallas on TPU);
    only the array protocol crosses the framework boundary.
    """
    from .api import apply_operator

    return to_torch(apply_operator(op, from_torch(tensor), **kwargs))
