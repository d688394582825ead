"""Minimal multidimensional-array views (GDALMDArray analogue).

The reference exposes N-D arrays whose ``GetView`` returns LAZY slicing /
transpose views composed without copying (``gcore/gdalmultidim.cpp``
GetView / Transpose, ``gcore/gdal_priv.h:4315`` GDALMDArray). This module
keeps that defining property — a view is (base, per-dim window, axis
permutation), composition folds windows, and only ``read()`` touches
pixels — in a form a Ray stage can ship cheaply (views are tiny tuples;
the base array decodes once per actor).

Index semantics mirror GDALMDArray::GetView's slice grammar: each dim
takes ``start:stop:step`` with step > 0; integer indexes drop the dim
(like ``SliceArray`` squeezing).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = ["MDArray"]


@dataclass(frozen=True)
class _Dim:
    start: int
    count: int
    step: int


@dataclass(frozen=True)
class MDArray:
    """An N-D array plus a lazy (window, permutation) view state."""

    base: np.ndarray
    dims: tuple[_Dim, ...] = field(default=None)  # type: ignore[assignment]
    perm: tuple[int, ...] = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        if self.dims is None:
            object.__setattr__(
                self,
                "dims",
                tuple(_Dim(0, n, 1) for n in self.base.shape),
            )
        if self.perm is None:
            object.__setattr__(self, "perm", tuple(range(len(self.dims))))

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(self.dims[a].count for a in self.perm)

    def view(self, *slices) -> "MDArray":
        """Compose a per-dim slice view (GetView semantics, step > 0).

        Each element of ``slices`` is a ``slice`` or ``int`` (squeezes the
        dim), applied in the CURRENT (possibly transposed) dim order;
        omitted trailing dims pass through whole.
        """
        new_axes: list[int] = []
        folded: dict[int, _Dim] = {}
        squeeze: set[int] = set()
        for i, ax in enumerate(self.perm):
            d = self.dims[ax]
            s = slices[i] if i < len(slices) else slice(None)
            if isinstance(s, int):
                if not -d.count <= s < d.count:
                    raise IndexError(f"index {s} out of range for dim of {d.count}")
                off = s % d.count
                folded[ax] = _Dim(d.start + off * d.step, 1, d.step)
                squeeze.add(ax)
                continue
            start, stop, step = s.indices(d.count)
            if step <= 0:
                raise ValueError("GetView steps must be positive")
            count = max(0, (stop - start + step - 1) // step)
            folded[ax] = _Dim(d.start + start * d.step, count, d.step * step)
            new_axes.append(ax)
        dims = tuple(folded.get(ax, self.dims[ax]) for ax in range(len(self.dims)))
        perm = tuple(ax for ax in self.perm if ax not in squeeze)
        if squeeze:
            # dims for squeezed axes are kept (count 1) but dropped from perm;
            # renumber into a dense dim tuple so read() stays simple
            keep = [ax for ax in range(len(dims)) if ax not in squeeze]
            remap = {ax: j for j, ax in enumerate(keep)}
            dims = tuple(dims[ax] for ax in keep)
            base = self._collapse(folded, squeeze)
            perm = tuple(remap[ax] for ax in perm)
            return MDArray(base, dims, perm)
        return MDArray(self.base, dims, perm)

    def _collapse(self, folded: dict[int, _Dim], squeeze: set[int]) -> np.ndarray:
        """Materialize integer-indexed dims out of the base (rare path)."""
        idx = []
        for ax in range(self.base.ndim):
            if ax in squeeze:
                idx.append(folded[ax].start)
            else:
                idx.append(slice(None))
        return self.base[tuple(idx)]

    def transpose(self, axes: tuple[int, ...]) -> "MDArray":
        """Permute the view's dims (GDALMDArray::Transpose); lazy."""
        if sorted(axes) != list(range(len(self.perm))):
            raise ValueError(f"bad permutation {axes}")
        return MDArray(self.base, self.dims, tuple(self.perm[a] for a in axes))

    def read(self) -> np.ndarray:
        """Materialize the view (the only pixel-touching call)."""
        idx = tuple(
            slice(d.start, d.start + d.count * d.step, d.step) for d in self.dims
        )
        arr = self.base[idx]
        return np.ascontiguousarray(np.transpose(arr, self.perm))

    def reduce(self, op: str, axis: int) -> np.ndarray:
        """Axis reduction over the materialized view (mean/max/min/sum)."""
        fn = {"mean": np.mean, "max": np.max, "min": np.min, "sum": np.sum}[op]
        return fn(self.read(), axis=axis)

    def resampled(self, new_h: int, new_w: int, resampling: str = "nearest") -> "MDArray":
        """GetResampled analogue (``gcore/gdalmultidim.cpp``
        GDALMDArray::GetResampled): resample the LAST TWO dims of the view
        to (new_h, new_w) with the shared raster kernels (nearest /
        bilinear — GRIORA pixel-center rules, ``raster/kernels.py``).
        Leading dims are preserved (each leading slice resamples
        independently). Returns a fresh MDArray over the resampled pixels
        (the reference's is lazy per-read; a read materializes identically,
        and composing further views/transposes on the result is free)."""
        from gdal_ray.raster.kernels import resample_bilinear, resample_nearest

        if len(self.shape) < 2:
            raise ValueError("GetResampled needs at least 2 dims")
        fn = {"nearest": resample_nearest, "bilinear": resample_bilinear}.get(resampling)
        if fn is None:
            raise ValueError(f"unsupported resampling {resampling!r}")
        arr = self.read()
        lead = arr.shape[:-2]
        flat = arr.reshape((-1,) + arr.shape[-2:])
        out = np.stack([fn(flat[i], new_h, new_w) for i in range(flat.shape[0])])
        return MDArray(out.reshape(lead + (new_h, new_w)))
