"""Host-side data transforms (numpy, channel-last).

Reimplements the reference transform registry (``src/data/transforms.py``):
Compose / ToTensor / Normalize / RandomCrop / RandomElasticDeformation /
RandomHorizontalFlip / RandomVerticalFlip / RandomCropPatch, operating on
tuples of channel-last numpy images.

Differences from the reference, by design:

* ``ToTensor`` produces float32 *numpy* arrays (device arrays are created once
  per batch by the loader, not per item) — the name is kept so the shipped
  YAML configs load unchanged.
* Randomness comes from an explicit ``numpy.random.Generator`` passed per call
  (``rng=`` kwarg) instead of global ``random`` state, so augmentation is a
  pure function of (epoch, item) and reproducible under any loader
  parallelism (see ``utils.seeding.item_rng``).
* ``RandomElasticDeformation`` uses a scipy B-spline displacement field
  (SimpleITK is not a dependency); same control-grid/σ/prob semantics.
"""
from __future__ import annotations

import numpy as np

from ..config import TRANSFORMS


def compose(transforms=None) -> "Compose":
    """Build a :class:`Compose` from a config list (reference ``transforms.py:10-28``)."""
    if transforms is None:
        return Compose([ToTensor()])
    built = []
    for t in transforms:
        cls = TRANSFORMS.get(t["name"])
        kwargs = t.get("kwargs")
        built.append(cls(**kwargs) if kwargs else cls())
    return Compose(built)


class BaseTransform:
    def __call__(self, *imgs, **kwargs):
        raise NotImplementedError

    def __repr__(self):
        return self.__class__.__name__

    @staticmethod
    def _check_ndim(imgs):
        if not all(isinstance(img, np.ndarray) for img in imgs):
            raise TypeError("every image entering this transform must be a numpy.ndarray")
        if not all(img.ndim == 3 for img in imgs) and not all(img.ndim == 4 for img in imgs):
            raise ValueError(
                "every image must be rank 3 (2D: H, W, C) or rank 4 (3D: H, W, D, C)"
            )

    @staticmethod
    def _rng(kwargs) -> np.random.Generator:
        rng = kwargs.get("rng")
        if rng is None:
            rng = np.random.default_rng()
        return rng


@TRANSFORMS.register()
class Compose(BaseTransform):
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, *imgs, **kwargs):
        for transform in self.transforms:
            imgs = transform(*imgs, **kwargs)
        if len(imgs) == 1:
            imgs = imgs[0]
        return imgs

    def __repr__(self):
        inner = "\n".join(f"    {t!r}" for t in self.transforms)
        return f"{self.__class__.__name__}(\n{inner}\n)"


@TRANSFORMS.register()
class ToTensor(BaseTransform):
    """Convert to float32 numpy (the device transfer happens at batch level)."""

    def __call__(self, *imgs, dtypes=None, **kwargs):
        if not all(isinstance(img, np.ndarray) for img in imgs):
            raise TypeError("every image entering this transform must be a numpy.ndarray")
        if dtypes:
            if len(dtypes) != len(imgs):
                raise ValueError("The number of the dtypes should be the same as the images.")
            return tuple(np.asarray(img, dtype=d) for img, d in zip(imgs, dtypes))
        return tuple(np.asarray(img, dtype=np.float32) for img in imgs)


@TRANSFORMS.register()
class Normalize(BaseTransform):
    """Per-channel (x - mean) / (std + 1e-10); image-level stats when means/stds
    omitted; ``normalize_tags`` exempts images (reference ``transforms.py:100-168``)."""

    def __init__(self, means=None, stds=None):
        if (means is None) != (stds is None):
            raise ValueError("Both the means and the standard deviations should have values or None.")
        if means is not None and len(means) != len(stds):
            raise ValueError("The number of the means should be the same as the standard deviations.")
        self.means = means
        self.stds = stds

    def __call__(self, *imgs, normalize_tags=None, **kwargs):
        if not all(isinstance(img, np.ndarray) for img in imgs):
            raise TypeError("every image entering this transform must be a numpy.ndarray")
        if normalize_tags:
            if len(normalize_tags) != len(imgs):
                raise ValueError("The number of the tags should be the same as the images.")
            if not all(tag in (True, False) for tag in normalize_tags):
                raise ValueError("normalize_tags must be booleans (True to normalize, False to pass through).")
        else:
            normalize_tags = [None] * len(imgs)

        out = []
        for img, tag in zip(imgs, normalize_tags):
            if tag is False:
                out.append(img)
                continue
            if self.means is None:
                axis = tuple(range(img.ndim - 1))
                means, stds = img.mean(axis=axis), img.std(axis=axis)
            else:
                means, stds = self.means, self.stds
            img = np.asarray(img, np.float32).copy()
            for c, mean, std in zip(range(img.shape[-1]), means, stds):
                img[..., c] = (img[..., c] - mean) / (std + 1e-10)
            out.append(img)
        return tuple(out)


def _crop_coords(rng, shape, size):
    if any(i - j < 0 for i, j in zip(shape, size)):
        raise ValueError(
            f"The image ({shape}) is smaller than the cropped size ({size}). "
            "Please use a smaller cropped size."
        )
    starts = [int(rng.integers(0, s - t + 1)) for s, t in zip(shape, size)]
    return [(s, s + t) for s, t in zip(starts, size)]


@TRANSFORMS.register()
class RandomCrop(BaseTransform):
    """Same random crop applied to every image (reference ``transforms.py:171-227``)."""

    def __init__(self, size):
        self.size = size

    def __call__(self, *imgs, **kwargs):
        self._check_ndim(imgs)
        ndim = imgs[0].ndim
        if ndim - 1 != len(self.size):
            raise ValueError(
                f"The dimensions of the cropped size should be the same as the image "
                f"({ndim - 1}). Got {len(self.size)}"
            )
        coords = _crop_coords(self._rng(kwargs), imgs[0].shape[:-1], self.size)
        slices = tuple(slice(a, b) for a, b in coords)
        return tuple(img[slices] for img in imgs)


@TRANSFORMS.register()
class RandomHorizontalFlip(BaseTransform):
    """np.flip over axis 1 with probability ``prob`` (reference ``transforms.py:321-345``)."""

    def __init__(self, prob=0.5):
        self.prob = max(0.0, min(prob, 1.0))

    def __call__(self, *imgs, **kwargs):
        self._check_ndim(imgs)
        if self._rng(kwargs).random() < self.prob:
            imgs = tuple(np.flip(img, 1) for img in imgs)
        return imgs


@TRANSFORMS.register()
class RandomVerticalFlip(BaseTransform):
    """np.flip over axis 0 with probability ``prob`` (reference ``transforms.py:348-372``)."""

    def __init__(self, prob=0.5):
        self.prob = max(0.0, min(prob, 1.0))

    def __call__(self, *imgs, **kwargs):
        self._check_ndim(imgs)
        if self._rng(kwargs).random() < self.prob:
            imgs = tuple(np.flip(img, 0) for img in imgs)
        return imgs


@TRANSFORMS.register()
class RandomCropPatch(BaseTransform):
    """SR-paired crop: first half of the tuple is LR, second half HR; HR crop is
    the LR crop scaled by ``ratio`` (reference ``transforms.py:375-450``)."""

    def __init__(self, size, ratio):
        self.size = size
        self.ratio = ratio

    def __call__(self, *imgs, **kwargs):
        self._check_ndim(imgs)
        ndim = imgs[0].ndim
        if ndim - 1 != len(self.size):
            raise ValueError(
                f"The dimensions of the cropped size should be the same as the image "
                f"({ndim - 1}). Got {len(self.size)}"
            )
        if len(imgs) % 2 == 1:
            raise ValueError("The number of the LR images should be the same as the HR images")
        lr_imgs, hr_imgs = imgs[: len(imgs) // 2], imgs[len(imgs) // 2 :]
        if not all(
            j // i == self.ratio
            for lr, hr in zip(lr_imgs, hr_imgs)
            for i, j in zip(lr.shape[:-1], hr.shape[:-1])
        ):
            raise ValueError(
                f"The ratio between the HR images and the LR images should be {self.ratio}."
            )
        coords = _crop_coords(self._rng(kwargs), lr_imgs[0].shape[:-1], self.size)
        if ndim == 3:
            (h0, hn), (w0, wn) = coords
            r = self.ratio
            return tuple(
                [img[h0:hn, w0:wn] for img in lr_imgs]
                + [img[h0 * r : hn * r, w0 * r : wn * r] for img in hr_imgs]
            )
        # 3D: depth axis is NOT scaled (reference transforms.py:419-425).
        (h0, hn), (w0, wn), (d0, dn) = coords
        r = self.ratio
        return tuple(
            [img[h0:hn, w0:wn, d0:dn] for img in lr_imgs]
            + [img[h0 * r : hn * r, w0 * r : wn * r, d0:dn] for img in hr_imgs]
        )


@TRANSFORMS.register()
class RandomElasticDeformation(BaseTransform):
    """Random B-spline elastic deformation (reference ``transforms.py:230-318``).

    A coarse ``num_ctrl_points``-per-axis grid of N(0, σ²) displacements is
    upsampled to a dense field with cubic spline interpolation and applied via
    ``scipy.ndimage.map_coordinates`` — the same class of deformation as the
    reference's SimpleITK BSplineTransform, without the SimpleITK dependency.
    """

    def __init__(self, do_z_deformation=False, num_ctrl_points=4, sigma=15, prob=0.5):
        self.do_z_deformation = do_z_deformation
        self.num_ctrl_points = max(num_ctrl_points, 2)
        self.sigma = max(sigma, 1)
        self.prob = max(0.0, min(prob, 1.0))

    def _coarse_fields(self, rng, ndim):
        """One coarse N(0, σ²) control grid per axis, drawn ONCE per call so
        every image in the tuple sees the same deformation.  ``None`` marks a
        frozen axis: the reference ``params[0:len//3] = 0`` zeroes ITK
        dimension 0 = the numpy LAST spatial axis (GetImageFromArray reverses
        axis order), i.e. the depth/slice axis of an (H, W, D) volume —
        slices stay rigid along z while in-plane deformation applies."""
        return [
            None
            if ndim == 3 and axis == 2 and not self.do_z_deformation
            else rng.normal(0.0, self.sigma, size=(self.num_ctrl_points,) * ndim)
            for axis in range(ndim)
        ]

    @staticmethod
    def _dense_from_coarse(coarse, spatial_shape, scales):
        from scipy.ndimage import zoom

        fields = []
        for axis, c in enumerate(coarse):
            if c is None:
                fields.append(np.zeros(spatial_shape, np.float32))
                continue
            factors = [s / cs for s, cs in zip(spatial_shape, c.shape)]
            dense = zoom(c, factors, order=3, mode="nearest") * scales[axis]
            fields.append(dense.astype(np.float32))
        return fields

    def _dense_field(self, rng, spatial_shape):
        """Dense per-axis displacement fields at ``spatial_shape``."""
        coarse = self._coarse_fields(rng, len(spatial_shape))
        return self._dense_from_coarse(coarse, spatial_shape, [1.0] * len(spatial_shape))

    def __call__(self, *imgs, elastic_deformation_orders=None, **kwargs):
        self._check_ndim(imgs)
        rng = self._rng(kwargs)
        if rng.random() >= self.prob:
            return imgs
        # ONE deformation for the whole tuple, realized on EACH image's own
        # grid with displacements scaled by its size ratio to imgs[0] — LR
        # and HR keep their shapes AND stay geometrically aligned.  (The
        # reference's SimpleITK path also preserves shapes, but its transform
        # support covers only imgs[0]'s physical extent, so most of a larger
        # HR image is left undeformed — misaligned from its LR; geometric
        # consistency is the semantically required behavior for SR pairs.)
        base_shape = imgs[0].shape[:-1]
        coarse = self._coarse_fields(rng, len(base_shape))
        orders = elastic_deformation_orders or [3] * len(imgs)

        from scipy.ndimage import map_coordinates

        coords_cache: dict = {}
        out = []
        for img, order in zip(imgs, orders):
            if order not in (0, 1, 3):
                raise ValueError(f"The interpolation order should be 0, 1 or 3. Got {order}.")
            spatial_shape = img.shape[:-1]
            if spatial_shape not in coords_cache:
                scales = [s / b for s, b in zip(spatial_shape, base_shape)]
                fields = self._dense_from_coarse(coarse, spatial_shape, scales)
                grid = np.meshgrid(
                    *[np.arange(s, dtype=np.float32) for s in spatial_shape],
                    indexing="ij",
                )
                coords_cache[spatial_shape] = [g + f for g, f in zip(grid, fields)]
            coords = coords_cache[spatial_shape]
            channels = [
                map_coordinates(img[..., c], coords, order=order, mode="constant", cval=0.0)
                for c in range(img.shape[-1])
            ]
            out.append(np.stack(channels, axis=-1).astype(img.dtype))
        return tuple(out)
