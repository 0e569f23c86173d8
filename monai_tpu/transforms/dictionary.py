"""Dictionary (keyed) versions of all transform families.

Parity targets: the ``dictionary.py`` of each reference family
(monai/transforms/{spatial,croppad,intensity,utility,io,post}/dictionary.py).
Naming convention matches the reference: ``<Name>d`` suffix, with ``D``/``Dict``
aliases exported from the package ``__init__``.

Randomized dict transforms randomize ONCE per call and apply the same parameters to
every key (matching the reference's shared-randomness semantics).
"""
from __future__ import annotations

from collections.abc import Callable, Hashable, Mapping, Sequence
from typing import Any

import numpy as np

from ..config.type_definitions import KeysCollection
from ..data.meta_image import MetaImage
from ..utils.enums import PostFix, TraceKeys
from ..utils.misc import ensure_tuple, ensure_tuple_rep, fall_back_tuple
from .compose import Compose
from .croppad_array import (
    BorderPad,
    BoundingRect,
    CenterScaleCrop,
    CenterSpatialCrop,
    Crop,
    CropForeground,
    DivisiblePad,
    Pad,
    RandCropByLabelClasses,
    RandCropByPosNegLabel,
    RandScaleCrop,
    RandSpatialCrop,
    RandWeightedCrop,
    ResizeWithPadOrCrop,
    SpatialCrop,
    SpatialPad,
)
from .intensity_array import (
    AdjustContrast,
    ClipIntensityPercentiles,
    ComputeHoVerMaps,
    DetectEnvelope,
    ForegroundMask,
    GaussianSharpen,
    GaussianSmooth,
    GibbsNoise,
    HistogramNormalize,
    KSpaceSpikeNoise,
    MaskIntensity,
    MedianSmooth,
    NormalizeIntensity,
    RandAdjustContrast,
    RandBiasField,
    RandCoarseDropout,
    RandCoarseShuffle,
    RandGaussianNoise,
    RandGaussianSharpen,
    RandGaussianSmooth,
    RandGibbsNoise,
    RandHistogramShift,
    RandKSpaceSpikeNoise,
    RandRicianNoise,
    RandScaleIntensity,
    RandShiftIntensity,
    RandStdShiftIntensity,
    SavitzkyGolaySmooth,
    ScaleIntensity,
    ScaleIntensityFixedMean,
    ScaleIntensityRange,
    ScaleIntensityRangePercentiles,
    ShiftIntensity,
    StdShiftIntensity,
    ThresholdIntensity,
)
from .inverse import InvertibleTransform, TraceableTransform
from .io_array import LoadImage, SaveImage
from .post_array import (
    Activations,
    AsDiscrete,
    DistanceTransformEDT,
    Ensemble,
    FillHoles,
    KeepLargestConnectedComponent,
    LabelToContour,
    MeanEnsemble,
    ProbNMS,
    RemoveSmallObjects,
    SobelGradients,
    VoteEnsemble,
)
from .spatial_array import (
    Affine,
    Flip,
    GridDistortion,
    Orientation,
    Rand2DElastic,
    Rand3DElastic,
    RandAffine,
    RandAxisFlip,
    RandFlip,
    RandGridDistortion,
    RandRotate,
    RandRotate90,
    RandSimulateLowResolution,
    RandZoom,
    Resize,
    ResampleToMatch,
    Rotate,
    Rotate90,
    SpatialResample,
    Spacing,
    Zoom,
)
from .transform import LazyTransform, MapTransform, Randomizable, RandomizableTransform
from .traits import LazyTrait, MultiSampleTrait
from .utility_array import (
    AddCoordinateChannels,
    AddExtremePointsChannel,
    ApplyTransformToPoints,
    AsChannelLast,
    CastToType,
    ClassesToIndices,
    ConvertToMultiChannelBasedOnBratsClasses,
    DataStats,
    EnsureChannelFirst,
    EnsureType,
    FgBgToIndices,
    Identity,
    IntensityStats,
    LabelToMask,
    Lambda,
    MapLabelValue,
    RemoveRepeatedChannel,
    RepeatChannel,
    SimulateDelay,
    SplitDim,
    SqueezeDim,
    ToDevice,
    ToJax,
    ToNumpy,
    Transpose,
)

__all__: list[str] = []  # populated at bottom


class _MappedTransform(MapTransform, InvertibleTransform):
    """Apply a per-key array transform; params may be per-key sequences."""

    def __init__(self, keys: KeysCollection, transform, allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.t = transform

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.t(d[key])
        return d

    def inverse(self, data: Mapping) -> dict:
        d = dict(data)
        if isinstance(self.t, InvertibleTransform):
            for key in self.key_iterator(d):
                d[key] = self.t.inverse(d[key])
        return d


def _mapped(name: str, array_cls, doc_ref: str = "", lazy: bool = False, call_kwargs: tuple = ()):
    """Generate a ``<Name>d`` class wrapping ``array_cls`` one-instance-per-keys."""

    per_key_args = set(call_kwargs)

    class _D(MapTransform, InvertibleTransform):
        def __init__(self, keys: KeysCollection, allow_missing_keys: bool = False, **kwargs):
            MapTransform.__init__(self, keys, allow_missing_keys)
            n = len(self.keys)
            self._per_key = {}
            for k in list(kwargs.keys()):
                if k in per_key_args:
                    self._per_key[k] = ensure_tuple_rep(kwargs.pop(k), n)
            if lazy:
                self._lazy_init = kwargs.pop("lazy", False)
                self.t = array_cls(**kwargs, lazy=self._lazy_init)
            else:
                kwargs.pop("lazy", None)
                self.t = array_cls(**kwargs)

        @property
        def lazy(self):
            return getattr(self.t, "lazy", False)

        @lazy.setter
        def lazy(self, val):
            if hasattr(self.t, "lazy"):
                self.t.lazy = val

        def __call__(self, data: Mapping, lazy: bool | None = None) -> dict:
            d = dict(data)
            for i, key in enumerate(self.key_iterator(d)):
                kw = {k: v[i] for k, v in self._per_key.items()}
                if isinstance(self.t, LazyTrait):
                    d[key] = self.t(d[key], lazy=lazy, **kw)
                else:
                    d[key] = self.t(d[key], **kw)
            return d

        def inverse(self, data: Mapping) -> dict:
            d = dict(data)
            if isinstance(self.t, InvertibleTransform):
                for key in self.key_iterator(d):
                    d[key] = self.t.inverse(d[key])
            return d

    _D.__name__ = name
    _D.__qualname__ = name
    _D.__doc__ = f"Dictionary wrapper of :class:`{array_cls.__name__}` ({doc_ref})."
    return _D


def _mapped_rand(name: str, array_cls, doc_ref: str = "", lazy: bool = False, call_kwargs: tuple = (),
                 randomize_arg: bool = True):
    """Generate a randomized ``<Name>d``: randomize once, apply to all keys."""

    per_key_args = set(call_kwargs)

    class _RD(MapTransform, RandomizableTransform, InvertibleTransform):
        def __init__(self, keys: KeysCollection, allow_missing_keys: bool = False, **kwargs):
            MapTransform.__init__(self, keys, allow_missing_keys)
            n = len(self.keys)
            self._per_key = {}
            for k in list(kwargs.keys()):
                if k in per_key_args:
                    self._per_key[k] = ensure_tuple_rep(kwargs.pop(k), n)
            if lazy:
                kwargs.setdefault("lazy", False)
            else:
                kwargs.pop("lazy", None)
            self.t = array_cls(**kwargs)

        @property
        def lazy(self):
            return getattr(self.t, "lazy", False)

        @lazy.setter
        def lazy(self, val):
            if hasattr(self.t, "lazy"):
                self.t.lazy = val

        def set_random_state(self, seed=None, state=None):
            self.t.set_random_state(seed, state)
            Randomizable.set_random_state(self, seed, state)
            return self

        def randomize(self, data=None) -> None:
            self.t.randomize(data)

        def _randomize_t(self, arr) -> bool:
            """Drive the wrapped transform's randomize(); returns True when it must
            instead happen inside the first per-key call (extra-arg protocols).
            Subclasses override this when the reference DICT transform consumes the
            RNG stream in a different order than its array counterpart."""
            import inspect

            params = list(inspect.signature(self.t.randomize).parameters.values())
            pname = params[0].name if params else None
            try:
                if pname in ("img_size", "spatial_size", "spatial_shape", "grid_size"):
                    self.t.randomize(arr.shape[1:])
                elif pname is None:
                    self.t.randomize()
                else:
                    self.t.randomize(arr)
            except TypeError:
                # randomize() needs transform-specific extra args (e.g.
                # RandKSpaceSpikeNoise): let the first per-key __call__ do it
                return True
            return False

        def __call__(self, data: Mapping, lazy: bool | None = None) -> dict:
            d = dict(data)
            first_key = self.first_key(d)
            if first_key == ():
                return d
            # randomize once using the first key's data; some randomize() protocols
            # take the spatial shape instead of the array (e.g. RandCoarseTransform,
            # RandBiasField — reference intensity/dictionary.py passes shape[1:])
            first_item = d[first_key]
            arr = first_item.data if isinstance(first_item, MetaImage) else first_item
            randomize_in_first_call = self._randomize_t(arr)
            for i, key in enumerate(self.key_iterator(d)):
                kw = {k: v[i] for k, v in self._per_key.items()}
                rnd = randomize_in_first_call and key == first_key
                if isinstance(self.t, LazyTrait):
                    d[key] = self.t(d[key], randomize=rnd, lazy=lazy, **kw)
                else:
                    d[key] = self.t(d[key], randomize=rnd, **kw)
            return d

        def inverse(self, data: Mapping) -> dict:
            d = dict(data)
            if isinstance(self.t, InvertibleTransform):
                for key in self.key_iterator(d):
                    d[key] = self.t.inverse(d[key])
            return d

    _RD.__name__ = name
    _RD.__qualname__ = name
    _RD.__doc__ = f"Dictionary wrapper of :class:`{array_cls.__name__}` ({doc_ref}); shared randomness across keys."
    return _RD


# ---------------------------------------------------------------------------
# spatial dictionary transforms (reference: monai/transforms/spatial/dictionary.py)
# ---------------------------------------------------------------------------

Spacingd = _mapped("Spacingd", Spacing, "spatial/dictionary.py:305", lazy=True,
                   call_kwargs=("mode", "padding_mode", "align_corners", "dtype"))
Orientationd = _mapped("Orientationd", Orientation, "spatial/dictionary.py:442", lazy=True)
Flipd = _mapped("Flipd", Flip, "spatial/dictionary.py:683", lazy=True)
Rotate90d = _mapped("Rotate90d", Rotate90, "spatial/dictionary.py:518", lazy=True)
Resized = _mapped("Resized", Resize, "spatial/dictionary.py:782", lazy=True,
                  call_kwargs=("mode", "align_corners"))
Rotated = _mapped("Rotated", Rotate, "spatial/dictionary.py:1145", lazy=True,
                  call_kwargs=("mode", "padding_mode", "align_corners", "dtype"))
Zoomd = _mapped("Zoomd", Zoom, "spatial/dictionary.py:1388", lazy=True,
                call_kwargs=("mode", "padding_mode", "align_corners", "dtype"))
SpatialResampled = _mapped("SpatialResampled", SpatialResample, "spatial/dictionary.py:155", lazy=True,
                           call_kwargs=("mode", "padding_mode", "align_corners", "dtype"))

RandFlipd = _mapped_rand("RandFlipd", RandFlip, "spatial/dictionary.py:715", lazy=True)
RandAxisFlipd = _mapped_rand("RandAxisFlipd", RandAxisFlip, "spatial/dictionary.py:748", lazy=True)
_RandRotate90dBase = _mapped_rand("RandRotate90d", RandRotate90, "spatial/dictionary.py:556", lazy=True)


class RandRotate90d(_RandRotate90dBase):  # type: ignore[valid-type,misc]
    """Dict RandRotate90; the reference DICT version samples k BEFORE the prob draw
    and unconditionally (spatial/dictionary.py:556 randomize) — mirror that order."""

    def _randomize_t(self, arr) -> bool:
        self.t._rand_k = self.t.R.randint(self.t.max_k) + 1
        RandomizableTransform.randomize(self.t, None)
        return False
RandRotated = _mapped_rand("RandRotated", RandRotate, "spatial/dictionary.py:1201", lazy=True,
                           call_kwargs=("mode", "padding_mode", "align_corners", "dtype"))
RandZoomd = _mapped_rand("RandZoomd", RandZoom, "spatial/dictionary.py:1447", lazy=True,
                         call_kwargs=("mode", "padding_mode", "align_corners", "dtype"))
_RandAffinedBase = _mapped_rand("RandAffined", RandAffine, "spatial/dictionary.py:—", lazy=True,
                                call_kwargs=("mode", "padding_mode"))


class RandAffined(_RandAffinedBase):  # type: ignore[valid-type,misc]
    """Dict RandAffine. The reference dict class draws its own prob sample and wraps
    an internal RandAffine(prob=1.0), re-randomizing the grid a second time when the
    transform fires (spatial/dictionary.py:90-151) — mirror that RNG order."""

    def __init__(self, *args, **kwargs):
        self._dict_prob = float(kwargs.get("prob", 0.1))
        super().__init__(*args, **kwargs)

    def _randomize_t(self, arr) -> bool:
        self._do_transform = self.R.rand() < self._dict_prob  # dict-level prob, own R
        self.t.R.rand()  # the internal prob-1 RandAffine still consumes a draw
        self.t.rand_affine_grid.randomize()
        if self._do_transform:
            self.t.rand_affine_grid.randomize()  # drawn again while building the grid
        self.t._do_transform = self._do_transform
        return False
Affined = _mapped("Affined", Affine, "spatial/dictionary.py:—", lazy=True,
                  call_kwargs=("mode", "padding_mode"))
RandGridDistortiond = _mapped_rand("RandGridDistortiond", RandGridDistortion, "spatial/dictionary.py:—",
                                   call_kwargs=("mode", "padding_mode"))
Rand2DElasticd = _mapped_rand("Rand2DElasticd", Rand2DElastic, "spatial/dictionary.py:—",
                              call_kwargs=("mode", "padding_mode"))
Rand3DElasticd = _mapped_rand("Rand3DElasticd", Rand3DElastic, "spatial/dictionary.py:—",
                              call_kwargs=("mode", "padding_mode"))
RandSimulateLowResolutiond = _mapped_rand("RandSimulateLowResolutiond", RandSimulateLowResolution,
                                          "spatial/dictionary.py:—")


class ResampleToMatchd(MapTransform, InvertibleTransform):
    """Resample keys onto the grid of ``key_dst`` (reference: spatial/dictionary.py:236)."""

    def __init__(self, keys: KeysCollection, key_dst: str, mode="bilinear", padding_mode="border",
                 align_corners=False, dtype=np.float64, allow_missing_keys: bool = False, lazy: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.key_dst = key_dst
        self.mode = ensure_tuple_rep(mode, len(self.keys))
        self.padding_mode = ensure_tuple_rep(padding_mode, len(self.keys))
        self.t = ResampleToMatch(lazy=lazy)

    def __call__(self, data: Mapping, lazy: bool | None = None) -> dict:
        d = dict(data)
        dst = d[self.key_dst]
        for key, m, pm in self.key_iterator(d, self.mode, self.padding_mode):
            d[key] = self.t(d[key], img_dst=dst, mode=m, padding_mode=pm, lazy=lazy)
        return d

    def inverse(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.t.inverse(d[key])
        return d


# ---------------------------------------------------------------------------
# croppad dictionary transforms (reference: monai/transforms/croppad/dictionary.py)
# ---------------------------------------------------------------------------

SpatialPadd = _mapped("SpatialPadd", SpatialPad, "croppad/dictionary.py:140", lazy=True,
                      call_kwargs=("mode",))
BorderPadd = _mapped("BorderPadd", BorderPad, "croppad/dictionary.py:184", lazy=True,
                     call_kwargs=("mode",))
DivisiblePadd = _mapped("DivisiblePadd", DivisiblePad, "croppad/dictionary.py:229", lazy=True,
                        call_kwargs=("mode",))
SpatialCropd = _mapped("SpatialCropd", SpatialCrop, "croppad/dictionary.py:324", lazy=True)
CenterSpatialCropd = _mapped("CenterSpatialCropd", CenterSpatialCrop, "croppad/dictionary.py:364", lazy=True)
CenterScaleCropd = _mapped("CenterScaleCropd", CenterScaleCrop, "croppad/dictionary.py:398", lazy=True)
ResizeWithPadOrCropd = _mapped("ResizeWithPadOrCropd", ResizeWithPadOrCrop, "croppad/dictionary.py:—",
                               lazy=True, call_kwargs=("mode",))
RandSpatialCropd = _mapped_rand("RandSpatialCropd", RandSpatialCrop, "croppad/dictionary.py:431", lazy=True)
RandScaleCropd = _mapped_rand("RandScaleCropd", RandScaleCrop, "croppad/dictionary.py:487", lazy=True)


class CropForegroundd(MapTransform, InvertibleTransform):
    """Crop all keys by the foreground box of ``source_key``
    (reference: croppad/dictionary.py:631)."""

    def __init__(self, keys: KeysCollection, source_key: str, select_fn: Callable = None,
                 channel_indices=None, margin=0, allow_smaller: bool = True, k_divisible=1,
                 mode="constant", start_coord_key: str = "foreground_start_coord",
                 end_coord_key: str = "foreground_end_coord", allow_missing_keys: bool = False,
                 lazy: bool = False, **pad_kwargs):
        MapTransform.__init__(self, keys, allow_missing_keys)
        from .utils import is_positive

        self.source_key = source_key
        self.start_coord_key = start_coord_key
        self.end_coord_key = end_coord_key
        self.cropper = CropForeground(select_fn=select_fn or is_positive, channel_indices=channel_indices,
                                      margin=margin, allow_smaller=allow_smaller, k_divisible=k_divisible,
                                      lazy=lazy, **pad_kwargs)
        self.mode = ensure_tuple_rep(mode, len(self.keys))

    @property
    def lazy(self):
        return self.cropper.lazy

    @lazy.setter
    def lazy(self, value):
        self.cropper.lazy = value

    def __call__(self, data: Mapping, lazy: bool | None = None) -> dict:
        d = dict(data)
        box_start, box_end = self.cropper.compute_bounding_box(img=d[self.source_key])
        if self.start_coord_key is not None:
            d[self.start_coord_key] = box_start
        if self.end_coord_key is not None:
            d[self.end_coord_key] = box_end
        for key, m in self.key_iterator(d, self.mode):
            d[key] = self.cropper.crop_pad(img=d[key], box_start=box_start, box_end=box_end, mode=m,
                                           lazy=lazy)
        return d

    def inverse(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.cropper.inverse(d[key])
        return d


class RandSpatialCropSamplesd(Randomizable, MapTransform, MultiSampleTrait):
    """N random crops over all keys. The reference draws a per-call sub-seed and
    re-seeds the multi-sample cropper for EVERY key so the crops line up
    (croppad/dictionary.py:531)."""

    def __init__(self, keys: KeysCollection, roi_size, num_samples: int, max_roi_size=None,
                 random_center: bool = True, random_size: bool = False,
                 allow_missing_keys: bool = False, lazy: bool = False):
        from ..utils.prng import MAX_SEED
        from .croppad_array import RandSpatialCropSamples

        self._max_seed = MAX_SEED
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.num_samples = num_samples
        self.cropper = RandSpatialCropSamples(roi_size, num_samples, max_roi_size,
                                              random_center, random_size, lazy=lazy)
        self.sub_seed = 0

    def randomize(self, data=None) -> None:
        self.sub_seed = int(self.R.randint(self._max_seed, dtype="uint32"))

    def __call__(self, data: Mapping, lazy: bool | None = None) -> list[dict]:
        from copy import deepcopy

        d = dict(data)
        ret: list[dict] = [dict(d) for _ in range(self.num_samples)]
        for i in range(self.num_samples):
            for key in set(d.keys()).difference(set(self.keys)):
                ret[i][key] = deepcopy(d[key])
        self.randomize()
        for key in self.key_iterator(d):
            self.cropper.set_random_state(seed=self.sub_seed)
            for i, im in enumerate(self.cropper(d[key], lazy=lazy)):
                if isinstance(im, MetaImage):
                    im.meta["patch_index"] = i
                ret[i][key] = im
        return ret


class RandWeightedCropd(Randomizable, MapTransform, MultiSampleTrait):
    """Weighted crops over all keys (reference: croppad/dictionary.py:—)."""

    def __init__(self, keys: KeysCollection, w_key: str, spatial_size, num_samples: int = 1,
                 allow_missing_keys: bool = False, lazy: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.w_key = w_key
        self.cropper = RandWeightedCrop(spatial_size, num_samples, lazy=lazy)

    def set_random_state(self, seed=None, state=None):
        super().set_random_state(seed, state)
        self.cropper.set_random_state(state=self.R)
        return self

    def randomize(self, weight_map) -> None:
        self.cropper.randomize(weight_map)

    def __call__(self, data: Mapping, lazy: bool | None = None) -> list[dict]:
        d = dict(data)
        self.randomize(d[self.w_key])
        ret: list[dict] = [dict(d) for _ in range(self.cropper.num_samples)]
        for key in self.key_iterator(d):
            for i, im in enumerate(self.cropper(d[key], weight_map=d[self.w_key], randomize=False, lazy=lazy)):
                ret[i][key] = im
        return ret


class RandCropByPosNegLabeld(Randomizable, MapTransform, MultiSampleTrait):
    """Balanced crops over all keys (reference: croppad/dictionary.py:1075)."""

    def __init__(self, keys: KeysCollection, label_key: str, spatial_size, pos: float = 1.0,
                 neg: float = 1.0, num_samples: int = 1, image_key: str | None = None,
                 image_threshold: float = 0.0, fg_indices_key: str | None = None,
                 bg_indices_key: str | None = None, allow_smaller: bool = False,
                 allow_missing_keys: bool = False, lazy: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.label_key = label_key
        self.image_key = image_key
        self.fg_indices_key = fg_indices_key
        self.bg_indices_key = bg_indices_key
        self.cropper = RandCropByPosNegLabel(spatial_size=spatial_size, pos=pos, neg=neg,
                                             num_samples=num_samples, image_threshold=image_threshold,
                                             allow_smaller=allow_smaller, lazy=lazy)

    def set_random_state(self, seed=None, state=None):
        super().set_random_state(seed, state)
        self.cropper.set_random_state(state=self.R)
        return self

    def randomize(self, label, fg_indices=None, bg_indices=None, image=None) -> None:
        self.cropper.randomize(label=label, fg_indices=fg_indices, bg_indices=bg_indices, image=image)

    def __call__(self, data: Mapping, lazy: bool | None = None) -> list[dict]:
        d = dict(data)
        fg_indices = d.pop(self.fg_indices_key, None) if self.fg_indices_key is not None else None
        bg_indices = d.pop(self.bg_indices_key, None) if self.bg_indices_key is not None else None
        self.randomize(d[self.label_key], fg_indices, bg_indices,
                       d.get(self.image_key) if self.image_key else None)
        ret: list[dict] = [dict(d) for _ in range(self.cropper.num_samples)]
        for key in self.key_iterator(d):
            for i, im in enumerate(self.cropper(d[key], label=d[self.label_key], randomize=False, lazy=lazy)):
                ret[i][key] = im
        return ret


class RandCropByLabelClassesd(Randomizable, MapTransform, MultiSampleTrait):
    """Class-balanced crops over all keys (reference: croppad/dictionary.py:1232)."""

    def __init__(self, keys: KeysCollection, label_key: str, spatial_size, ratios=None,
                 num_classes: int | None = None, num_samples: int = 1, image_key: str | None = None,
                 image_threshold: float = 0.0, indices_key: str | None = None,
                 allow_smaller: bool = False, allow_missing_keys: bool = False, warn: bool = True,
                 max_samples_per_class: int | None = None, lazy: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.label_key = label_key
        self.image_key = image_key
        self.indices_key = indices_key
        self.cropper = RandCropByLabelClasses(spatial_size=spatial_size, ratios=ratios,
                                              num_classes=num_classes, num_samples=num_samples,
                                              image_threshold=image_threshold, allow_smaller=allow_smaller,
                                              warn=warn, max_samples_per_class=max_samples_per_class,
                                              lazy=lazy)

    def set_random_state(self, seed=None, state=None):
        super().set_random_state(seed, state)
        self.cropper.set_random_state(state=self.R)
        return self

    def __call__(self, data: Mapping, lazy: bool | None = None) -> list[dict]:
        d = dict(data)
        indices = d.pop(self.indices_key, None) if self.indices_key is not None else None
        self.cropper.randomize(d[self.label_key], indices,
                               d.get(self.image_key) if self.image_key else None)
        ret: list[dict] = [dict(d) for _ in range(self.cropper.num_samples)]
        for key in self.key_iterator(d):
            for i, im in enumerate(self.cropper(d[key], label=d[self.label_key], randomize=False, lazy=lazy)):
                ret[i][key] = im
        return ret


# ---------------------------------------------------------------------------
# intensity dictionary transforms
# ---------------------------------------------------------------------------

RandGaussianNoised = _mapped_rand("RandGaussianNoised", RandGaussianNoise, "intensity/dictionary.py:—")
RandRicianNoised = _mapped_rand("RandRicianNoised", RandRicianNoise, "intensity/dictionary.py:—")
ShiftIntensityd = _mapped("ShiftIntensityd", ShiftIntensity, "intensity/dictionary.py:—")
RandShiftIntensityd = _mapped_rand("RandShiftIntensityd", RandShiftIntensity, "intensity/dictionary.py:—")
StdShiftIntensityd = _mapped("StdShiftIntensityd", StdShiftIntensity, "intensity/dictionary.py:—")
RandStdShiftIntensityd = _mapped_rand("RandStdShiftIntensityd", RandStdShiftIntensity, "")
ScaleIntensityd = _mapped("ScaleIntensityd", ScaleIntensity, "intensity/dictionary.py:—")
RandScaleIntensityd = _mapped_rand("RandScaleIntensityd", RandScaleIntensity, "")
ScaleIntensityFixedMeand = _mapped("ScaleIntensityFixedMeand", ScaleIntensityFixedMean, "")
RandBiasFieldd = _mapped_rand("RandBiasFieldd", RandBiasField, "")
NormalizeIntensityd = _mapped("NormalizeIntensityd", NormalizeIntensity, "intensity/dictionary.py:—")
ThresholdIntensityd = _mapped("ThresholdIntensityd", ThresholdIntensity, "")
ScaleIntensityRanged = _mapped("ScaleIntensityRanged", ScaleIntensityRange, "intensity/dictionary.py:—")
ClipIntensityPercentilesd = _mapped("ClipIntensityPercentilesd", ClipIntensityPercentiles, "")
AdjustContrastd = _mapped("AdjustContrastd", AdjustContrast, "")
RandAdjustContrastd = _mapped_rand("RandAdjustContrastd", RandAdjustContrast, "")
ScaleIntensityRangePercentilesd = _mapped("ScaleIntensityRangePercentilesd", ScaleIntensityRangePercentiles, "")
MaskIntensityd = _mapped("MaskIntensityd", MaskIntensity, "")
GaussianSmoothd = _mapped("GaussianSmoothd", GaussianSmooth, "")
RandGaussianSmoothd = _mapped_rand("RandGaussianSmoothd", RandGaussianSmooth, "")
GaussianSharpend = _mapped("GaussianSharpend", GaussianSharpen, "")
RandGaussianSharpend = _mapped_rand("RandGaussianSharpend", RandGaussianSharpen, "")
RandHistogramShiftd = _mapped_rand("RandHistogramShiftd", RandHistogramShift, "")
GibbsNoised = _mapped("GibbsNoised", GibbsNoise, "")
RandGibbsNoised = _mapped_rand("RandGibbsNoised", RandGibbsNoise, "")
KSpaceSpikeNoised = _mapped("KSpaceSpikeNoised", KSpaceSpikeNoise, "")
RandKSpaceSpikeNoised = _mapped_rand("RandKSpaceSpikeNoised", RandKSpaceSpikeNoise, "")
RandCoarseDropoutd = _mapped_rand("RandCoarseDropoutd", RandCoarseDropout, "")
RandCoarseShuffled = _mapped_rand("RandCoarseShuffled", RandCoarseShuffle, "")
HistogramNormalized = _mapped("HistogramNormalized", HistogramNormalize, "")
ForegroundMaskd = _mapped("ForegroundMaskd", ForegroundMask, "")
ComputeHoVerMapsd = _mapped("ComputeHoVerMapsd", ComputeHoVerMaps, "")
MedianSmoothd = _mapped("MedianSmoothd", MedianSmooth, "")
SavitzkyGolaySmoothd = _mapped("SavitzkyGolaySmoothd", SavitzkyGolaySmooth, "")


# ---------------------------------------------------------------------------
# utility dictionary transforms
# ---------------------------------------------------------------------------

Identityd = _mapped("Identityd", Identity, "utility/dictionary.py:—")
AsChannelLastd = _mapped("AsChannelLastd", AsChannelLast, "")
EnsureChannelFirstd = _mapped("EnsureChannelFirstd", EnsureChannelFirst, "utility/dictionary.py:—")
RepeatChanneld = _mapped("RepeatChanneld", RepeatChannel, "")
RemoveRepeatedChanneld = _mapped("RemoveRepeatedChanneld", RemoveRepeatedChannel, "")
CastToTyped = _mapped("CastToTyped", CastToType, "utility/dictionary.py:—", call_kwargs=("dtype",))
ToJaxd = _mapped("ToJaxd", ToJax, "")
ToTensord = ToJaxd  # familiarity alias
ToNumpyd = _mapped("ToNumpyd", ToNumpy, "")
EnsureTyped = _mapped("EnsureTyped", EnsureType, "utility/dictionary.py:—")
Transposed = _mapped("Transposed", Transpose, "")
SqueezeDimd = _mapped("SqueezeDimd", SqueezeDim, "")
DataStatsd = _mapped("DataStatsd", DataStats, "")
SimulateDelayd = _mapped("SimulateDelayd", SimulateDelay, "")
LabelToMaskd = _mapped("LabelToMaskd", LabelToMask, "")
ConvertToMultiChannelBasedOnBratsClassesd = _mapped(
    "ConvertToMultiChannelBasedOnBratsClassesd", ConvertToMultiChannelBasedOnBratsClasses, "")
MapLabelValued = _mapped("MapLabelValued", MapLabelValue, "")
AddCoordinateChannelsd = _mapped("AddCoordinateChannelsd", AddCoordinateChannels, "")
ToDeviced = _mapped("ToDeviced", ToDevice, "")


class Lambdad(MapTransform, InvertibleTransform):
    """Apply callable(s) per key (reference: utility/dictionary.py:—)."""

    def __init__(self, keys: KeysCollection, func, inv_func=None, overwrite: bool | str = True,
                 allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.func = ensure_tuple_rep(func, len(self.keys))
        self.inv_func = ensure_tuple_rep(inv_func, len(self.keys))
        self.overwrite = overwrite
        self._lambd = Lambda()

    def __call__(self, data):
        d = dict(data)
        for key, func in self.key_iterator(d, self.func):
            ret = self._lambd(d[key], func=func)
            if self.overwrite is True:
                d[key] = ret
            elif isinstance(self.overwrite, str):
                d[self.overwrite] = ret
        return d

    def inverse(self, data):
        d = dict(data)
        for key, inv in self.key_iterator(d, self.inv_func):
            if callable(inv):
                d[key] = inv(d[key])
        return d


RandLambdad = Lambdad  # simplified: probability gating can wrap funcs


class SplitDimd(MapTransform):
    """Split a dim into new keys (reference: utility/dictionary.py:—)."""

    def __init__(self, keys: KeysCollection, output_postfixes: Sequence[str] | None = None,
                 dim: int = 0, keepdim: bool = True, update_meta: bool = True,
                 list_output: bool = False, allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.output_postfixes = output_postfixes
        self.splitter = SplitDim(dim, keepdim, update_meta)
        self.list_output = list_output

    def __call__(self, data):
        d = dict(data)
        all_keys = list(set(self.key_iterator(d)))
        if self.list_output:
            output = []
            results = [self.splitter(d[key]) for key in all_keys]
            for row in zip(*results):
                new_dict = dict(zip(all_keys, row))
                for k in set(d.keys()).difference(set(all_keys)):
                    new_dict[k] = d[k]
                output.append(new_dict)
            return output
        for key in all_keys:
            rets = self.splitter(d[key])
            postfixes = tuple(f"{i}" for i in range(len(rets))) if self.output_postfixes is None else self.output_postfixes
            if len(postfixes) != len(rets):
                raise ValueError(f"count of splits must match output_postfixes, {len(postfixes)} != {len(rets)}.")
            for i, r in enumerate(rets):
                split_key = f"{key}_{postfixes[i]}"
                if split_key in d:
                    raise RuntimeError(f"input data already contains key {split_key}.")
                d[split_key] = r
        return d


class FgBgToIndicesd(MapTransform):
    """(reference: utility/dictionary.py:—)."""

    def __init__(self, keys: KeysCollection, fg_postfix: str = "_fg_indices", bg_postfix: str = "_bg_indices",
                 image_key: str | None = None, image_threshold: float = 0.0, output_shape=None,
                 allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.fg_postfix = fg_postfix
        self.bg_postfix = bg_postfix
        self.image_key = image_key
        self.converter = FgBgToIndices(image_threshold, output_shape)

    def __call__(self, data):
        d = dict(data)
        image = d[self.image_key] if self.image_key else None
        for key in self.key_iterator(d):
            d[f"{key}{self.fg_postfix}"], d[f"{key}{self.bg_postfix}"] = self.converter(d[key], image)
        return d


class ClassesToIndicesd(MapTransform):
    def __init__(self, keys: KeysCollection, indices_postfix: str = "_cls_indices",
                 num_classes: int | None = None, image_key: str | None = None,
                 image_threshold: float = 0.0, output_shape=None, max_samples_per_class=None,
                 allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.indices_postfix = indices_postfix
        self.image_key = image_key
        self.converter = ClassesToIndices(num_classes, image_threshold, output_shape, max_samples_per_class)

    def __call__(self, data):
        d = dict(data)
        image = d[self.image_key] if self.image_key else None
        for key in self.key_iterator(d):
            d[f"{key}{self.indices_postfix}"] = self.converter(d[key], image)
        return d


class DeleteItemsd(MapTransform):
    """Remove keys (reference: utility/dictionary.py:—)."""

    def __init__(self, keys: KeysCollection, sep: str = ".", use_re=False):
        MapTransform.__init__(self, keys)
        self.sep = sep
        self.use_re = ensure_tuple_rep(use_re, len(self.keys))

    def __call__(self, data):
        import re

        def _delete_item(keys, d, use_re: bool = False):
            key = keys[0]
            if len(keys) > 1:
                d[key] = _delete_item(keys[1:], d[key], use_re)
                return d
            return {k: v for k, v in d.items() if (use_re and not re.search(key, f"{k}")) or (not use_re and k != key)}

        d = dict(data)
        for key, use_re in zip(self.keys, self.use_re):
            d = _delete_item(str(key).split(self.sep), d, use_re)
        return d


class SelectItemsd(MapTransform):
    """Keep only given keys (reference: utility/dictionary.py:—)."""

    def __call__(self, data):
        return {key: data[key] for key in self.key_iterator(data)}


class CopyItemsd(MapTransform):
    """Copy values to new keys (reference: utility/dictionary.py:—)."""

    def __init__(self, keys: KeysCollection, times: int = 1, names: KeysCollection | None = None,
                 allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        if times < 1:
            raise ValueError(f"times must be positive, got {times}.")
        self.times = times
        names = [f"{key}_{i}" for key in self.keys for i in range(self.times)] if names is None else ensure_tuple(names)
        if len(names) != (len(self.keys) * times):
            raise ValueError("len(names) must match len(keys) * times.")
        self.names = names

    def __call__(self, data):
        import copy

        d = dict(data)
        key_len = len(self.keys)
        for i in range(self.times):
            for key, new_key in self.key_iterator(d, self.names[i * key_len:(i + 1) * key_len]):
                if new_key in d:
                    raise KeyError(f"Key {new_key} already exists in data.")
                val = d[key]
                d[new_key] = val.clone() if isinstance(val, MetaImage) else copy.deepcopy(val)
        return d


class ConcatItemsd(MapTransform):
    """Concat several keys into one (reference: utility/dictionary.py:—)."""

    def __init__(self, keys: KeysCollection, name: str, dim: int = 0, allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.name = name
        self.dim = dim

    def __call__(self, data):
        d = dict(data)
        output = []
        data_type = None
        for key in self.key_iterator(d):
            if data_type is None:
                data_type = type(d[key])
            elif not isinstance(d[key], data_type):
                raise TypeError("All items in data must have the same type.")
            output.append(d[key])
        if len(output) == 0:
            return d
        from ..utils.backend import xp

        if isinstance(output[0], MetaImage):
            arrs = [o.data for o in output]
            d[self.name] = output[0].new_like(xp(arrs[0]).concatenate(arrs, axis=self.dim))
        else:
            d[self.name] = xp(output[0]).concatenate(output, axis=self.dim)
        return d


class IntensityStatsd(MapTransform):
    def __init__(self, keys: KeysCollection, ops, key_prefix: str, mask_keys=None,
                 channel_wise: bool = False, meta_keys=None, meta_key_postfix: str = "meta_dict",
                 allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.stats = IntensityStats(ops=ops, key_prefix=key_prefix, channel_wise=channel_wise)
        self.mask_keys = ensure_tuple_rep(None, len(self.keys)) if mask_keys is None else ensure_tuple(mask_keys)

    def __call__(self, data):
        d = dict(data)
        for key, mask_key in self.key_iterator(d, self.mask_keys):
            mask = d.get(mask_key) if mask_key is not None else None
            d[key], _ = self.stats(d[key], mask=mask)
        return d


class AddExtremePointsChanneld(Randomizable, MapTransform):
    def __init__(self, keys: KeysCollection, label_key: str, background: int = 0, pert: float = 0.0,
                 sigma=3.0, rescale_min: float = -1.0, rescale_max: float = 1.0,
                 allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.background = background
        self.pert = pert
        self.points: list = []
        self.label_key = label_key
        self.sigma = sigma
        self.rescale_min = rescale_min
        self.rescale_max = rescale_max
        self.converter = AddExtremePointsChannel(background=background, pert=pert)

    def set_random_state(self, seed=None, state=None):
        super().set_random_state(seed, state)
        self.converter.set_random_state(seed, state)
        return self

    def __call__(self, data):
        d = dict(data)
        label = d[self.label_key]
        for key in self.key_iterator(d):
            d[key] = self.converter(d[key], label=label, sigma=self.sigma,
                                    rescale_min=self.rescale_min, rescale_max=self.rescale_max)
        return d


# ---------------------------------------------------------------------------
# IO dictionary transforms
# ---------------------------------------------------------------------------

class LoadImaged(MapTransform):
    """Load image files per key (reference: io/dictionary.py:—)."""

    def __init__(self, keys: KeysCollection, reader=None, dtype=np.float32, meta_keys=None,
                 meta_key_postfix: str = "meta_dict", overwriting: bool = False, image_only: bool = True,
                 ensure_channel_first: bool = False, simple_keys: bool = False,
                 prune_meta_pattern=None, prune_meta_sep: str = ".", allow_missing_keys: bool = False,
                 expanduser: bool = True, *args, **kwargs):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self._loader = LoadImage(reader, image_only, dtype, ensure_channel_first, simple_keys,
                                 prune_meta_pattern, prune_meta_sep, expanduser, *args, **kwargs)
        self.meta_key_postfix = meta_key_postfix
        self.meta_keys = ensure_tuple_rep(None, len(self.keys)) if meta_keys is None else ensure_tuple(meta_keys)
        self.overwriting = overwriting

    def register(self, reader):
        self._loader.register(reader)

    def __call__(self, data, reader=None):
        d = dict(data)
        for key, meta_key in self.key_iterator(d, self.meta_keys):
            out = self._loader(d[key], reader)
            if self._loader.image_only:
                d[key] = out
            else:
                d[key] = out[0]
                meta_key = meta_key or f"{key}_{self.meta_key_postfix}"
                if meta_key in d and not self.overwriting:
                    raise KeyError(f"Metadata with key {meta_key} already exists and overwriting=False.")
                d[meta_key] = out[1]
        return d


class SaveImaged(MapTransform):
    """Save images per key (reference: io/dictionary.py:—)."""

    def __init__(self, keys: KeysCollection, meta_keys=None, meta_key_postfix: str = "meta_dict",
                 output_dir="./", output_postfix: str = "trans", output_ext: str = ".nii.gz",
                 resample: bool = False, mode: str = "nearest", padding_mode="border",
                 scale=None, dtype=np.float64, output_dtype=np.float32, allow_missing_keys: bool = False,
                 squeeze_end_dims: bool = True, data_root_dir: str = "", separate_folder: bool = True,
                 print_log: bool = True, output_format: str = "", writer=None,
                 output_name_formatter=None, folder_layout=None, savepath_in_metadict: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.saver = SaveImage(output_dir=output_dir, output_postfix=output_postfix, output_ext=output_ext,
                               resample=resample, mode=mode, padding_mode=padding_mode, scale=scale,
                               dtype=dtype, output_dtype=output_dtype, squeeze_end_dims=squeeze_end_dims,
                               data_root_dir=data_root_dir, separate_folder=separate_folder,
                               print_log=print_log, output_format=output_format, writer=writer,
                               output_name_formatter=output_name_formatter, folder_layout=folder_layout,
                               savepath_in_metadict=savepath_in_metadict)
        self.meta_keys = ensure_tuple_rep(meta_keys, len(self.keys))
        self.meta_key_postfix = ensure_tuple_rep(meta_key_postfix, len(self.keys))

    def __call__(self, data):
        d = dict(data)
        for key, meta_key, meta_key_postfix in self.key_iterator(d, self.meta_keys, self.meta_key_postfix):
            if meta_key is None and meta_key_postfix is not None:
                meta_key = f"{key}_{meta_key_postfix}"
            meta_data = d.get(meta_key) if meta_key is not None else None
            self.saver(img=d[key], meta_data=meta_data)
        return d


# ---------------------------------------------------------------------------
# post dictionary transforms
# ---------------------------------------------------------------------------

Activationsd = _mapped("Activationsd", Activations, "post/dictionary.py:—",
                       call_kwargs=("sigmoid", "softmax", "other"))
AsDiscreted = _mapped("AsDiscreted", AsDiscrete, "post/dictionary.py:—",
                      call_kwargs=("argmax", "to_onehot", "threshold", "rounding"))
KeepLargestConnectedComponentd = _mapped("KeepLargestConnectedComponentd", KeepLargestConnectedComponent, "")
RemoveSmallObjectsd = _mapped("RemoveSmallObjectsd", RemoveSmallObjects, "")
FillHolesd = _mapped("FillHolesd", FillHoles, "")
LabelToContourd = _mapped("LabelToContourd", LabelToContour, "")
ProbNMSd = _mapped("ProbNMSd", ProbNMS, "")
SobelGradientsd = _mapped("SobelGradientsd", SobelGradients, "")
DistanceTransformEDTd = _mapped("DistanceTransformEDTd", DistanceTransformEDT, "")


class MeanEnsembled(MapTransform):
    """(reference: post/dictionary.py:—)."""

    def __init__(self, keys: KeysCollection, output_key: str | None = None, weights=None):
        MapTransform.__init__(self, keys)
        self.output_key = output_key if output_key is not None else self.keys[0]
        self.ensemble = MeanEnsemble(weights=weights)

    def __call__(self, data):
        d = dict(data)
        items = [d[key] for key in self.key_iterator(d)]
        d[self.output_key] = self.ensemble(items)
        return d


class VoteEnsembled(MapTransform):
    def __init__(self, keys: KeysCollection, output_key: str | None = None, num_classes: int | None = None):
        MapTransform.__init__(self, keys)
        self.output_key = output_key if output_key is not None else self.keys[0]
        self.ensemble = VoteEnsemble(num_classes=num_classes)

    def __call__(self, data):
        d = dict(data)
        items = [d[key] for key in self.key_iterator(d)]
        d[self.output_key] = self.ensemble(items)
        return d


class Invertd(MapTransform):
    """Invert previously applied transforms on predictions
    (reference: post/dictionary.py Invertd / post/array.py:833 Invert).

    Applies ``transform.inverse`` using the applied_operations recorded on
    ``orig_keys``' images.
    """

    def __init__(self, keys: KeysCollection, transform, orig_keys: KeysCollection | None = None,
                 meta_keys=None, orig_meta_keys=None, meta_key_postfix: str = "meta_dict",
                 nearest_interp: bool | Sequence[bool] = True, to_tensor: bool = True,
                 device=None, post_func=None, allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        if not isinstance(transform, InvertibleTransform):
            raise ValueError("transform is not invertible, can't invert transform for the data.")
        self.transform = transform
        self.orig_keys = ensure_tuple_rep(orig_keys, len(self.keys)) if orig_keys is not None else self.keys
        self.nearest_interp = ensure_tuple_rep(nearest_interp, len(self.keys))

    def __call__(self, data):
        d = dict(data)
        for key, orig_key, nearest_interp in self.key_iterator(d, self.orig_keys, self.nearest_interp):
            orig = d.get(orig_key)
            pred = d[key]
            pred = MetaImage.ensure_meta(pred)
            if isinstance(orig, MetaImage):
                # graft the recorded operation stack onto the prediction
                pred = pred.new_like(pred.data)
                pred.applied_operations = [dict(op) for op in orig.applied_operations]
                pred.affine = np.asarray(orig.affine).copy()
            if nearest_interp:
                for op in pred.applied_operations:
                    if "lazy_interpolation_mode" in op:
                        op["lazy_interpolation_mode"] = 0
            if isinstance(self.transform, MapTransform) or (
                    isinstance(self.transform, Compose)
                    and any(isinstance(t, MapTransform) for t in self.transform.transforms)):
                # dict pipeline: feed the prediction back under the original key
                inverted = self.transform.inverse({orig_key: pred})[orig_key]
            else:
                inverted = self.transform.inverse(pred)
            d[key] = inverted
        return d


class Decollated(MapTransform):
    """Decollate a batch dict into a list of sample dicts (reference:
    inverse_batch_transform.py:114)."""

    def __init__(self, keys=None, detach: bool = True, pad_batch: bool = True, fill_value=None,
                 allow_missing_keys: bool = True):
        MapTransform.__init__(self, keys if keys is not None else "_all_", allow_missing_keys)
        self.detach = detach
        self.pad_batch = pad_batch
        self.fill_value = fill_value

    def __call__(self, data):
        from ..data.utils import decollate_batch

        return decollate_batch(data, detach=self.detach, pad=self.pad_batch, fill_value=self.fill_value)


class GridSplitd(MapTransform, MultiSampleTrait):
    """Split each keyed image into a uniform grid of sub-images, producing one dict per
    grid cell (reference: spatial/dictionary.py:2292)."""

    def __init__(self, keys: KeysCollection, grid=(2, 2), size=None, allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        from .grid_ops import GridSplit

        self.grid = tuple(grid)
        self.size = size if isinstance(size, dict) else {k: size for k in self.keys}
        self.splitter = GridSplit(grid=self.grid)

    def __call__(self, data: Mapping) -> list[dict]:
        d = dict(data)
        n_out = int(np.prod(self.grid))
        outputs = [dict(d) for _ in range(n_out)]
        for key in self.key_iterator(d):
            for i, cell in enumerate(self.splitter(d[key], self.size.get(key))):
                outputs[i][key] = cell
        return outputs


class GridPatchd(MapTransform, MultiSampleTrait):
    """Extract all grid patches from each keyed image (reference: spatial/dictionary.py:2342)."""

    def __init__(self, keys: KeysCollection, patch_size, offset=None, num_patches=None,
                 overlap: float = 0.0, sort_fn=None, threshold=None, pad_mode=None,
                 allow_missing_keys: bool = False, **pad_kwargs):
        MapTransform.__init__(self, keys, allow_missing_keys)
        from .grid_ops import GridPatch

        self.patcher = GridPatch(patch_size=patch_size, offset=offset, num_patches=num_patches,
                                 overlap=overlap, sort_fn=sort_fn, threshold=threshold,
                                 pad_mode=pad_mode, **pad_kwargs)

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.patcher(d[key])
        return d


class RandGridPatchd(RandomizableTransform, MapTransform, MultiSampleTrait):
    """Grid patches with a random offset shared across keys
    (reference: spatial/dictionary.py:2428)."""

    def __init__(self, keys: KeysCollection, patch_size, min_offset=None, max_offset=None,
                 num_patches=None, overlap: float = 0.0, sort_fn=None, threshold=None,
                 pad_mode=None, allow_missing_keys: bool = False, **pad_kwargs):
        MapTransform.__init__(self, keys, allow_missing_keys)
        from .grid_ops import RandGridPatch

        self.patcher = RandGridPatch(patch_size=patch_size, min_offset=min_offset,
                                     max_offset=max_offset, num_patches=num_patches,
                                     overlap=overlap, sort_fn=sort_fn, threshold=threshold,
                                     pad_mode=pad_mode, **pad_kwargs)

    def set_random_state(self, seed=None, state=None):
        Randomizable.set_random_state(self, seed, state)
        self.patcher.set_random_state(seed, state)
        return self

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        first_key = self.first_key(d)
        if first_key == ():
            return d
        item = d[first_key]
        self.patcher.randomize(item.data if isinstance(item, MetaImage) else item)
        for key in self.key_iterator(d):
            d[key] = self.patcher(d[key], randomize=False)
        return d


class ApplyTransformToPointsd(MapTransform, InvertibleTransform):
    """Dict wrapper of :class:`ApplyTransformToPoints`
    (reference: utility/dictionary.py ApplyTransformToPointsd).

    ``refer_keys`` optionally names, per points-key, the image key whose affine to use.
    """

    def __init__(self, keys: KeysCollection, refer_keys=None, dtype=None, affine=None,
                 invert_affine: bool = True, affine_lps_to_ras: bool = False,
                 allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.refer_keys = ensure_tuple_rep(refer_keys, len(self.keys))
        self.converter = ApplyTransformToPoints(dtype=dtype, affine=affine,
                                                invert_affine=invert_affine,
                                                affine_lps_to_ras=affine_lps_to_ras)

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key, refer_key in self.key_iterator(d, self.refer_keys):
            affine = None
            if refer_key is not None:
                if refer_key not in d:
                    raise KeyError(f"refer_key '{refer_key}' is not in the data.")
                ref = d[refer_key]
                affine = ref.affine if isinstance(ref, MetaImage) else None
            d[key] = self.converter(d[key], affine=affine)
        return d

    def inverse(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.converter.inverse(d[key])
        return d


# (export block moved to end of module)


class Padd(MapTransform, InvertibleTransform):
    """Generic dict wrapper around a Pad instance (reference: croppad/dictionary.py:113)."""

    def __init__(self, keys: KeysCollection, padder, mode=None,
                 allow_missing_keys: bool = False, lazy: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.padder = padder
        self.mode = mode

    def __call__(self, data: Mapping, lazy: bool | None = None) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.padder(d[key]) if self.mode is None else self.padder(d[key], mode=self.mode)
        return d

    def inverse(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.padder.inverse(d[key])
        return d


class Cropd(MapTransform, InvertibleTransform):
    """Generic dict wrapper around a Crop instance (reference: croppad/dictionary.py:329)."""

    def __init__(self, keys: KeysCollection, cropper, allow_missing_keys: bool = False,
                 lazy: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.cropper = cropper

    def __call__(self, data: Mapping, lazy: bool | None = None) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.cropper(d[key])
        return d

    def inverse(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.cropper.inverse(d[key])
        return d


class RandCropd(Cropd, Randomizable):
    """Cropd with shared randomization across keys (reference: croppad/dictionary.py:371)."""

    def set_random_state(self, seed=None, state=None):
        if isinstance(self.cropper, Randomizable):
            self.cropper.set_random_state(seed, state)
        Randomizable.set_random_state(self, seed, state)
        return self

    def randomize(self, img_size) -> None:
        if isinstance(self.cropper, Randomizable):
            self.cropper.randomize(img_size)

    def __call__(self, data: Mapping, lazy: bool | None = None) -> dict:
        d = dict(data)
        first_key = self.first_key(d)
        if first_key == ():
            return d
        item = d[first_key]
        self.randomize((item.data if isinstance(item, MetaImage) else item).shape[1:])
        for key in self.key_iterator(d):
            kwargs = {"randomize": False} if isinstance(self.cropper, Randomizable) else {}
            d[key] = self.cropper(d[key], **kwargs)
        return d


class FlattenSubKeysd(MapTransform):
    """Lift the sub-keys of a dict entry into the top-level dict
    (reference: utility/dictionary.py FlattenSubKeysd)."""

    def __init__(self, keys: KeysCollection, sub_keys=None, delete_keys: bool = True,
                 prefix: str | None = None, allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.sub_keys = sub_keys
        self.delete_keys = delete_keys
        self.prefix = prefix

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key in self.key_iterator(d):
            sub = d[key]
            sub_keys = sub.keys() if self.sub_keys is None else self.sub_keys
            for sk in sub_keys:
                name = f"{self.prefix}_{sk}" if self.prefix else sk
                if name in d and name not in self.keys:
                    raise ValueError(f"flattened key {name} already exists.")
                d[name] = sub[sk]
            if self.delete_keys:
                del d[key]
        return d


class SaveClassificationd(MapTransform):
    """Append classification results to a CSVSaver (reference: handlers-backed
    utility/dictionary.py SaveClassificationd)."""

    def __init__(self, keys: KeysCollection, meta_keys=None, meta_key_postfix: str = "meta_dict",
                 saver=None, output_dir: str = "./", filename: str = "predictions.csv",
                 delimiter: str = ",", overwrite: bool = True, flush: bool = True,
                 allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        if len(self.keys) != 1:
            raise ValueError("only 1 key is allowed when saving the classification result.")
        from ..data.csv_saver import CSVSaver

        self.saver = saver or CSVSaver(output_dir, filename, overwrite, flush, delimiter)
        self.flush = flush
        self.meta_keys = ensure_tuple_rep(meta_keys, len(self.keys))
        self.meta_key_postfix = ensure_tuple_rep(meta_key_postfix, len(self.keys))

    def get_saver(self):
        return self.saver

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        for key, meta_key, postfix in self.key_iterator(d, self.meta_keys,
                                                        self.meta_key_postfix):
            if meta_key is None and postfix is not None:
                meta_key = f"{key}_{postfix}"
            meta_data = None
            item = d[key]
            if isinstance(item, MetaImage):
                meta_data = item.meta
            elif meta_key and meta_key in d:
                meta_data = d[meta_key]
            self.saver.save(item.data if isinstance(item, MetaImage) else item, meta_data)
            if self.flush:
                self.saver.finalize()
        return d


# dict wrappers over newly added array transforms
GridDistortiond = _mapped("GridDistortiond", GridDistortion, "spatial/dictionary.py:—",
                          lazy=False)
from .utility_array import CuCIM, ImageFilter, RandImageFilter, TorchIO, TorchVision  # noqa: E402

ImageFilterd = _mapped("ImageFilterd", ImageFilter, "utility/dictionary.py:—")
RandImageFilterd = _mapped_rand("RandImageFilterd", RandImageFilter, "utility/dictionary.py:—",
                                randomize_arg=True)
TorchVisiond = _mapped("TorchVisiond", TorchVision, "utility/dictionary.py:1384")
RandTorchVisiond = TorchVisiond
TorchIOd = _mapped("TorchIOd", TorchIO, "utility/dictionary.py:—")
RandTorchIOd = TorchIOd
CuCIMd = _mapped("CuCIMd", CuCIM, "utility/dictionary.py:—")
RandCuCIMd = CuCIMd
from .intensity_array import RandScaleIntensityFixedMean, ScaleIntensityFixedMean  # noqa: E402

RandScaleIntensityFixedMeand = _mapped_rand("RandScaleIntensityFixedMeand",
                                            RandScaleIntensityFixedMean,
                                            "intensity/dictionary.py:—")
from .post_array import Invert, LabelFilter  # noqa: E402

LabelFilterd = _mapped("LabelFilterd", LabelFilter, "post/dictionary.py:—")
BoundingRectd = _mapped("BoundingRectd", BoundingRect, "croppad/dictionary.py:—")
from .regularization_array import CutMix, CutOut, MixUp  # noqa: E402


class MixUpd(MapTransform, RandomizableTransform):
    """Apply MixUp with the SAME shuffled pairing/weights to all keys
    (reference: regularization/dictionary.py MixUpd)."""

    def __init__(self, keys: KeysCollection, batch_size: int, alpha: float = 1.0,
                 allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.mixup = MixUp(batch_size, alpha)

    def set_random_state(self, seed=None, state=None):
        self.mixup.set_random_state(seed, state)
        return self

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        self.mixup.randomize(None)
        for key in self.key_iterator(d):
            d[key] = self.mixup(d[key], randomize=False)
        return d


class CutMixd(MapTransform, RandomizableTransform):
    """CutMix over image keys with matching label mixing
    (reference: regularization/dictionary.py CutMixd)."""

    def __init__(self, keys: KeysCollection, batch_size: int, label_keys=None,
                 alpha: float = 1.0, allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.mixer = CutMix(batch_size, alpha)
        self.label_keys = ensure_tuple(label_keys) if label_keys is not None else ()

    def set_random_state(self, seed=None, state=None):
        self.mixer.set_random_state(seed, state)
        return self

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        self.mixer.randomize(d[self.first_key(d)])
        for key in self.key_iterator(d):
            d[key] = self.mixer(d[key], randomize=False)
        return d


class CutOutd(MapTransform, RandomizableTransform):
    """CutOut over keys with a shared mask (reference: regularization/dictionary.py CutOutd)."""

    def __init__(self, keys: KeysCollection, batch_size: int,
                 allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        self.cutout = CutOut(batch_size)

    def set_random_state(self, seed=None, state=None):
        self.cutout.set_random_state(seed, state)
        return self

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        self.cutout.randomize(d[self.first_key(d)])
        for key in self.key_iterator(d):
            d[key] = self.cutout(d[key], randomize=False)
        return d


from .signal_array import SignalFillEmpty  # noqa: E402

SignalFillEmptyd = _mapped("SignalFillEmptyd", SignalFillEmpty, "signal/dictionary.py:—")
from .smooth_field_array import (  # noqa: E402
    RandSmoothDeform,
    RandSmoothFieldAdjustContrast,
    RandSmoothFieldAdjustIntensity,
)

RandSmoothFieldAdjustContrastd = _mapped_rand("RandSmoothFieldAdjustContrastd",
                                              RandSmoothFieldAdjustContrast,
                                              "smooth_field/dictionary.py:—")
RandSmoothFieldAdjustIntensityd = _mapped_rand("RandSmoothFieldAdjustIntensityd",
                                               RandSmoothFieldAdjustIntensity,
                                               "smooth_field/dictionary.py:—")
RandSmoothDeformd = _mapped_rand("RandSmoothDeformd", RandSmoothDeform,
                                 "smooth_field/dictionary.py:—")
from .io_array import WriteFileMapping  # noqa: E402

WriteFileMappingd = _mapped("WriteFileMappingd", WriteFileMapping, "io/dictionary.py:—")


# (export block at end)

from .utility_array import ConvertBoxToPoints, ConvertPointsToBoxes, ToCupy, ToPIL  # noqa: E402

ConvertBoxToPointsd = _mapped("ConvertBoxToPointsd", ConvertBoxToPoints,
                              "spatial/dictionary.py:2618")
ConvertPointsToBoxesd = _mapped("ConvertPointsToBoxesd", ConvertPointsToBoxes,
                                "spatial/dictionary.py:—")
ToPILd = _mapped("ToPILd", ToPIL, "utility/dictionary.py:—")
ToCupyd = _mapped("ToCupyd", ToCupy, "utility/dictionary.py:—")



class Ensembled(MapTransform):
    """Base for ensemble dict transforms: stack keyed predictions and apply an
    ensemble callable (reference: post/dictionary.py:403)."""

    def __init__(self, keys: KeysCollection, ensemble, output_key: str | None = None,
                 allow_missing_keys: bool = False):
        MapTransform.__init__(self, keys, allow_missing_keys)
        if not callable(ensemble):
            raise TypeError(f"ensemble must be callable but is {type(ensemble).__name__}.")
        self.ensemble = ensemble
        if len(self.keys) > 1 and output_key is None:
            raise ValueError("output_key is required when len(keys) > 1.")
        self.output_key = output_key if output_key is not None else self.keys[0]

    def __call__(self, data: Mapping) -> dict:
        d = dict(data)
        if len(self.keys) == 1 and self.keys[0] in d:
            items = d[self.keys[0]]
        else:
            items = [d[key] for key in self.key_iterator(d)]
        if len(items) > 0:
            d[self.output_key] = self.ensemble(items)
        return d


# exported names: only actual dict transforms (MapTransform subclasses) — array
# classes whose own names happen to end in 'd' (BorderPad, CropForeground, ...)
# must NOT leak into the dict namespace or get mangled D/Dict aliases
_g = globals()
__all__ = sorted({
    n for n in dir()
    if n.endswith("d") and not n.startswith("_")
    and isinstance(_g.get(n), type) and issubclass(_g[n], MapTransform)
} | {"ToTensord", "RandLambdad", "Invertd", "Decollated"})

# CamelCase D/Dict aliases (the reference exports XxxD and XxxDict as aliases)
for _n in list(__all__):
    obj = _g.get(_n)
    if isinstance(obj, type):
        _g[f"{_n[:-1]}D"] = obj
        _g[f"{_n[:-1]}Dict"] = obj
        __all__ += [f"{_n[:-1]}D", f"{_n[:-1]}Dict"]
