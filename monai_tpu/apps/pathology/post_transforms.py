"""Instance-level HoVerNet post-processing: watershed, contours, centroids, types
(reference: monai/apps/pathology/transforms/post/array.py:59-841).

scikit-image is not available in this environment, so the two pieces the reference
delegates to it are implemented here on numpy/scipy:

- ``find_contours``: marching squares (same case table / vertex interpolation as
  skimage.measure.find_contours with default ``positive_orientation="low"``), so
  downstream ``GenerateSuccinctContour`` sees identical (row, col) half-integer
  coordinates.
- ``watershed``: priority-flood from markers (heap ordered by (value, age), as in
  skimage.segmentation.watershed).

If skimage *is* importable, both delegate to it.
"""
from __future__ import annotations

import heapq
from collections.abc import Callable, Hashable, Mapping, Sequence

import numpy as np

from ...transforms.transform import MapTransform, Transform
from ...utils.backend import to_numpy

__all__ = [
    "find_contours",
    "watershed",
    "Watershed",
    "GenerateSuccinctContour",
    "GenerateInstanceContour",
    "GenerateInstanceCentroid",
    "GenerateInstanceType",
    "HoVerNetNuclearTypePostProcessing",
    "Watershedd",
    "GenerateSuccinctContourd",
    "GenerateInstanceContourd",
    "GenerateInstanceCentroidd",
    "GenerateInstanceTyped",
    "HoVerNetNuclearTypePostProcessingd",
    "GenerateWatershedMaskd",
    "GenerateInstanceBorderd",
    "GenerateDistanceMapd",
    "GenerateWatershedMarkersd",
    "HoVerNetInstanceMapPostProcessingd",
]


def _as_np(x):
    return to_numpy(x.data if hasattr(x, "data") and not isinstance(x, np.ndarray) else x)


# ---------------------------------------------------------------------------
# marching squares
# ---------------------------------------------------------------------------
def _ms_segments(arr: np.ndarray, level: float):
    """Yield (from_point, to_point) line segments of the iso-contour at ``level``.

    Standard marching-squares case table; ambiguous saddles (cases 6/9) are split
    so that contours wind counterclockwise around regions BELOW the level, matching
    the convention GenerateSuccinctContour expects.
    """
    h, w = arr.shape
    segs = []
    for r in range(h - 1):
        for c in range(w - 1):
            ul, ur = arr[r, c], arr[r, c + 1]
            ll, lr = arr[r + 1, c], arr[r + 1, c + 1]
            case = (ul > level) | ((ur > level) << 1) | ((ll > level) << 2) | ((lr > level) << 3)
            if case in (0, 15):
                continue

            def frac(a, b):
                # non-crossing edges are computed eagerly but never used by the case
                d = b - a
                return 0.5 if d == 0 else (level - a) / d

            top = (float(r), c + frac(ul, ur))
            bottom = (float(r + 1), c + frac(ll, lr))
            left = (r + frac(ul, ll), float(c))
            right = (r + frac(ur, lr), float(c + 1))

            if case == 1:
                segs.append((top, left))
            elif case == 2:
                segs.append((right, top))
            elif case == 3:
                segs.append((right, left))
            elif case == 4:
                segs.append((left, bottom))
            elif case == 5:
                segs.append((top, bottom))
            elif case == 6:
                segs.append((right, top))
                segs.append((left, bottom))
            elif case == 7:
                segs.append((right, bottom))
            elif case == 8:
                segs.append((bottom, right))
            elif case == 9:
                segs.append((top, left))
                segs.append((bottom, right))
            elif case == 10:
                segs.append((bottom, top))
            elif case == 11:
                segs.append((bottom, left))
            elif case == 12:
                segs.append((left, right))
            elif case == 13:
                segs.append((top, right))
            elif case == 14:
                segs.append((left, top))
    return segs


def _ms_assemble(segments):
    """Chain marching-squares segments into ordered contours (open or closed)."""
    from collections import deque

    contours: dict[int, deque] = {}
    head_of: dict[tuple, tuple] = {}  # point -> (contour, idx) where point is contour head
    tail_of: dict[tuple, tuple] = {}  # point -> (contour, idx) where point is contour tail
    nxt = 0
    for frm, to in segments:
        if frm == to:
            continue
        grow_front = head_of.pop(to, None)  # a contour starting at `to` → prepend to it
        grow_back = tail_of.pop(frm, None)  # a contour ending at `frm` → append to it
        if grow_front is not None and grow_back is not None:
            cf, fi = grow_front
            cb, bi = grow_back
            if cf is cb:  # closing a loop
                cb.append(to)
            elif bi < fi:  # merge: back-contour absorbs front-contour
                cb.extend(cf)
                del contours[fi]
                head_of[cb[0]] = (cb, bi)
                tail_of[cb[-1]] = (cb, bi)
            else:
                cf.extendleft(reversed(cb))
                head_of.pop(cb[0], None)
                del contours[bi]
                head_of[cf[0]] = (cf, fi)
                tail_of[cf[-1]] = (cf, fi)
        elif grow_front is None and grow_back is None:
            contours[nxt] = deque((frm, to))
            head_of[frm] = (contours[nxt], nxt)
            tail_of[to] = (contours[nxt], nxt)
            nxt += 1
        elif grow_back is None:
            cf, fi = grow_front
            cf.appendleft(frm)
            head_of[frm] = (cf, fi)
        else:
            cb, bi = grow_back
            cb.append(to)
            tail_of[to] = (cb, bi)
    return [np.asarray(contours[k], dtype=np.float64) for k in sorted(contours)]


def find_contours(image: np.ndarray, level: float | None = None) -> list[np.ndarray]:
    """Iso-valued contours of a 2D array (skimage.measure.find_contours work-alike).

    Returns a list of (n, 2) float arrays of (row, col) coordinates; contours wind
    counterclockwise around low-valued regions (= clockwise around foreground).
    """
    try:
        from skimage.measure import find_contours as _sk_find_contours

        return _sk_find_contours(image, level=level)
    except ImportError:
        pass
    image = np.asarray(image, dtype=np.float64)
    if image.ndim != 2:
        raise ValueError(f"find_contours expects a 2D array, got shape {image.shape}.")
    if level is None:
        level = (float(image.min()) + float(image.max())) / 2.0
    return _ms_assemble(_ms_segments(image, float(level)))


# ---------------------------------------------------------------------------
# watershed
# ---------------------------------------------------------------------------
def watershed(image: np.ndarray, markers: np.ndarray | None = None,
              mask: np.ndarray | None = None, connectivity: int = 1) -> np.ndarray:
    """Marker-based watershed (skimage.segmentation.watershed work-alike).

    Priority-flood: seeds are the marker pixels; pixels are popped lowest image
    value first (FIFO within ties) and take the label of the neighbor that
    reached them.
    """
    try:
        from skimage.segmentation import watershed as _sk_watershed

        return _sk_watershed(image, markers=markers, mask=mask, connectivity=connectivity)
    except ImportError:
        pass
    image = np.asarray(image)
    if mask is None:
        mask = np.ones(image.shape, dtype=bool)
    else:
        mask = np.asarray(mask).astype(bool)
    if markers is None:
        from scipy import ndimage as ndi

        lows = (image == ndi.minimum_filter(image, size=3)) & mask
        markers, _ = ndi.label(lows)
    markers = np.asarray(markers)

    ndim = image.ndim
    # neighbor offsets for the requested connectivity (max L1 distance)
    offsets = []
    for off in np.ndindex(*(3,) * ndim):
        d = tuple(o - 1 for o in off)
        if any(d) and sum(abs(v) for v in d) <= (connectivity or 1):
            offsets.append(d)

    out = np.where(mask, markers, 0).astype(np.int64)
    shape = image.shape
    heap: list = []
    age = 0
    it = np.nditer(out, flags=["multi_index"])
    for v in it:
        if v != 0:
            idx = it.multi_index
            heapq.heappush(heap, (image[idx], age, idx))
            age += 1
    while heap:
        _, _, idx = heapq.heappop(heap)
        lbl = out[idx]
        for d in offsets:
            nidx = tuple(i + o for i, o in zip(idx, d))
            if any(i < 0 or i >= s for i, s in zip(nidx, shape)):
                continue
            if mask[nidx] and out[nidx] == 0:
                out[nidx] = lbl
                heapq.heappush(heap, (image[nidx], age, nidx))
                age += 1
    return out


class Watershed(Transform):
    """Instance labels from a (negated-distance) height map, optional mask/markers
    (reference: post/array.py:59 Watershed)."""

    def __init__(self, connectivity: int | None = 1, dtype=np.int64):
        self.connectivity = connectivity
        self.dtype = dtype

    def __call__(self, image, mask=None, markers=None):
        image = _as_np(image)
        mask_np = None if mask is None else _as_np(mask)
        markers_np = None if markers is None else _as_np(markers)
        seg = watershed(image, markers=markers_np, mask=mask_np,
                        connectivity=self.connectivity or 1)
        return seg.astype(self.dtype)


class GenerateSuccinctContour(Transform):
    """Convert marching-squares contours to integer-pixel polygon vertices, in the
    style of OpenCV CHAIN_APPROX_SIMPLE (reference: post/array.py:356).

    Half-integer (row, col) points are snapped to the foreground-pixel extremity
    based on travel direction; per-side open sequences are ordered clockwise from
    the top-left of the (height, width) bounding box and joined; returned flipped
    to (x, y)."""

    def __init__(self, height: int, width: int) -> None:
        self.height = height
        self.width = width

    def _snap(self, cur, prev) -> tuple[int, int]:
        d = (cur[0] - prev[0], cur[1] - prev[1])
        row = col = -1
        if d in ((0.0, 1.0), (0.5, 0.5), (1.0, 0.0)):
            row, col = int(cur[0] + 0.5), int(cur[1])
        elif d in ((0.0, -1.0), (0.5, -0.5)):
            row, col = int(cur[0]), int(cur[1])
        elif d in ((-1.0, 0.0), (-0.5, -0.5)):
            row, col = int(cur[0]), int(cur[1] + 0.5)
        elif d == (-0.5, 0.5):
            row, col = int(cur[0] + 0.5), int(cur[1] + 0.5)
        return row, col

    def _perimeter_distance(self, first: tuple[int, int]) -> int:
        # clockwise distance of a border point from the top-left corner
        if first[0] == 0:
            return first[1]
        if first[1] == self.width - 1:
            return self.width + first[0]
        if first[0] == self.height - 1:
            return 2 * self.width + self.height - first[1]
        return 2 * (self.width + self.height) - first[0]

    def __call__(self, contours: list[np.ndarray]) -> np.ndarray | None:
        import warnings

        sequences = []
        corners = [False, False, False, False]  # TL, TR, BR, BL crossings
        for group in contours:
            seq: list[tuple[int, int]] = []
            last = prev = None
            side = -1
            for i, coord in enumerate(group):
                coord = (float(coord[0]), float(coord[1]))
                if i == 0:
                    if coord[0] == 0.0:  # enters from the top, heading south-east
                        side = 1
                        pixel = (0, int(coord[1] - 0.5))
                        if pixel[1] == self.width - 1:
                            corners[1] = True
                        elif pixel[1] == 0:
                            corners[0] = True
                    elif coord[1] == 0.0:  # from the left, heading north-east
                        side = 0
                        pixel = (int(coord[0] + 0.5), 0)
                    elif coord[0] == self.height - 1:  # from the bottom, north-west
                        side = 3
                        pixel = (int(coord[0]), int(coord[1] + 0.5))
                        if pixel[1] == self.width - 1:
                            corners[2] = True
                    elif coord[1] == self.width - 1:  # from the right, south-west
                        side = 2
                        pixel = (int(coord[0] - 0.5), int(coord[1]))
                    else:
                        warnings.warn(f"Invalid contour coord {coord}; skipping instance.")
                        return None
                    seq.append(pixel)
                    last = pixel
                elif i == len(group) - 1 or tuple(np.asarray(coord) - np.asarray(prev)) != tuple(
                        np.asarray(group[i + 1]) - np.asarray(coord)):
                    pixel = self._snap(coord, prev)
                    if pixel != last:
                        seq.append(pixel)
                        last = pixel
                if i == len(group) - 1:
                    # did this sequence end on its side's far corner?
                    if side == 0 and coord[0] == 0:
                        corners[0] = True
                    elif side == 1 and coord[1] == self.width - 1:
                        corners[1] = True
                    elif side == 2 and coord[0] == self.height - 1:
                        corners[2] = True
                    elif side == 3 and coord[1] == 0.0:
                        corners[3] = True
                prev = coord
            sequences.append({"distance": self._perimeter_distance(seq[0]), "sequence": seq})

        if not corners[0]:
            sequences.append({"distance": 0, "sequence": [(0, 0)]})
        if not corners[1]:
            sequences.append({"distance": self.width, "sequence": [(0, self.width - 1)]})
        if not corners[2]:
            sequences.append({"distance": self.width + self.height,
                              "sequence": [(self.height - 1, self.width - 1)]})
        if not corners[3]:
            sequences.append({"distance": 2 * self.width + self.height,
                              "sequence": [(self.height - 1, 0)]})

        sequences.sort(key=lambda s: s["distance"])
        pixels: list[tuple[int, int]] = []
        last = (-1, -1)
        for s in sequences:
            if s["sequence"][0] == last and pixels:
                pixels.pop()
            pixels.extend(s["sequence"])
            last = pixels[-1]
        if pixels[0] == last:
            pixels.pop(0)
        if pixels[0] == (0, 0):
            pixels.append(pixels.pop(0))
        return np.flip(np.asarray(pixels, dtype=np.int32), axis=None).copy()


class GenerateInstanceContour(Transform):
    """Succinct (x, y) contour of one instance mask [1, H, W]
    (reference: post/array.py:537)."""

    def __init__(self, min_num_points: int = 3, contour_level: float | None = None):
        self.min_num_points = min_num_points
        self.contour_level = contour_level

    def __call__(self, inst_mask, offset: Sequence[int] | None = (0, 0)):
        mask = np.squeeze(_as_np(inst_mask))
        raw = find_contours(mask, level=self.contour_level)
        contour = GenerateSuccinctContour(mask.shape[0], mask.shape[1])(raw)
        if contour is None or contour.ndim != 2 or contour.shape[0] < self.min_num_points:
            return None
        offset = offset or (0, 0)
        contour = contour.copy()
        contour[:, 0] += offset[0]
        contour[:, 1] += offset[1]
        return contour


class GenerateInstanceCentroid(Transform):
    """Center of mass of one instance mask [1, H, W, [D]] plus offset
    (reference: post/array.py:584; centroid == scipy center_of_mass)."""

    def __init__(self, dtype=int):
        self.dtype = dtype

    def __call__(self, inst_mask, offset: Sequence[int] | int = 0):
        from scipy import ndimage as ndi

        mask = _as_np(inst_mask)[0]
        if np.isscalar(offset):
            offset = (offset,) * mask.ndim
        com = ndi.center_of_mass(mask.astype(bool))
        out = np.asarray([c + o for c, o in zip(com, offset)])
        return out.astype(self.dtype) if self.dtype is not None else out


class GenerateInstanceType(Transform):
    """Most-dominant non-zero type inside one instance + its probability
    (reference: post/array.py:617)."""

    def __call__(self, type_pred, seg_pred, bbox: np.ndarray, instance_id: int):
        type_pred = _as_np(type_pred)
        seg_pred = _as_np(seg_pred)
        rmin, rmax, cmin, cmax = np.asarray(bbox).flatten()
        seg_crop = seg_pred[0, rmin:rmax, cmin:cmax] == instance_id
        type_crop = type_pred[0, rmin:rmax, cmin:cmax]
        inside = type_crop[seg_crop]
        types, counts = np.unique(inside, return_counts=True)
        order = np.argsort(-counts)
        types, counts = types[order], counts[order]
        inst_type = types[0]
        if inst_type == 0 and len(types) > 1:  # pick 2nd-most dominant over background
            inst_type = types[1]
        type_prob = counts[list(types).index(inst_type)] / (np.sum(seg_crop) + 1e-6)
        return int(inst_type), float(type_prob)


class HoVerNetNuclearTypePostProcessing(Transform):
    """Attach a nuclear type + probability to every instance, optionally emitting a
    pixel-level type map (reference: post/array.py:755)."""

    def __init__(self, activation: str | Callable = "softmax", threshold: float | None = None,
                 return_type_map: bool = True):
        from ...transforms.post_array import Activations, AsDiscrete

        self.return_type_map = return_type_map
        self.generate_instance_type = GenerateInstanceType()
        use_softmax = use_sigmoid = False
        other = None
        if isinstance(activation, str):
            if activation.lower() == "softmax":
                use_softmax = True
            elif activation.lower() == "sigmoid":
                use_sigmoid = True
            else:
                raise ValueError(f"activation must be 'softmax'/'sigmoid'/callable, got {activation!r}.")
        elif callable(activation):
            other = activation
        else:
            raise ValueError(f"activation must be str or callable, got {type(activation)}.")
        self.activation = Activations(softmax=use_softmax, sigmoid=use_sigmoid, other=other)
        if not use_softmax and threshold is None:
            threshold = 0.5
        self.as_discrete = AsDiscrete(threshold=threshold, argmax=use_softmax)

    def __call__(self, type_prediction, instance_info: dict, instance_map):
        type_pred = _as_np(self.as_discrete(self.activation(_as_np(type_prediction))))
        inst_map = _as_np(instance_map)
        type_map = np.zeros_like(inst_map) if self.return_type_map else None
        for inst_id in instance_info:
            inst_type, prob = self.generate_instance_type(
                type_pred=type_pred, seg_pred=inst_map,
                bbox=instance_info[inst_id]["bounding_box"], instance_id=inst_id)
            instance_info[inst_id]["type_prob"] = prob
            instance_info[inst_id]["type"] = inst_type
            if type_map is not None:
                type_map[inst_map == inst_id] = inst_type
        return instance_info, type_map


# ---------------------------------------------------------------------------
# dictionary wrappers (reference: post/dictionary.py:76-620)
# ---------------------------------------------------------------------------
class Watershedd(MapTransform):
    """Dict wrapper of Watershed (reference: post/dictionary.py:76)."""

    def __init__(self, keys, mask_key: str | None = "mask", markers_key: str | None = None,
                 connectivity: int | None = 1, dtype=np.uint8, allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.mask_key = mask_key
        self.markers_key = markers_key
        self.transform = Watershed(connectivity=connectivity, dtype=dtype)

    def __call__(self, data: Mapping[Hashable, object]) -> dict:
        d = dict(data)
        markers = d[self.markers_key] if self.markers_key else None
        mask = d[self.mask_key] if self.mask_key else None
        for key in self.key_iterator(d):
            d[key] = self.transform(d[key], mask, markers)
        return d


class GenerateSuccinctContourd(MapTransform):
    """Dict wrapper of GenerateSuccinctContour (reference: post/dictionary.py:297)."""

    def __init__(self, keys, height: int, width: int, allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.converter = GenerateSuccinctContour(height=height, width=width)

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.converter(d[key])
        return d


class GenerateInstanceContourd(MapTransform):
    """Dict wrapper of GenerateInstanceContour; writes `{key}_{postfix}`
    (reference: post/dictionary.py:325)."""

    def __init__(self, keys, contour_key_postfix: str = "contour", offset_key: str | None = None,
                 min_num_points: int = 3, level: float | None = None,
                 allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.converter = GenerateInstanceContour(min_num_points=min_num_points, contour_level=level)
        self.contour_key_postfix = contour_key_postfix
        self.offset_key = offset_key

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            offset = d[self.offset_key] if self.offset_key else None
            out_key = f"{key}_{self.contour_key_postfix}"
            if out_key in d:
                raise KeyError(f"Contour with key {out_key} already exists.")
            d[out_key] = self.converter(d[key], offset)
        return d


class GenerateInstanceCentroidd(MapTransform):
    """Dict wrapper of GenerateInstanceCentroid; writes `{key}_{postfix}`
    (reference: post/dictionary.py:372)."""

    def __init__(self, keys, centroid_key_postfix: str = "centroid",
                 offset_key: str | None = None, dtype=int, allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.converter = GenerateInstanceCentroid(dtype=dtype)
        self.centroid_key_postfix = centroid_key_postfix
        self.offset_key = offset_key

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            offset = d[self.offset_key] if self.offset_key else 0
            out_key = f"{key}_{self.centroid_key_postfix}"
            if out_key in d:
                raise KeyError(f"Centroid with key {out_key} already exists.")
            d[out_key] = self.converter(d[key], offset)
        return d


class GenerateInstanceTyped(MapTransform):
    """Dict wrapper of GenerateInstanceType; writes `{type_info_key}`
    (reference: post/dictionary.py:414)."""

    def __init__(self, keys, type_info_key: str = "type_info", bbox_key: str = "bbox",
                 seg_pred_key: str = "seg", instance_id_key: str = "id",
                 allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.converter = GenerateInstanceType()
        self.type_info_key = type_info_key
        self.bbox_key = bbox_key
        self.seg_pred_key = seg_pred_key
        self.instance_id_key = instance_id_key

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            inst_type, prob = self.converter(d[key], d[self.seg_pred_key],
                                             d[self.bbox_key], d[self.instance_id_key])
            if self.type_info_key in d:
                raise KeyError(f"Type information with key {self.type_info_key} already exists.")
            d[self.type_info_key] = {"inst_type": inst_type, "type_prob": prob}
        return d


class HoVerNetNuclearTypePostProcessingd(Transform):
    """Dict wrapper of HoVerNetNuclearTypePostProcessing
    (reference: post/dictionary.py:547)."""

    def __init__(self, type_prediction_key: str = "type_prediction",
                 instance_info_key: str = "instance_info",
                 instance_map_key: str = "instance_map", type_map_key: str = "type_map",
                 **kwargs):
        self.type_prediction_key = type_prediction_key
        self.instance_info_key = instance_info_key
        self.instance_map_key = instance_map_key
        self.type_map_key = type_map_key
        self.converter = HoVerNetNuclearTypePostProcessing(**kwargs)

    def __call__(self, data):
        d = dict(data)
        d[self.instance_info_key], type_map = self.converter(
            d[self.type_prediction_key], d[self.instance_info_key], d[self.instance_map_key])
        if type_map is not None:
            d[self.type_map_key] = type_map
        return d


class GenerateWatershedMaskd(MapTransform):
    """Dict wrapper of GenerateWatershedMask (reference: post/dictionary.py:127):
    reads the prediction at each key, writes the foreground mask to ``mask_key``."""

    def __init__(self, keys, mask_key: str = "mask", activation="softmax",
                 threshold: float | None = None, min_object_size: int = 10,
                 allow_missing_keys: bool = False, **kwargs):
        super().__init__(keys, allow_missing_keys)
        from .hovernet_utils import GenerateWatershedMask

        self.mask_key = mask_key
        self.transform = GenerateWatershedMask(activation=activation, threshold=threshold,
                                               min_object_size=min_object_size)

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            mask = self.transform(d[key])
            if self.mask_key in d:
                raise KeyError(f"Mask with key {self.mask_key} already exists.")
            d[self.mask_key] = mask
        return d


class GenerateInstanceBorderd(Transform):
    """Dict wrapper of GenerateInstanceBorder (reference: post/dictionary.py:171)."""

    def __init__(self, mask_key: str = "mask", hover_map_key: str = "hover_map",
                 border_key: str = "border", kernel_size: int = 5, **kwargs):
        from .hovernet_utils import GenerateInstanceBorder

        self.mask_key = mask_key
        self.hover_map_key = hover_map_key
        self.border_key = border_key
        self.transform = GenerateInstanceBorder(kernel_size=kernel_size)

    def __call__(self, data):
        d = dict(data)
        if self.border_key in d:
            raise KeyError(f"Border with key {self.border_key} already exists.")
        d[self.border_key] = self.transform(d[self.mask_key], d[self.hover_map_key])
        return d


class GenerateDistanceMapd(Transform):
    """Dict wrapper of GenerateDistanceMap (reference: post/dictionary.py:212)."""

    def __init__(self, mask_key: str = "mask", border_key: str = "border",
                 dist_map_key: str = "dist_map", smooth_fn=None, **kwargs):
        from .hovernet_utils import GenerateDistanceMap

        self.mask_key = mask_key
        self.border_key = border_key
        self.dist_map_key = dist_map_key
        self.transform = GenerateDistanceMap(smooth_fn=smooth_fn)

    def __call__(self, data):
        d = dict(data)
        if self.dist_map_key in d:
            raise KeyError(f"Distance map with key {self.dist_map_key} already exists.")
        d[self.dist_map_key] = self.transform(d[self.mask_key], d[self.border_key])
        return d


class GenerateWatershedMarkersd(Transform):
    """Dict wrapper of GenerateWatershedMarkers (reference: post/dictionary.py:248)."""

    def __init__(self, mask_key: str = "mask", border_key: str = "border",
                 markers_key: str = "markers", threshold: float = 0.4, radius: int = 2,
                 min_object_size: int = 10, postprocess_fn=None, **kwargs):
        from .hovernet_utils import GenerateWatershedMarkers

        self.mask_key = mask_key
        self.border_key = border_key
        self.markers_key = markers_key
        self.postprocess_fn = postprocess_fn
        self.transform = GenerateWatershedMarkers(threshold=threshold, radius=radius,
                                                  min_object_size=min_object_size)

    def __call__(self, data):
        d = dict(data)
        if self.markers_key in d:
            raise KeyError(f"Markers with key {self.markers_key} already exists.")
        markers = self.transform(d[self.mask_key], d[self.border_key])
        if self.postprocess_fn is not None:
            markers = self.postprocess_fn(markers)
        d[self.markers_key] = markers
        return d


class HoVerNetInstanceMapPostProcessingd(Transform):
    """Dict wrapper of HoVerNetInstanceMapPostProcessing
    (reference: post/dictionary.py:462): writes ``instance_info`` and
    ``instance_map`` from the NP and HV branch predictions."""

    def __init__(self, nuclear_prediction_key: str = "nucleus_prediction",
                 hover_map_key: str = "horizontal_vertical",
                 instance_info_key: str = "instance_info",
                 instance_map_key: str = "instance_map", **kwargs):
        from .hovernet_utils import HoVerNetInstanceMapPostProcessing

        self.nuclear_prediction_key = nuclear_prediction_key
        self.hover_map_key = hover_map_key
        self.instance_info_key = instance_info_key
        self.instance_map_key = instance_map_key
        self.converter = HoVerNetInstanceMapPostProcessing(**kwargs)

    def __call__(self, data):
        d = dict(data)
        for key in (self.instance_info_key, self.instance_map_key):
            if key in d:
                raise KeyError(f"The output key {key} already exists.")
        d[self.instance_info_key], d[self.instance_map_key] = self.converter(
            d[self.nuclear_prediction_key], d[self.hover_map_key])
        return d
