"""NuClick interactive nuclei-segmentation transforms
(reference: monai/apps/nuclick/transforms.py:30-623).

Host-side numpy/scipy transforms (connected components, guidance point rasterization);
they prepare patches/click channels that feed TPU-side networks.
"""
from __future__ import annotations

import math
from typing import Any

import numpy as np

from ...transforms.transform import MapTransform, Randomizable
from ...utils.backend import to_numpy
from ...utils.enums import StrEnum

__all__ = ["NuclickKeys", "FlattenLabeld", "ExtractPatchd", "SplitLabeld", "FilterImaged",
           "AddPointGuidanceSignald", "AddClickSignalsd", "PostFilterLabeld",
           "AddLabelAsGuidanced", "SetLabelClassd"]


class NuclickKeys(StrEnum):
    """(reference: nuclick/transforms.py:30)."""

    IMAGE = "image"
    LABEL = "label"
    OTHERS = "others"
    FOREGROUND = "foreground"
    CENTROID = "centroid"
    MASK_VALUE = "mask_value"
    LOCATION = "location"
    NUC_POINTS = "nuc_points"
    BOUNDING_BOXES = "bounding_boxes"
    IMG_HEIGHT = "img_height"
    IMG_WIDTH = "img_width"
    PRED_CLASSES = "pred_classes"


def _cc_label(arr: np.ndarray, connectivity: int = 1) -> np.ndarray:
    from scipy import ndimage as ndi

    structure = ndi.generate_binary_structure(arr.ndim, connectivity)
    lab, _ = ndi.label(arr, structure=structure)
    return lab


def _remove_small(mask: np.ndarray, min_size: int) -> np.ndarray:
    from scipy import ndimage as ndi

    lab, n = ndi.label(mask)
    if n == 0:
        return mask
    sizes = np.bincount(lab.ravel())
    keep = np.where(sizes >= min_size)[0]
    keep = keep[keep != 0]
    return np.isin(lab, keep)


def _fill_small_holes(mask: np.ndarray, area_threshold: int) -> np.ndarray:
    holes = ~mask
    big_holes = _remove_small(holes, area_threshold)
    return ~big_holes | mask


class FlattenLabeld(MapTransform):
    """One label id per connected component (reference: nuclick/transforms.py:51)."""

    def __init__(self, keys, connectivity: int = 1, allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.connectivity = connectivity

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = _cc_label(to_numpy(d[key]), self.connectivity).astype(np.uint8)
        return d


class ExtractPatchd(MapTransform):
    """Patch around a centroid, clamped to image bounds (reference: nuclick/transforms.py:73)."""

    def __init__(self, keys, centroid_key: str = NuclickKeys.CENTROID,
                 patch_size: int = 128, allow_missing_keys: bool = False, **kwargs):
        super().__init__(keys, allow_missing_keys)
        self.centroid_key = centroid_key
        self.patch_size = patch_size
        self.kwargs = kwargs

    def bbox(self, patch_size, centroid, size):
        x, y = centroid
        m, n = size
        x_start = int(max(x - patch_size / 2, 0))
        y_start = int(max(y - patch_size / 2, 0))
        x_end = x_start + patch_size
        y_end = y_start + patch_size
        if x_end > m:
            x_end = m
            x_start = m - patch_size
        if y_end > n:
            y_end = n
            y_start = n - patch_size
        return x_start, x_end, y_start, y_end

    def __call__(self, data):
        d = dict(data)
        centroid = d[self.centroid_key]
        for key in self.key_iterator(d):
            img = to_numpy(d[key])
            x0, x1, y0, y1 = self.bbox(self.patch_size, centroid, img.shape[-2:])
            cropped = img[:, x0:x1, y0:y1]
            ph = self.patch_size - cropped.shape[-2]
            pw = self.patch_size - cropped.shape[-1]
            if ph > 0 or pw > 0:
                cropped = np.pad(cropped, [(0, 0), (ph // 2, ph - ph // 2),
                                           (pw // 2, pw - pw // 2)])
            d[key] = cropped
        return d


class SplitLabeld(MapTransform):
    """Split one nucleus label from the rest (reference: nuclick/transforms.py:131)."""

    def __init__(self, keys, others: str = NuclickKeys.OTHERS,
                 mask_value: str | None = NuclickKeys.MASK_VALUE, min_area: int = 5,
                 others_value: int = 0, to_binary_mask: bool = True):
        super().__init__(keys, allow_missing_keys=False)
        self.others = others
        self.mask_value = mask_value
        self.min_area = min_area
        self.others_value = others_value
        self.to_binary_mask = to_binary_mask

    def __call__(self, data):
        d = dict(data)
        if len(self.keys) > 1:
            raise ValueError("Only a single 'label' key is supported.")
        for key in self.key_iterator(d):
            label = to_numpy(d[key])
            mask = label.copy()
            if self.mask_value:
                mask_value = d[self.mask_value]
                mask[label != mask_value] = 0
            else:
                mask[label >= self.others_value] = 0
                mask_value = int(mask.max())
            if self.to_binary_mask:
                mask[mask > 0] = 1
            others = label.copy()
            others[label == mask_value] = 0
            others[others > 0] = 1
            if np.count_nonzero(others):
                others = _cc_label(others[0], 1)[None]
            d[key] = mask.astype(np.uint8)
            d[self.others] = others.astype(np.uint8)
        return d


class FilterImaged(MapTransform):
    """Filter green/gray background of H&E patches (reference: nuclick/transforms.py:198)."""

    def __init__(self, keys, min_size: int = 500, allow_missing_keys: bool = False):
        super().__init__(keys, allow_missing_keys)
        self.min_size = min_size

    def mask_percent(self, arr):
        if arr.ndim == 3 and arr.shape[2] == 3:
            arr = arr[:, :, 0] + arr[:, :, 1] + arr[:, :, 2]
        return 100 - np.count_nonzero(arr) / arr.size * 100

    def filter_green_channel(self, img_np, green_thresh=200, avoid_overmask=True,
                             overmask_thresh=90):
        g = img_np[:, :, 1]
        mask = (g < green_thresh) & (g > 0)
        if avoid_overmask and self.mask_percent(mask) >= overmask_thresh and green_thresh < 255:
            new_thresh = math.ceil((255 - green_thresh) / 2 + green_thresh)
            mask = self.filter_green_channel(img_np, new_thresh, avoid_overmask, overmask_thresh)
        return mask

    def filter_grays(self, rgb, tolerance=15):
        rgb = rgb.astype(np.int64)
        rg = np.abs(rgb[:, :, 0] - rgb[:, :, 1]) <= tolerance
        rb = np.abs(rgb[:, :, 0] - rgb[:, :, 2]) <= tolerance
        gb = np.abs(rgb[:, :, 1] - rgb[:, :, 2]) <= tolerance
        return ~(rg & rb & gb)

    def filter_remove_small_objects(self, mask, min_size=3000, avoid_overmask=True,
                                    overmask_thresh=95):
        rem = _remove_small(mask.astype(bool), min_size)
        if avoid_overmask and self.mask_percent(rem) >= overmask_thresh and min_size >= 1:
            rem = self.filter_remove_small_objects(mask, round(min_size / 2),
                                                   avoid_overmask, overmask_thresh)
        return rem

    def filter(self, rgb):
        mask = self.filter_grays(rgb) & self.filter_green_channel(rgb)
        if self.min_size:
            mask = self.filter_remove_small_objects(mask, min_size=self.min_size)
        return rgb * np.dstack([mask] * 3)

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = self.filter(to_numpy(d[key]))
        return d


class AddPointGuidanceSignald(Randomizable, MapTransform):
    """Append inclusion/exclusion click channels (reference: nuclick/transforms.py:269)."""

    def __init__(self, image: str = NuclickKeys.IMAGE, label: str = NuclickKeys.LABEL,
                 others: str = NuclickKeys.OTHERS, drop_rate: float = 0.5,
                 jitter_range: int = 0, gaussian: bool = False, sigma: float = 1.0,
                 truncated: float = 2.0, add_exclusion_map: bool = True,
                 use_distance: bool = False):
        MapTransform.__init__(self, image)
        self.image = image
        self.label = label
        self.others = others
        self.drop_rate = drop_rate
        self.jitter_range = jitter_range
        self.gaussian = gaussian
        self.sigma = sigma
        self.truncated = truncated
        self.add_exclusion_map = add_exclusion_map
        self.use_distance = use_distance

    def _apply_gaussian(self, t: np.ndarray) -> np.ndarray:
        if not self.gaussian or np.count_nonzero(t) == 0:
            return t
        import jax.numpy as jnp

        from ...ops.gaussian import gaussian_filter

        out = gaussian_filter(jnp.asarray(t[None]), sigma=self.sigma, truncated=self.truncated)
        return np.asarray(out)[0]

    def _seed_point(self, label: np.ndarray):
        if self.use_distance:
            from scipy import ndimage as ndi

            distance = ndi.distance_transform_cdt(label).ravel()
            prob = np.exp(distance) - 1.0
            idx = np.where(label.ravel() > 0)[0]
            if len(idx) == 0:
                return None
            seed = self.R.choice(idx, size=1, p=prob[idx] / prob[idx].sum())
            return np.unravel_index(seed, label.shape)[0][0], np.unravel_index(seed, label.shape)[1][0]
        indices = np.argwhere(label > 0)
        if len(indices) == 0:
            return None
        i = self.R.randint(0, len(indices))
        return indices[i, 0], indices[i, 1]

    def inclusion_map(self, mask: np.ndarray, dtype) -> np.ndarray:
        pm = np.zeros_like(mask, dtype=dtype)
        pt = self._seed_point(mask)
        if pt is not None:
            pm[pt[0], pt[1]] = 1
        return pm

    def exclusion_map(self, others: np.ndarray, dtype, jitter_range: int,
                      drop_rate: float) -> np.ndarray:
        from scipy import ndimage as ndi

        pm = np.zeros_like(others, dtype=dtype)
        if self.R.choice([True, False], p=[drop_rate, 1 - drop_rate]):
            return pm
        max_x, max_y = pm.shape[0] - 1, pm.shape[1] - 1
        for val in np.unique(others[others > 0]):
            if self.R.choice([True, False], p=[drop_rate, 1 - drop_rate]):
                continue
            cx, cy = ndi.center_of_mass(others == val)
            x, y = int(math.floor(cx)), int(math.floor(cy))
            if jitter_range:
                x = min(max(0, x + self.R.randint(-jitter_range, jitter_range)), max_x)
                y = min(max(0, y + self.R.randint(-jitter_range, jitter_range)), max_y)
            pm[x, y] = 1
        return pm

    def __call__(self, data):
        d = dict(data)
        image = to_numpy(d[self.image])
        mask = to_numpy(d[self.label])
        inc = self._apply_gaussian(self.inclusion_map(mask[0], image.dtype))
        if self.add_exclusion_map:
            others = to_numpy(d[self.others])
            exc = self._apply_gaussian(self.exclusion_map(others[0], image.dtype,
                                                          self.jitter_range, self.drop_rate))
            d[self.image] = np.concatenate([image, inc[None], exc[None]], axis=0)
        else:
            d[self.image] = np.concatenate([image, inc[None]], axis=0)
        return d


class AddClickSignalsd(MapTransform):
    """Turn user clicks into per-click patches with click channels
    (reference: nuclick/transforms.py:394)."""

    def __init__(self, image: str = NuclickKeys.IMAGE, foreground: str = NuclickKeys.FOREGROUND,
                 bb_size: int = 128, gaussian: bool = False, sigma: float = 1.0,
                 truncated: float = 2.0, add_exclusion_map: bool = True):
        self.image = image
        self.foreground = foreground
        self.bb_size = bb_size
        self.gaussian = gaussian
        self.sigma = sigma
        self.truncated = truncated
        self.add_exclusion_map = add_exclusion_map

    def _apply_gaussian(self, t: np.ndarray) -> np.ndarray:
        if not self.gaussian or np.count_nonzero(t) == 0:
            return t
        import jax.numpy as jnp

        from ...ops.gaussian import gaussian_filter

        out = gaussian_filter(jnp.asarray(t[None]), sigma=self.sigma, truncated=self.truncated)
        return np.asarray(out)[0]

    def get_clickmap_boundingbox(self, img, cx, cy, x, y, bb=128):
        click_map = np.zeros_like(img[0])
        bad = {i for i in range(len(cx)) if not (0 <= cx[i] < x)} | \
              {i for i in range(len(cy)) if not (0 <= cy[i] < y)}
        cx = np.delete(cx, list(bad))
        cy = np.delete(cy, list(bad))
        click_map[cx, cy] = 1
        boxes = []
        for i in range(len(cx)):
            x0 = max(0, cx[i] - bb // 2)
            y0 = max(0, cy[i] - bb // 2)
            x1 = min(x0 + bb, x)
            y1 = min(y0 + bb, y)
            if x1 - x0 != bb:
                x0 = x1 - bb
            if y1 - y0 != bb:
                y0 = y1 - bb
            if x1 - x0 == bb and y1 - y0 == bb:
                boxes.append([int(x0), int(y0), int(x1), int(y1)])
        return click_map, boxes, cx, cy

    def __call__(self, data):
        d = dict(data)
        img = to_numpy(d[self.image])
        x, y = img.shape[-2], img.shape[-1]
        tx, ty = d.get(NuclickKeys.LOCATION, (0, 0))[:2]
        pos = d.get(self.foreground)
        pos = (np.array(pos) - (tx, ty)).astype(int).tolist() if pos else []
        cx = [p[0] for p in pos]
        cy = [p[1] for p in pos]
        click_map, boxes, cx, cy = self.get_clickmap_boundingbox(img, cx, cy, x, y, self.bb_size)
        if not boxes:
            raise ValueError("Failed to create patches from given click points")
        patches = []
        for i, (x0, y0, x1, y1) in enumerate(boxes):
            patch = img[:, x0:x1, y0:y1]
            this_click = np.zeros_like(img[0])
            this_click[cx[i], cy[i]] = 1
            nuc = self._apply_gaussian(this_click[x0:x1, y0:y1])
            if self.add_exclusion_map:
                other_map = ((click_map - this_click) > 0).astype(img.dtype)
                other = self._apply_gaussian(other_map[x0:x1, y0:y1])
                patches.append(np.concatenate([patch, nuc[None], other[None]]))
            else:
                patches.append(np.concatenate([patch, nuc[None]]))
        d[NuclickKeys.BOUNDING_BOXES] = boxes
        d[NuclickKeys.IMG_WIDTH] = x
        d[NuclickKeys.IMG_HEIGHT] = y
        d[self.image] = np.stack(patches)
        return d


class PostFilterLabeld(MapTransform):
    """Threshold + morphology cleanup + stitch per-click masks into an instance map
    (reference: nuclick/transforms.py:523)."""

    def __init__(self, keys, nuc_points: str = NuclickKeys.NUC_POINTS,
                 bounding_boxes: str = NuclickKeys.BOUNDING_BOXES,
                 img_height: str = NuclickKeys.IMG_HEIGHT,
                 img_width: str = NuclickKeys.IMG_WIDTH, thresh: float = 0.33,
                 min_size: int = 10, min_hole: int = 30, do_reconstruction: bool = False,
                 allow_missing_keys: bool = False,
                 pred_classes: str = NuclickKeys.PRED_CLASSES):
        super().__init__(keys, allow_missing_keys)
        self.bounding_boxes = bounding_boxes
        self.img_height = img_height
        self.img_width = img_width
        self.thresh = thresh
        self.min_size = min_size
        self.min_hole = min_hole
        self.pred_classes = pred_classes

    def post_processing(self, preds, thresh, min_size, min_hole):
        masks = preds > thresh
        for i in range(preds.shape[0]):
            masks[i] = _remove_small(masks[i], min_size)
            masks[i] = _fill_small_holes(masks[i], min_hole)
        return masks

    def gen_instance_map(self, masks, boxes, x, y, flatten=True, pred_classes=None):
        inst = np.zeros((x, y), dtype=np.uint16)
        for i, mask in enumerate(masks):
            bb = boxes[i]
            c = pred_classes[i] if pred_classes and i < len(pred_classes) else 1
            c = c if flatten else i + 1
            region = inst[bb[0]:bb[2], bb[1]:bb[3]]
            inst[bb[0]:bb[2], bb[1]:bb[3]] = np.where(mask > 0, c, region)
        return inst

    def __call__(self, data):
        d = dict(data)
        pred_classes = d.get(self.pred_classes)
        boxes = d[self.bounding_boxes]
        x = d[self.img_width]
        y = d[self.img_height]
        for key in self.key_iterator(d):
            label = to_numpy(d[key]).astype(np.float32)
            masks = self.post_processing(label, self.thresh, self.min_size, self.min_hole)
            d[key] = self.gen_instance_map(masks, boxes, x, y,
                                           pred_classes=pred_classes).astype(np.uint8)
        return d


class AddLabelAsGuidanced(MapTransform):
    """Append the (binarized) label as an extra channel (reference: nuclick/transforms.py:597)."""

    def __init__(self, keys, source: str = "label"):
        super().__init__(keys, allow_missing_keys=False)
        self.source = source

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            image = to_numpy(d[key])
            label = (to_numpy(d[self.source]) > 0).astype(image.dtype)
            if label.ndim < image.ndim:
                label = label[None]
            d[key] = np.concatenate([image, label], axis=max(image.ndim - 3, 0))
        return d


class SetLabelClassd(MapTransform):
    """Reduce a labelmap to its scalar class id (reference: nuclick/transforms.py:623)."""

    def __init__(self, keys, offset: int = -1):
        super().__init__(keys, allow_missing_keys=False)
        self.offset = offset

    def __call__(self, data):
        d = dict(data)
        for key in self.key_iterator(d):
            d[key] = int(to_numpy(d[key]).max()) + self.offset
        return d
