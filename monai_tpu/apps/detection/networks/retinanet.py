"""RetinaNet network + detector (reference: monai/apps/detection/networks/
retinanet_network.py:209 RetinaNet, retinanet_detector.py:68 RetinaNetDetector)."""
from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ....data.box_utils import clip_boxes_to_image, non_max_suppression
from ....losses.focal_loss import sigmoid_focal_loss
from ....networks.blocks.convolutions import Convolution
from ..utils.anchor_utils import AnchorGenerator
from ..utils.box_coder import BoxCoder
from ..utils.matchers import ATSSMatcher

__all__ = ["RetinaNetHead", "RetinaNet", "RetinaNetDetector"]


class _HeadTower(nnx.Module):
    def __init__(self, spatial_dims, in_ch, out_logits, num_convs=4, *, rngs):
        convs = []
        ch = in_ch
        for _ in range(num_convs):
            convs.append(Convolution(spatial_dims, ch, in_ch, act="RELU", norm=("GROUP", {"num_groups": 8}),
                                     rngs=rngs))
            ch = in_ch
        convs.append(Convolution(spatial_dims, ch, out_logits, act=None, norm=None, conv_only=True,
                                 rngs=rngs))
        self.convs = nnx.List(convs)

    def __call__(self, x):
        for c in self.convs:
            x = c(x)
        return x


class RetinaNetHead(nnx.Module):
    """Classification + regression towers (reference: retinanet_network.py)."""

    def __init__(self, spatial_dims: int, in_channels: int, num_anchors: int, num_classes: int,
                 *, rngs: nnx.Rngs):
        self.num_classes = num_classes
        self.num_anchors = num_anchors
        self.spatial_dims = spatial_dims
        self.classification_head = _HeadTower(spatial_dims, in_channels, num_anchors * num_classes,
                                              rngs=rngs)
        self.regression_head = _HeadTower(spatial_dims, in_channels, num_anchors * 2 * spatial_dims,
                                          rngs=rngs)

    def __call__(self, features: Sequence[jnp.ndarray]):
        cls_logits, box_regs = [], []
        for f in features:
            cls_logits.append(self.classification_head(f))
            box_regs.append(self.regression_head(f))
        return cls_logits, box_regs


class RetinaNet(nnx.Module):
    """Backbone(FPN-ish) + heads (reference: retinanet_network.py:209).

    A compact conv backbone emitting len(scales) pyramid levels; channel-first I/O.
    """

    def __init__(self, spatial_dims: int, num_classes: int, num_anchors: int, in_channels: int = 1,
                 feature_channels: int = 32, num_levels: int = 3, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.num_classes = num_classes
        self.num_anchors = num_anchors
        stem = [Convolution(spatial_dims, in_channels, feature_channels, strides=2, act="RELU",
                            norm=("GROUP", {"num_groups": 8}), rngs=rngs)]
        self.stem = nnx.List(stem)
        downs = []
        for _ in range(num_levels):
            downs.append(Convolution(spatial_dims, feature_channels, feature_channels, strides=2,
                                     act="RELU", norm=("GROUP", {"num_groups": 8}), rngs=rngs))
        self.downs = nnx.List(downs)
        self.head = RetinaNetHead(spatial_dims, feature_channels, num_anchors, num_classes, rngs=rngs)

    def __call__(self, images: jnp.ndarray):
        perm_in = (0,) + tuple(range(2, images.ndim)) + (1,)
        h = jnp.transpose(images, perm_in)
        for m in self.stem:
            h = m(h)
        feats = []
        for m in self.downs:
            h = m(h)
            feats.append(h)
        cls_logits, box_regs = self.head(feats)

        def to_cf(x):
            return jnp.transpose(x, (0, x.ndim - 1) + tuple(range(1, x.ndim - 1)))

        return [to_cf(c) for c in cls_logits], [to_cf(b) for b in box_regs]


class RetinaNetDetector:
    """Training target assignment + inference postprocessing
    (reference: retinanet_detector.py:68)."""

    def __init__(self, network: RetinaNet, anchor_generator: AnchorGenerator, box_coder: BoxCoder | None = None,
                 spatial_dims: int | None = None, num_classes: int | None = None,
                 score_thresh: float = 0.05, nms_thresh: float = 0.5, detections_per_img: int = 100):
        self.network = network
        self.anchor_generator = anchor_generator
        self.spatial_dims = spatial_dims or network.spatial_dims
        self.num_classes = num_classes or network.num_classes
        self.box_coder = box_coder or BoxCoder(weights=(1.0,) * (2 * self.spatial_dims))
        self.matcher = ATSSMatcher(num_candidates=4)
        self.score_thresh = score_thresh
        self.nms_thresh = nms_thresh
        self.detections_per_img = detections_per_img

    def _flatten_preds(self, cls_logits, box_regs):
        """(per-level channel-first maps) → (A_total, C) / (A_total, 2D) per image."""
        b = cls_logits[0].shape[0]
        cls_flat, box_flat = [], []
        for c, r in zip(cls_logits, box_regs):
            A = self.network.num_anchors
            spatial = c.shape[2:]
            n = int(np.prod(spatial))
            cc = c.reshape(b, A, self.num_classes, n)
            cc = jnp.moveaxis(cc, -1, 1).reshape(b, A * n, self.num_classes)
            rr = r.reshape(b, A, 2 * self.spatial_dims, n)
            rr = jnp.moveaxis(rr, -1, 1).reshape(b, A * n, 2 * self.spatial_dims)
            cls_flat.append(cc)
            box_flat.append(rr)
        return jnp.concatenate(cls_flat, axis=1), jnp.concatenate(box_flat, axis=1)

    def compute_loss(self, images: jnp.ndarray, targets: list[dict]):
        """Focal classification + L1 box regression (reference: retinanet_detector.py)."""
        cls_logits, box_regs = self.network(images)
        anchors = self.anchor_generator(np.asarray(images), [np.asarray(c) for c in cls_logits])
        cls_flat, box_flat = self._flatten_preds(cls_logits, box_regs)
        total_cls = 0.0
        total_reg = 0.0
        for i, target in enumerate(targets):
            gt_boxes = np.asarray(target["boxes"], dtype=np.float32)
            gt_labels = np.asarray(target["labels"], dtype=np.int64)
            _, matches = self.matcher(gt_boxes, anchors[i])
            pos = matches >= 0
            cls_target = np.zeros((anchors[i].shape[0], self.num_classes), dtype=np.float32)
            if pos.any():
                cls_target[pos, gt_labels[matches[pos]]] = 1.0
            valid = matches != self.matcher.BETWEEN_THRESHOLDS
            cls_loss = sigmoid_focal_loss(cls_flat[i], jnp.asarray(cls_target), gamma=2.0, alpha=0.25)
            total_cls = total_cls + jnp.sum(cls_loss * jnp.asarray(valid)[:, None]) / max(pos.sum(), 1)
            if pos.any():
                reg_target = self.box_coder.encode_single(gt_boxes[matches[pos]], anchors[i][pos])
                pred = box_flat[i][jnp.asarray(np.where(pos)[0])]
                total_reg = total_reg + jnp.mean(jnp.abs(pred - jnp.asarray(reg_target)))
        n = len(targets)
        return {"classification": total_cls / n, "box_regression": total_reg / n}

    def predict(self, images: jnp.ndarray) -> list[dict]:
        """Decode + NMS (reference: retinanet_detector.py postprocess_detections)."""
        cls_logits, box_regs = self.network(images)
        anchors = self.anchor_generator(np.asarray(images), [np.asarray(c) for c in cls_logits])
        cls_flat, box_flat = self._flatten_preds(cls_logits, box_regs)
        results = []
        spatial_size = images.shape[2:]
        for i in range(images.shape[0]):
            scores = np.asarray(jax.nn.sigmoid(cls_flat[i]))
            boxes_dec = self.box_coder.decode_single(np.asarray(box_flat[i]), anchors[i])
            out_boxes, out_scores, out_labels = [], [], []
            for c in range(self.num_classes):
                sc = scores[:, c]
                keep = sc > self.score_thresh
                if not keep.any():
                    continue
                b_c = boxes_dec[keep]
                s_c = sc[keep]
                b_c, mask = clip_boxes_to_image(b_c, spatial_size, remove_empty=True)
                s_c = s_c[np.asarray(mask)]
                keep_idx = non_max_suppression(b_c, s_c, self.nms_thresh,
                                               max_proposals=self.detections_per_img)
                out_boxes.append(b_c[keep_idx])
                out_scores.append(s_c[keep_idx])
                out_labels.append(np.full(len(keep_idx), c, dtype=np.int64))
            if out_boxes:
                results.append({"boxes": np.concatenate(out_boxes), "scores": np.concatenate(out_scores),
                                "labels": np.concatenate(out_labels)})
            else:
                results.append({"boxes": np.zeros((0, 2 * self.spatial_dims)),
                                "scores": np.zeros((0,)), "labels": np.zeros((0,), dtype=np.int64)})
        return results


class RetinaNetClassificationHead(_HeadTower):
    """Classification tower emitting num_anchors*num_classes logit maps
    (reference: retinanet_network.py RetinaNetClassificationHead)."""

    def __init__(self, in_channels: int, num_anchors: int, num_classes: int,
                 spatial_dims: int = 3, prior_probability: float = 0.01, *, rngs):
        super().__init__(spatial_dims, in_channels, num_anchors * num_classes, rngs=rngs)
        self.num_classes = num_classes
        self.num_anchors = num_anchors

    def __call__(self, x):
        if isinstance(x, (list, tuple)):
            return [super(RetinaNetClassificationHead, self).__call__(f) for f in x]
        return super().__call__(x)


class RetinaNetRegressionHead(_HeadTower):
    """Box-delta regression tower emitting num_anchors*2*spatial_dims maps
    (reference: retinanet_network.py RetinaNetRegressionHead)."""

    def __init__(self, in_channels: int, num_anchors: int, spatial_dims: int = 3, *, rngs):
        super().__init__(spatial_dims, in_channels, num_anchors * 2 * spatial_dims, rngs=rngs)
        self.num_anchors = num_anchors

    def __call__(self, x):
        if isinstance(x, (list, tuple)):
            return [super(RetinaNetRegressionHead, self).__call__(f) for f in x]
        return super().__call__(x)


__all__ += ["RetinaNetClassificationHead", "RetinaNetRegressionHead"]


def resnet_fpn_feature_extractor(backbone, spatial_dims: int, pretrained_backbone: bool = False,
                                 returned_layers=(1, 2, 3), trainable_backbone_layers=None,
                                 *, rngs=None):
    """ResNet + FPN feature extractor for RetinaNet (reference:
    retinanet_network.py:330 resnet_fpn_feature_extractor). ``backbone`` is a
    monai_tpu ResNet (or ResNetFeatures); returns a BackboneWithFPN whose call
    yields a dict of len(returned_layers)+1 channel-last pyramid maps."""
    from flax import nnx

    from ....networks.blocks.feature_pyramid_network import BackboneWithFPN, LastLevelMaxPool
    from ....networks.nets.resnet import ResNetBottleneck

    rngs = rngs or nnx.Rngs(0)
    returned_layers = list(returned_layers)
    if min(returned_layers) <= 0 or max(returned_layers) >= 5:
        raise ValueError(f"returned_layers should be in [1, 4], got {returned_layers}")
    expansion = 4 if any(isinstance(b, ResNetBottleneck) for b in backbone.layer1) else 1
    in_channels_list = [64 * expansion * 2 ** (i - 1) for i in returned_layers]

    class _Body(nnx.Module):
        """Channel-last multi-scale feature body over the ResNet layers."""

        def __init__(self, net):
            self.net = net

        def __call__(self, x):
            import jax.numpy as jnp

            net = self.net
            h = net.act(net.bn1(net.conv1(x)))
            if not net.no_max_pool:
                h = net.maxpool(h)
            feats = {}
            for idx, layer in enumerate((net.layer1, net.layer2, net.layer3, net.layer4), start=1):
                for blk in layer:
                    h = blk(h)
                if idx in returned_layers:
                    feats[str(idx - 1)] = h
            return feats

    return_layers = {f"layer{k}": str(v) for v, k in enumerate(returned_layers)}
    return BackboneWithFPN(_Body(backbone), return_layers, in_channels_list,
                           out_channels=256, spatial_dims=spatial_dims,
                           extra_blocks=LastLevelMaxPool(), rngs=rngs)


def retinanet_resnet50_fpn_detector(num_classes: int, anchor_generator,
                                    returned_layers=(1, 2, 3), pretrained: bool = False,
                                    progress: bool = True, *, rngs=None, **kwargs) -> "RetinaNetDetector":
    """RetinaNetDetector over our compact RetinaNet with a ResNet-50-FPN-scale
    backbone (reference: retinanet_detector.py:1015). ``pretrained`` MedicalNet
    weights need egress; load them explicitly via copy_model_state instead."""
    from flax import nnx

    from ....networks.nets.resnet import resnet50

    rngs = rngs or nnx.Rngs(0)
    if pretrained:
        raise ValueError("pretrained MedicalNet weights require network access; "
                         "load weights explicitly with copy_model_state instead.")
    spatial_dims = kwargs.pop("spatial_dims", 3)
    backbone = resnet50(spatial_dims=spatial_dims, feed_forward=False,
                        n_input_channels=kwargs.pop("n_input_channels", 1), rngs=rngs,
                        **{k: v for k, v in kwargs.items()
                           if k in ("conv1_t_size", "conv1_t_stride", "shortcut_type")})
    feature_extractor = resnet_fpn_feature_extractor(
        backbone=backbone, spatial_dims=spatial_dims, pretrained_backbone=pretrained,
        trainable_backbone_layers=None, returned_layers=list(returned_layers), rngs=rngs)
    num_anchors = anchor_generator.num_anchors_per_location()[0]
    network = RetinaNetWithBackbone(spatial_dims=spatial_dims, num_classes=num_classes,
                                    num_anchors=num_anchors, feature_extractor=feature_extractor,
                                    rngs=rngs)
    return RetinaNetDetector(network, anchor_generator)


class RetinaNetWithBackbone(nnx.Module):
    """RetinaNet over an explicit BackboneWithFPN feature extractor; same I/O
    contract as the compact RetinaNet above (list of channel-first per-level
    cls/box maps) (reference: retinanet_network.py:209 RetinaNet)."""

    def __init__(self, spatial_dims: int, num_classes: int, num_anchors: int,
                 feature_extractor, *, rngs: nnx.Rngs):
        self.spatial_dims = spatial_dims
        self.num_classes = num_classes
        self.num_anchors = num_anchors
        self.feature_extractor = feature_extractor
        self.head = RetinaNetHead(spatial_dims, feature_extractor.out_channels,
                                  num_anchors, num_classes, rngs=rngs)

    def __call__(self, images):
        import jax.numpy as jnp

        perm_in = (0,) + tuple(range(2, images.ndim)) + (1,)
        feats = self.feature_extractor(jnp.transpose(images, perm_in))
        feat_list = list(feats.values()) if isinstance(feats, dict) else list(feats)
        cls_logits, box_regs = self.head(feat_list)

        def to_cf(x):
            return jnp.transpose(x, (0, x.ndim - 1) + tuple(range(1, x.ndim - 1)))

        return [to_cf(c) for c in cls_logits], [to_cf(b) for b in box_regs]
