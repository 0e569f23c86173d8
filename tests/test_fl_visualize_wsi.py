"""Coverage for the FL client round-trip, the visualize suite, and the PIL-backed
WSI reader/dataset (reference: monai/fl/client/monai_algo.py,
monai/visualize/, monai/data/wsi_reader.py)."""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp
from flax import nnx


# ---------------------------------------------------------------------------
# FL client
# ---------------------------------------------------------------------------

def _write_fl_bundle(root):
    os.makedirs(os.path.join(root, "configs"), exist_ok=True)
    train = {
        "imports": ["$import numpy as np"],
        "bundle_root": str(root),
        "net": {"_target_": "UNet", "spatial_dims": 2, "in_channels": 1,
                "out_channels": 2, "channels": [4, 8], "strides": [2], "num_res_units": 1},
        "network": "@net",
        "optimizer": {"_target_": "optax.adam", "learning_rate": 0.001},
        "loss": {"_target_": "DiceCELoss", "to_onehot_y": True, "softmax": True},
        "data": "$[{'image': np.random.RandomState(i).rand(1, 16, 16).astype('float32'), 'label': (np.random.RandomState(i).rand(1, 16, 16) > 0.5).astype('float32')} for i in range(4)]",
        "dataset": {"_target_": "Dataset", "data": "@data"},
        "loader": {"_target_": "DataLoader", "dataset": "@dataset", "batch_size": 2},
        "trainer": {"_target_": "SupervisedTrainer", "max_epochs": 1,
                    "train_data_loader": "@loader", "network": "@network",
                    "optimizer": "@optimizer", "loss_function": "@loss"},
        "run": ["$@trainer.run()"],
    }
    ev = dict(train)
    ev.pop("trainer"), ev.pop("optimizer"), ev.pop("loss")
    ev["postprocessing"] = {
        "_target_": "Compose",
        "transforms": [
            {"_target_": "Activationsd", "keys": "pred", "softmax": True},
            {"_target_": "AsDiscreted", "keys": "pred", "argmax": True, "to_onehot": 2},
            {"_target_": "AsDiscreted", "keys": "label", "to_onehot": 2},
        ],
    }
    ev["evaluator"] = {"_target_": "SupervisedEvaluator", "val_data_loader": "@loader",
                       "network": "@network", "postprocessing": "@postprocessing",
                       "key_val_metric": {
                           "dice": {"_target_": "MeanDice",
                                    "output_transform": "$monai_tpu.handlers.from_engine(['pred', 'label'])"}},
                       "decollate": True}
    ev["imports"] = ["$import numpy as np", "$import monai_tpu"]
    ev["run"] = ["$@evaluator.run()"]
    with open(os.path.join(root, "configs", "train.json"), "w") as f:
        json.dump(train, f)
    with open(os.path.join(root, "configs", "evaluate.json"), "w") as f:
        json.dump(ev, f)


def test_monai_algo_fl_round(tmp_path):
    from monai_tpu.fl.client import MonaiAlgo
    from monai_tpu.fl.utils.constants import WeightType
    from monai_tpu.fl.utils.exchange_object import ExchangeObject

    _write_fl_bundle(tmp_path)
    algo = MonaiAlgo(bundle_root=str(tmp_path), send_weight_diff=True)
    algo.initialize(extra={"client_name": "site-1"})
    assert algo.train_workflow is not None and algo.eval_workflow is not None

    # round 1: server sends no weights -> client trains from init, returns full weights
    algo.train(ExchangeObject(), extra={})
    w = algo.get_weights()
    assert w.weights is not None and w.weight_type == WeightType.WEIGHTS
    leaves = [v for v in _flatten(w.weights)]
    assert all(isinstance(v, np.ndarray) for v in leaves)

    # round 2: server sends the weights back -> client returns a weight DIFF
    algo.train(ExchangeObject(weights=w.weights), extra={})
    diff = algo.get_weights()
    assert diff.weight_type == WeightType.WEIGHT_DIFF

    metrics = algo.evaluate(ExchangeObject(weights=w.weights))
    assert "dice" in metrics.metrics
    algo.finalize()


def _flatten(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _flatten(v)
    else:
        yield tree


# ---------------------------------------------------------------------------
# visualize
# ---------------------------------------------------------------------------

class _TinyCls(nnx.Module):
    def __init__(self):
        rngs = nnx.Rngs(0)
        self.conv = nnx.Conv(1, 8, (3, 3), padding="SAME", rngs=rngs)
        self.fc = nnx.Linear(8, 3, rngs=rngs)

    def features(self, x):  # (B, 1, H, W) -> (B, 8, H/2, W/2)
        h = jnp.moveaxis(x, 1, -1)
        h = nnx.relu(self.conv(h))
        h = nnx.max_pool(h, (2, 2), strides=(2, 2))
        return jnp.moveaxis(h, -1, 1)

    def head(self, f):  # (8,) -> (3,)
        return self.fc(f)

    def __call__(self, x):
        f = self.features(x)
        return self.head(f.mean(axis=(2, 3)))


@pytest.fixture(scope="module")
def tiny_cls():
    return _TinyCls()


def test_cam_gradcam_gradcampp(tiny_cls):
    from monai_tpu.visualize import CAM, GradCAM, GradCAMpp

    x = jnp.asarray(np.random.RandomState(0).rand(2, 1, 16, 16), jnp.float32)
    cam = CAM(feature_fn=tiny_cls.features, head_fn=tiny_cls.head)
    m = cam(x, class_idx=1)
    assert m.shape == (2, 1, 16, 16)
    assert float(np.nanmax(m)) <= 1.0 + 1e-5

    for cls in (GradCAM, GradCAMpp):
        g = cls(feature_fn=tiny_cls.features, head_fn=lambda f: tiny_cls.head(f.mean(axis=(2, 3))) if f.ndim > 2 else tiny_cls.head(f))
        m = g(x, class_idx=1)
        assert m.shape[0] == 2 and m.shape[1] == 1


def test_occlusion_sensitivity(tiny_cls):
    from monai_tpu.visualize import OcclusionSensitivity

    x = jnp.asarray(np.random.RandomState(0).rand(1, 1, 16, 16), jnp.float32)
    occ = OcclusionSensitivity(nn_module=tiny_cls, mask_size=8, n_batch=8, verbose=False)
    out_map, most = occ(x)
    assert out_map.shape[0] == 1
    assert np.all(np.isfinite(np.asarray(out_map)))


def test_blend_and_matshow3d():
    import matplotlib

    matplotlib.use("Agg")
    from monai_tpu.visualize import blend_images, matshow3d

    img = np.random.RandomState(0).rand(1, 12, 12, 6).astype(np.float32)
    lab = (np.random.RandomState(1).rand(1, 12, 12, 6) > 0.7).astype(np.float32)
    blended = blend_images(img, lab, alpha=0.5)
    assert blended.shape[0] == 3  # RGB
    fig, _ = matshow3d(img, every_n=2, show=False)
    assert fig is not None


def test_img2tensorboard_gif(tmp_path):
    from tensorboardX import SummaryWriter

    from monai_tpu.visualize import plot_2d_or_3d_image

    w = SummaryWriter(str(tmp_path))
    vol = np.random.RandomState(0).rand(1, 2, 12, 12, 8).astype(np.float32)
    plot_2d_or_3d_image(vol, 0, w, max_channels=2, tag="vol")
    plot_2d_or_3d_image(np.random.RandomState(0).rand(1, 1, 12, 12), 0, w, tag="img2d")
    w.close()
    assert any(f.startswith("events") for f in os.listdir(tmp_path))


# ---------------------------------------------------------------------------
# WSI (PIL backend)
# ---------------------------------------------------------------------------

def _write_wsi(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    arr = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "slide.png")
    Image.fromarray(arr).save(p)
    return p, arr


def test_wsi_reader_pil(tmp_path):
    from monai_tpu.data.wsi_reader import WSIReader

    path, arr = _write_wsi(tmp_path)
    reader = WSIReader(backend="pil")
    wsi = reader.read(path)
    assert reader.get_size(wsi, 0) == (64, 96)
    img, meta = reader.get_data(wsi, location=(8, 16), size=(32, 32), level=0)
    assert img.shape == (3, 32, 32)  # CHW RGB
    np.testing.assert_array_equal(img[:, 0, 0], arr[8, 16, :])


def test_patch_wsi_dataset_pil(tmp_path):
    from monai_tpu.data.wsi_datasets import PatchWSIDataset

    path, arr = _write_wsi(tmp_path)
    data = [{"image": path, "location": [16, 32], "label": 1},
            {"image": path, "location": [20, 40], "label": 0}]
    ds = PatchWSIDataset(data=data, patch_size=16, patch_level=0, reader="pil")
    item = ds[0]
    img = item["image"]
    assert np.asarray(img).shape == (3, 16, 16)
    assert int(np.asarray(item["label"])) == 1


# ---------------------------------------------------------------------------
# profiling / jupyter utilities
# ---------------------------------------------------------------------------

def test_workflow_profiler_collects_transform_times():
    from monai_tpu.transforms import Compose, ScaleIntensity, EnsureChannelFirst
    from monai_tpu.utils.profiling import WorkflowProfiler

    img = np.random.RandomState(0).rand(8, 8).astype(np.float32)
    xform = Compose([EnsureChannelFirst(channel_dim="no_channel"), ScaleIntensity()])
    with WorkflowProfiler() as wp:
        with wp.profile_ctx("pipeline"):
            xform(img)
    summary = wp.get_times_summary()
    assert "pipeline" in summary
    assert summary["pipeline"][0] >= 1  # count


def test_perf_context_and_range():
    import time

    from monai_tpu.utils import PerfContext
    from monai_tpu.utils.profiling import Range

    pc = PerfContext()
    with pc:
        time.sleep(0.01)
    with pc:
        time.sleep(0.01)
    assert pc.total_time >= 0.02

    with Range("named-block"):
        x = jnp.ones((4,)) * 2
    assert float(x.sum()) == 8.0


def test_thread_container_runs_engine():
    import optax
    from flax import nnx

    from monai_tpu.engines import SupervisedTrainer
    from monai_tpu.losses import DiceCELoss
    from monai_tpu.networks.nets import UNet
    from monai_tpu.utils.jupyter_utils import ThreadContainer

    net = UNet(spatial_dims=2, in_channels=1, out_channels=2, channels=(4, 8),
               strides=(2,), num_res_units=1, rngs=nnx.Rngs(0))
    rng = np.random.RandomState(0)
    data = [(rng.rand(2, 1, 16, 16).astype(np.float32),
             (rng.rand(2, 1, 16, 16) > 0.5).astype(np.float32)) for _ in range(3)]
    trainer = SupervisedTrainer(max_epochs=1, train_data_loader=data, network=net,
                                optimizer=optax.adam(1e-3),
                                loss_function=DiceCELoss(to_onehot_y=True, softmax=True),
                                decollate=False)
    tc = ThreadContainer(trainer)
    tc.start()
    tc.join(timeout=120)
    assert not tc.is_alive()
    status = tc.status()
    assert "Stopped" in status and "loss" in status
