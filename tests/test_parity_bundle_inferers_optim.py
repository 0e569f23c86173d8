"""Live parity vs the PyTorch reference: bundle ConfigParser DSL semantics,
sliding-window / patch inferers (framework-agnostic predictors), LR schedules,
Novograd optimizer math (reference: monai/bundle, monai/inferers, monai/optimizers)."""
import numpy as np
import pytest

import jax.numpy as jnp

from _ref import REF, to_np

pytestmark = pytest.mark.skipif(REF is None, reason="reference MONAI not importable")


# ---------------------------------------------------------------------------
# bundle ConfigParser DSL
# ---------------------------------------------------------------------------

def _both_parsers(config):
    from monai_tpu.bundle import ConfigParser as OursParser
    import copy
    ours = OursParser(copy.deepcopy(config))
    ref = REF.bundle.ConfigParser(copy.deepcopy(config))
    return ours, ref


def test_config_refs_and_exprs():
    cfg = {
        "a": 5,
        "b": "@a",
        "c": "$@a * 2 + 1",
        "nested": {"x": "@c", "y": "$len([1, 2, 3])"},
        "lst": ["@a", "$@a + @c"],
    }
    ours, ref = _both_parsers(cfg)
    for key in ("b", "c", "nested::x", "nested::y", "lst"):
        o = ours.get_parsed_content(key)
        r = ref.get_parsed_content(key)
        assert o == r, f"{key}: {o} vs {r}"


def test_config_macro_and_relative_ids():
    cfg = {
        "train": {"lr": 0.1, "epochs": 10},
        "copy": "%train::lr",
        "rel": {"v": 3, "w": "@::v"},
    }
    ours, ref = _both_parsers(cfg)
    assert ours.get_parsed_content("copy") == ref.get_parsed_content("copy") == 0.1
    assert ours.get_parsed_content("rel::w") == ref.get_parsed_content("rel::w") == 3


def test_config_target_instantiation():
    cfg = {
        "obj": {"_target_": "collections.OrderedDict"},
        "part": {"_target_": "operator.add", "_mode_": "callable"},
        "dis": {"_target_": "operator.add", "_disabled_": True},
    }
    ours, ref = _both_parsers(cfg)
    import collections
    assert isinstance(ours.get_parsed_content("obj"), collections.OrderedDict)
    assert isinstance(ref.get_parsed_content("obj"), collections.OrderedDict)
    assert ours.get_parsed_content("part")(2, 3) == ref.get_parsed_content("part")(2, 3) == 5
    assert ours.get_parsed_content("dis") is None and ref.get_parsed_content("dis") is None


def test_config_set_and_update():
    cfg = {"k": {"sub": 1}}
    ours, ref = _both_parsers(cfg)
    ours["k::sub"] = 7
    ref["k::sub"] = 7
    assert ours.get_parsed_content("k::sub") == ref.get_parsed_content("k::sub") == 7


def test_config_resolve_order_independent():
    cfg = {"z": "$@y + 1", "y": "$@x * 2", "x": 3}
    ours, ref = _both_parsers(cfg)
    assert ours.get_parsed_content("z") == ref.get_parsed_content("z") == 7


# ---------------------------------------------------------------------------
# inferers — same pure function run through both frameworks' sliding windows
# ---------------------------------------------------------------------------

def test_sliding_window_inference_parity():
    import torch
    from monai_tpu.inferers import sliding_window_inference as ours_swi

    rng = np.random.RandomState(0)
    vol = rng.rand(1, 1, 37, 41).astype(np.float32)
    k = rng.rand(1, 1, 1, 1).astype(np.float32)

    def pred_jnp(x):
        return x * jnp.asarray(k) + 0.5

    def pred_t(x):
        return x * torch.from_numpy(k) + 0.5

    for overlap, mode in [(0.25, "constant"), (0.5, "gaussian"), (0.25, "gaussian")]:
        ours = ours_swi(jnp.asarray(vol), roi_size=(16, 16), sw_batch_size=3,
                        predictor=pred_jnp, overlap=overlap, mode=mode)
        ref = REF.inferers.sliding_window_inference(
            torch.from_numpy(vol), roi_size=(16, 16), sw_batch_size=3, predictor=pred_t,
            overlap=overlap, mode=mode)
        np.testing.assert_allclose(to_np(ours), to_np(ref), atol=1e-3,
                                   err_msg=f"{overlap}-{mode}")


def test_sliding_window_roi_larger_than_image():
    import torch
    from monai_tpu.inferers import sliding_window_inference as ours_swi

    rng = np.random.RandomState(1)
    vol = rng.rand(1, 1, 12, 12).astype(np.float32)

    def pred_jnp(x):
        return x * 2.0

    def pred_t(x):
        return x * 2.0

    ours = ours_swi(jnp.asarray(vol), roi_size=(16, 16), sw_batch_size=1,
                    predictor=pred_jnp, overlap=0.25)
    ref = REF.inferers.sliding_window_inference(
        torch.from_numpy(vol), roi_size=(16, 16), sw_batch_size=1, predictor=pred_t,
        overlap=0.25)
    np.testing.assert_allclose(to_np(ours), to_np(ref), atol=1e-4)


def test_patch_inferer_parity():
    import torch
    from monai_tpu.inferers import PatchInferer, SlidingWindowSplitter

    rng = np.random.RandomState(0)
    vol = rng.rand(1, 1, 16, 16).astype(np.float32)

    ours_inf = PatchInferer(splitter=SlidingWindowSplitter(patch_size=(8, 8)))
    ref_inf = REF.inferers.PatchInferer(
        splitter=REF.inferers.SlidingWindowSplitter(patch_size=(8, 8)))
    ours = ours_inf(jnp.asarray(vol), lambda x: x + 1.0)
    ref = ref_inf(torch.from_numpy(vol), lambda x: x + 1.0)
    np.testing.assert_allclose(to_np(ours), to_np(ref), atol=1e-5)


def test_slice_inferer_parity():
    import torch
    from monai_tpu.inferers import SliceInferer

    rng = np.random.RandomState(0)
    vol = rng.rand(1, 1, 6, 12, 12).astype(np.float32)

    ours_inf = SliceInferer(roi_size=(12, 12), spatial_dim=0)
    ref_inf = REF.inferers.SliceInferer(roi_size=(12, 12), spatial_dim=0)
    ours = ours_inf(jnp.asarray(vol), lambda x: x * 3.0)
    ref = ref_inf(torch.from_numpy(vol), lambda x: x * 3.0)
    np.testing.assert_allclose(to_np(ours), to_np(ref), atol=1e-4)


def test_simple_inferer_parity():
    from monai_tpu.inferers import SimpleInferer

    x = np.ones((1, 1, 4, 4), np.float32)
    out = SimpleInferer()(jnp.asarray(x), lambda v: v * 2)
    np.testing.assert_allclose(to_np(out), x * 2)


# ---------------------------------------------------------------------------
# optimizers / LR schedules
# ---------------------------------------------------------------------------

def test_warmup_cosine_schedule_parity():
    import torch
    from monai_tpu.optimizers import WarmupCosineSchedule as OursSched

    net = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(net.parameters(), lr=1.0)
    ref_sched = REF.optimizers.WarmupCosineSchedule(opt, warmup_steps=5, t_total=20)
    ours_sched = OursSched(1.0, warmup_steps=5, t_total=20)
    for step in range(20):
        ref_lr = opt.param_groups[0]["lr"]
        ours_lr = float(ours_sched(step))
        assert abs(ours_lr - ref_lr) < 1e-6, f"step {step}: {ours_lr} vs {ref_lr}"
        opt.step()
        ref_sched.step()


def test_linear_exponential_lr_parity():
    import torch
    from monai_tpu.optimizers import ExponentialLRSchedule as OursExp, LinearLRSchedule as OursLin

    for OursCls, RefCls in [(OursLin, REF.optimizers.LinearLR),
                            (OursExp, REF.optimizers.ExponentialLR)]:
        net = torch.nn.Linear(2, 2)
        opt = torch.optim.SGD(net.parameters(), lr=0.1)
        ref = RefCls(opt, end_lr=1.0, num_iter=10)
        ours = OursCls(0.1, end_lr=1.0, num_iter=10)
        for step in range(10):
            ref_lr = opt.param_groups[0]["lr"]
            ours_lr = float(ours(step))
            assert abs(ours_lr - ref_lr) < 1e-6, f"{OursCls.__name__} step {step}"
            opt.step()
            ref.step()


def test_novograd_step_parity():
    import torch
    from monai_tpu.optimizers import novograd as ours_novograd
    import optax

    rng = np.random.RandomState(0)
    w = rng.randn(4, 3).astype(np.float32)
    g = rng.randn(4, 3).astype(np.float32)

    # reference Novograd: two steps with constant gradient
    wt = torch.nn.Parameter(torch.from_numpy(w.copy()))
    opt = REF.optimizers.Novograd([wt], lr=0.01, betas=(0.9, 0.98), weight_decay=0.0)
    for _ in range(2):
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = ours_novograd(learning_rate=0.01, betas=(0.9, 0.98), weight_decay=0.0)
    params = {"w": jnp.asarray(w)}
    state = tx.init(params)
    for _ in range(2):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), wt.detach().numpy(), atol=1e-5)


def test_generate_param_groups_equivalent():
    from monai_tpu.optimizers import generate_param_groups

    import optax

    # label-based selection over a pytree of params: matched leaves get their own lr
    params = {"encoder": {"w": jnp.zeros((2, 2))}, "head": {"w": jnp.zeros((2,))}}
    labels, tx = generate_param_groups(params, layer_matches=[lambda name: "encoder" in name],
                                       match_types=["select"], lr_values=[0.1], base_lr=0.01,
                                       base_tx_factory=optax.sgd)
    state = tx.init(params)
    grads = {"encoder": {"w": jnp.ones((2, 2))}, "head": {"w": jnp.ones((2,))}}
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(new["encoder"]["w"]), -0.1 * np.ones((2, 2)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new["head"]["w"]), -0.01 * np.ones((2,)), atol=1e-6)
