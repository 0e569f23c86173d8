"""ckpt_export AOT artifact: jax.export/StableHLO serialization + replay
(replaces the reference's TorchScript bundle, monai/bundle/scripts.py:1439)."""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from monai_tpu.bundle import ConfigParser
from monai_tpu.bundle.scripts import ckpt_export, load_exported_network, verify_net_in_out


@pytest.fixture()
def bundle_cfg(tmp_path):
    cfg = {"network_def": {"_target_": "UNet", "spatial_dims": 2, "in_channels": 1,
                           "out_channels": 2, "channels": [4, 8], "strides": [2],
                           "num_res_units": 1}}
    p = str(tmp_path / "cfg.json")
    with open(p, "w") as f:
        json.dump(cfg, f)
    return p


class TestCkptExport:
    def test_export_writes_all_artifacts(self, bundle_cfg, tmp_path):
        out = ckpt_export(filepath=str(tmp_path / "bundle"), config_file=bundle_cfg,
                          input_shape=(1, 1, 32, 32))
        assert os.path.isdir(os.path.join(out, "model"))  # orbax params
        assert os.path.exists(os.path.join(out, "config.json"))
        assert os.path.exists(os.path.join(out, "model.stablehlo"))
        assert os.path.exists(os.path.join(out, "export_meta.json"))

    def test_exported_program_matches_live_network(self, bundle_cfg, tmp_path):
        out = ckpt_export(filepath=str(tmp_path / "bundle"), config_file=bundle_cfg,
                          input_shape=(1, 1, 32, 32))
        fn = load_exported_network(os.path.join(out, "model.stablehlo"))
        parser = ConfigParser()
        parser.read_config(bundle_cfg)
        net = parser.get_parsed_content("network_def")  # same seed -> same init
        x = jnp.asarray(np.random.RandomState(0).rand(1, 1, 32, 32), jnp.float32)
        np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(net(x)), atol=1e-5)

    def test_exported_shape_is_fixed(self, bundle_cfg, tmp_path):
        out = ckpt_export(filepath=str(tmp_path / "bundle"), config_file=bundle_cfg,
                          input_shape=(1, 1, 32, 32))
        fn = load_exported_network(os.path.join(out, "model.stablehlo"))
        with pytest.raises(Exception):
            fn(jnp.zeros((1, 1, 64, 64), jnp.float32))  # mismatched signature

    def test_verify_net_in_out(self, bundle_cfg):
        verify_net_in_out(config_file=bundle_cfg, net_id="network_def",
                          _meta_={"network_data_format": {
                              "inputs": {"image": {"spatial_shape": [32, 32],
                                                   "channel_def": {"0": "image"}}},
                              "outputs": {"pred": {"channel_def": {"0": "bg", "1": "fg"}}}}})
