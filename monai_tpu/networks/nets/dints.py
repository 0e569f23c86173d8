"""DiNTS: differentiable neural network topology search for 3D segmentation
(reference: monai/networks/nets/dints.py:317 DiNTS, :518 TopologyConstruction,
:635 TopologyInstance, :691 TopologySearch; arXiv:2103.15954).

TPU design notes: the searched instance prunes inactive paths at CONSTRUCTION time
(static python loop over binary arch codes), so the compiled XLA graph contains only
the selected cells — no data-dependent control flow. The search space weights paths
with sigmoid(log_alpha_a) and cell ops with softmax(log_alpha_c), all fused matmul-side.
"""
from __future__ import annotations

import warnings
from collections.abc import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from ..blocks.dints_block import (
    ActiConvNormBlock,
    FactorizedIncreaseBlock,
    FactorizedReduceBlock,
    P3DActiConvNormBlock,
)
from ..layers.factories import get_act_layer, get_norm_layer

__all__ = ["DiNTS", "TopologyConstruction", "TopologyInstance", "TopologySearch", "Cell"]

_INSTANCE = ("INSTANCE", {"affine": True})


class _Identity(nnx.Module):
    def __call__(self, x):
        return x


class MixedOp(nnx.Module):
    """Weighted sum of candidate cell operations (reference: dints.py:160)."""

    def __init__(self, c: int, ops: dict, arch_code_c=None, *, rngs: nnx.Rngs):
        if arch_code_c is None:
            arch_code_c = np.ones(len(ops))
        self.ops = nnx.List([ops[name](c) for code, name in zip(arch_code_c, ops) if code > 0])

    def __call__(self, x, weight=None):
        out = 0.0
        for idx, op in enumerate(self.ops):
            out = out + (op(x) if weight is None else op(x) * weight[idx])
        return out


class Cell(nnx.Module):
    """Preprocess (resolution change) + mixed op (reference: dints.py:194)."""

    DIRECTIONS = 3
    OPS2D_NAMES = ["skip_connect", "conv_3x3"]
    OPS3D_NAMES = ["skip_connect", "conv_3x3x3", "conv_3x3x1", "conv_3x1x3", "conv_1x3x3"]

    def __init__(self, c_prev: int, c: int, rate: int, arch_code_c=None,
                 spatial_dims: int = 3, act_name="RELU", norm_name=_INSTANCE,
                 *, rngs: nnx.Rngs):
        # activation-memory cost per output voxel, relative to the op's own output
        # (reference: dints.py:75-157 _*WithRAMCost constants)
        if rate == -1:
            self.preprocess = FactorizedReduceBlock(c_prev, c, spatial_dims, act_name,
                                                    norm_name, rngs=rngs)
            self.preprocess_ram_cost = c_prev / c * 2 ** spatial_dims + 3
        elif rate == 1:
            self.preprocess = FactorizedIncreaseBlock(c_prev, c, spatial_dims, act_name,
                                                      norm_name, rngs=rngs)
            self.preprocess_ram_cost = 2 * c_prev / c + 2
        elif c_prev == c:
            self.preprocess = _Identity()
            self.preprocess_ram_cost = 0.0
        else:
            self.preprocess = ActiConvNormBlock(c_prev, c, 1, 0, spatial_dims, act_name,
                                                norm_name, rngs=rngs)
            self.preprocess_ram_cost = 1 + 2 * c_prev / c
        if spatial_dims == 2:
            ops = {
                "skip_connect": lambda _c: _Identity(),
                "conv_3x3": lambda cc: ActiConvNormBlock(cc, cc, 3, 1, 2, act_name,
                                                         norm_name, rngs=rngs),
            }
        elif spatial_dims == 3:
            ops = {
                "skip_connect": lambda _c: _Identity(),
                "conv_3x3x3": lambda cc: ActiConvNormBlock(cc, cc, 3, 1, 3, act_name,
                                                           norm_name, rngs=rngs),
                "conv_3x3x1": lambda cc: P3DActiConvNormBlock(cc, cc, 3, 1, 0, act_name,
                                                              norm_name, rngs=rngs),
                "conv_3x1x3": lambda cc: P3DActiConvNormBlock(cc, cc, 3, 1, 1, act_name,
                                                              norm_name, rngs=rngs),
                "conv_1x3x3": lambda cc: P3DActiConvNormBlock(cc, cc, 3, 1, 2, act_name,
                                                              norm_name, rngs=rngs),
            }
        else:
            raise NotImplementedError(f"Spatial dimensions {spatial_dims} is not supported.")
        self.op = MixedOp(c, ops, arch_code_c, rngs=rngs)
        # per-op ram cost (in==out==c): skip 0, full conv 3 (=1+2), P3D 4 (=2+2)
        names = self.OPS2D_NAMES if spatial_dims == 2 else self.OPS3D_NAMES
        op_ram = {"skip_connect": 0.0, "conv_3x3": 3.0, "conv_3x3x3": 3.0,
                  "conv_3x3x1": 4.0, "conv_3x1x3": 4.0, "conv_1x3x3": 4.0}
        self.op_ram_cost = [op_ram[n] for n in names]

    def __call__(self, x, weight=None):
        return self.op(self.preprocess(x), weight)


class TopologyConstruction(nnx.Module):
    """Base topology (reference: dints.py:518)."""

    def __init__(self, arch_code=None, channel_mul: float = 1.0, cell=Cell,
                 num_blocks: int = 6, num_depths: int = 3, spatial_dims: int = 3,
                 act_name="RELU", norm_name=_INSTANCE, use_downsample: bool = True,
                 device: str = "cpu", *, rngs: nnx.Rngs):
        self.filter_nums = [int(32 * (2 ** i) * channel_mul) for i in range(num_depths + 1)]
        self.num_blocks = num_blocks
        self.num_depths = num_depths
        self._spatial_dims = spatial_dims
        self.use_downsample = use_downsample
        self.num_cell_ops = len(cell.OPS2D_NAMES if spatial_dims == 2 else cell.OPS3D_NAMES)

        # path-topology lookup tables (see reference docstring, dints.py:518)
        arch_code2in, arch_code2out = [], []
        for i in range(cell.DIRECTIONS * num_depths - 2):
            arch_code2in.append((i + 1) // cell.DIRECTIONS - 1 + (i + 1) % cell.DIRECTIONS)
        arch_code2ops = ([-1, 0, 1] * num_depths)[1:-1]
        for m in range(num_depths):
            arch_code2out.extend([m, m, m])
        arch_code2out = arch_code2out[1:-1]
        self.arch_code2in = arch_code2in
        self.arch_code2ops = arch_code2ops
        self.arch_code2out = arch_code2out

        if arch_code is None:
            arch_code_a = np.ones((num_blocks, len(arch_code2out)))
            arch_code_c = np.ones((num_blocks, len(arch_code2out), self.num_cell_ops))
        else:
            arch_code_a = np.asarray(arch_code[0])
            arch_code_c = np.eye(self.num_cell_ops)[np.asarray(arch_code[1], dtype=np.int64)]
        self.arch_code_a = arch_code_a
        self.arch_code_c = arch_code_c

        cells = {}
        for blk_idx in range(num_blocks):
            for res_idx in range(len(self.arch_code2out)):
                if arch_code_a[blk_idx, res_idx] == 1:
                    cells[str((blk_idx, res_idx))] = cell(
                        self.filter_nums[self.arch_code2in[res_idx] + int(use_downsample)],
                        self.filter_nums[self.arch_code2out[res_idx] + int(use_downsample)],
                        self.arch_code2ops[res_idx], arch_code_c[blk_idx, res_idx],
                        spatial_dims, act_name, norm_name, rngs=rngs)
        self.cell_tree = nnx.Dict(cells)

    def __call__(self, x):
        raise NotImplementedError


class TopologyInstance(TopologyConstruction):
    """Final searched architecture (reference: dints.py:635)."""

    def __init__(self, arch_code=None, **kwargs):
        if arch_code is None:
            warnings.warn("arch_code not provided when not searching.")
        super().__init__(arch_code=arch_code, **kwargs)

    def __call__(self, x: list) -> list:
        inputs = x
        for blk_idx in range(self.num_blocks):
            outputs = [0.0] * self.num_depths
            for res_idx, act in enumerate(self.arch_code_a[blk_idx]):
                if act:
                    out = self.cell_tree[str((blk_idx, res_idx))](
                        inputs[self.arch_code2in[res_idx]], weight=None)
                    outputs[self.arch_code2out[res_idx]] = outputs[self.arch_code2out[res_idx]] + out
            inputs = outputs
        return inputs


class TopologySearch(TopologyConstruction):
    """Differentiable search space (reference: dints.py:691).

    Learnable ``log_alpha_a`` (path) and ``log_alpha_c`` (op) weights; forward computes
    sigmoid/softmax-weighted sums. ``decode()`` here uses greedy thresholding of the
    learned probabilities (the reference's RAM-budgeted Dijkstra decode is a search-time
    host-side utility, not part of the compute graph)."""

    def __init__(self, channel_mul: float = 1.0, cell=Cell, arch_code=None,
                 num_blocks: int = 6, num_depths: int = 3, spatial_dims: int = 3,
                 act_name="RELU", norm_name=_INSTANCE, use_downsample: bool = True,
                 device: str = "cpu", *, rngs: nnx.Rngs):
        super().__init__(arch_code=arch_code, channel_mul=channel_mul, cell=cell,
                         num_blocks=num_blocks, num_depths=num_depths,
                         spatial_dims=spatial_dims, act_name=act_name, norm_name=norm_name,
                         use_downsample=use_downsample, device=device, rngs=rngs)
        n_paths = len(self.arch_code2out)
        key = rngs.params()
        k1, k2 = jax.random.split(key)
        self.log_alpha_a = nnx.Param(1e-3 * jax.random.normal(k1, (num_blocks, n_paths)))
        self.log_alpha_c = nnx.Param(
            1e-3 * jax.random.normal(k2, (num_blocks, n_paths, self.num_cell_ops)))
        # search-time host-side machinery (reference: dints.py:804 gen_mtx).
        # Host constants are kept as plain Python lists: nnx treats ndarray
        # attributes as pytree data, which these are not.
        transfer_mtx, node_act_list, child_list = self.gen_mtx(num_depths)
        self.transfer_mtx = {k: [m.tolist() for m in v] for k, v in transfer_mtx.items()}
        self.node_act_list = node_act_list
        self.child_list = child_list.tolist()
        self.node_act_dict = {str(np.asarray(k)): i for i, k in enumerate(node_act_list)}
        # per-(block, path, op) activation-memory weights (reference: dints.py:781)
        ram = np.zeros((num_blocks, n_paths, self.num_cell_ops), np.float32)
        for blk_idx in range(num_blocks):
            for res_idx in range(n_paths):
                key_ = str((blk_idx, res_idx))
                if key_ in self.cell_tree:
                    cell_obj = self.cell_tree[key_]
                    ram[blk_idx, res_idx] = np.asarray(cell_obj.op_ram_cost) + float(
                        cell_obj.preprocess_ram_cost)
        self.ram_cost = ram.tolist()

    def gen_mtx(self, depth: int):
        """Feasible-topology tables (reference: dints.py:804): transfer_mtx maps a
        node-activation pattern to the path-activation matrices consistent with it;
        node_act_list/child_list enumerate all non-zero node/path activations."""
        paths = Cell.DIRECTIONS * depth - 2

        def all_binary(n):
            return [[(i >> (n - 1 - b)) & 1 for b in range(n)] for i in range(2 ** n)]

        all_connect = all_binary(paths)
        mtx = []
        for m in all_connect:
            ma = np.zeros((depth, depth))
            for i in range(paths):
                ma[(i + 1) // Cell.DIRECTIONS,
                   (i + 1) // Cell.DIRECTIONS - 1 + (i + 1) % Cell.DIRECTIONS] = m[i]
            mtx.append(ma)
        node_act_list = all_binary(depth)[1:]
        transfer_mtx = {}
        for arch_code in node_act_list:
            transfer_mtx[str(np.array(arch_code))] = [
                m for m in mtx
                if ((np.sum(m, 0) > 0).astype(int) == np.array(arch_code)).all()]
        # indices of path entries in the flattened (depth, depth) matrix
        self.tidx = []
        for i in range(paths):
            r = (i + 1) // Cell.DIRECTIONS
            c = (i + 1) // Cell.DIRECTIONS - 1 + (i + 1) % Cell.DIRECTIONS
            self.tidx.append(r * depth + c)
        return transfer_mtx, node_act_list, np.asarray(all_connect[1:])

    def get_prob_a(self, child: bool = False):
        """Path-activation probabilities, renormalized to exclude the all-zero
        pattern; with ``child`` also the probability of every child topology
        (reference: dints.py:846)."""
        _p = jax.nn.sigmoid(self.log_alpha_a.value)
        norm = 1 - jnp.prod(1 - _p, axis=-1)
        arch_code_prob_a = _p / norm[:, None]
        if child:
            pa = jnp.asarray(np.asarray(self.child_list), _p.dtype)  # (n_child, n_paths)
            probs = jnp.stack([
                jnp.prod(pa * _p[b] + (1 - pa) * (1 - _p[b]), axis=-1) / norm[b]
                for b in range(self.num_blocks)])
            return probs, arch_code_prob_a
        return None, arch_code_prob_a

    def get_ram_cost_usage(self, in_size, full: bool = False):
        """Estimated activation memory (MB) of the weighted supernet
        (reference: dints.py:878)."""
        batch_size = int(in_size[0])
        image_size = np.array(in_size[-self._spatial_dims:])
        sizes = np.array([
            batch_size * self.filter_nums[res_idx] * (image_size // (2 ** res_idx)).prod()
            for res_idx in range(self.num_depths)], np.float32)
        sizes = sizes / (2 ** int(self.use_downsample))
        _, arch_code_prob_a = self.get_prob_a(child=False)
        cell_prob = jax.nn.softmax(self.log_alpha_c.value, axis=-1)
        if full:
            arch_code_prob_a = jnp.ones_like(arch_code_prob_a)
        ram_cost = jnp.asarray(self.ram_cost)
        usage = 0.0
        for blk_idx in range(self.num_blocks):
            for path_idx in range(len(self.arch_code2out)):
                usage = usage + (
                    arch_code_prob_a[blk_idx, path_idx]
                    * (1 + (ram_cost[blk_idx, path_idx] * cell_prob[blk_idx, path_idx]).sum())
                    * sizes[self.arch_code2out[path_idx]])
        return usage * 32 / 8 / 1024 ** 2

    def get_topology_entropy(self, probs):
        """Topology continuity entropy between adjacent blocks
        (reference: dints.py:911)."""
        if not hasattr(self, "_node2in"):
            node2in = [[] for _ in range(len(self.node_act_list))]
            node2out = [[] for _ in range(len(self.node_act_list))]
            child_arr = np.asarray(self.child_list)
            for child_idx in range(len(child_arr)):
                _node_in = np.zeros(self.num_depths)
                _node_out = np.zeros(self.num_depths)
                for res_idx in range(len(self.arch_code2out)):
                    _node_out[self.arch_code2out[res_idx]] += child_arr[child_idx][res_idx]
                    _node_in[self.arch_code2in[res_idx]] += child_arr[child_idx][res_idx]
                _node_in = (_node_in >= 1).astype(int)
                _node_out = (_node_out >= 1).astype(int)
                node2in[self.node_act_dict[str(_node_out)]].append(child_idx)
                node2out[self.node_act_dict[str(_node_in)]].append(child_idx)
            self._node2in, self._node2out = node2in, node2out
        ent = 0.0
        for blk_idx in range(self.num_blocks - 1):
            for node_idx in range(len(self.node_act_list)):
                _node_p = probs[blk_idx, self._node2in[node_idx]].sum()
                _out_probs = probs[blk_idx + 1, self._node2out[node_idx]].sum()
                ent = ent + -(_node_p * jnp.log(_out_probs + 1e-5)
                              + (1 - _node_p) * jnp.log(1 - _out_probs + 1e-5))
        return ent

    def __call__(self, x: list) -> list:
        # renormalized path probabilities (all-zero pattern excluded), ref forward
        _, probs_a = self.get_prob_a(child=False)
        probs_c = jax.nn.softmax(self.log_alpha_c.value, axis=-1)
        inputs = x
        for blk_idx in range(self.num_blocks):
            outputs = [0.0] * self.num_depths
            for res_idx in range(len(self.arch_code2out)):
                if self.arch_code_a[blk_idx, res_idx] == 1:
                    out = self.cell_tree[str((blk_idx, res_idx))](
                        inputs[self.arch_code2in[res_idx]],
                        weight=probs_c[blk_idx, res_idx])
                    outputs[self.arch_code2out[res_idx]] = (
                        outputs[self.arch_code2out[res_idx]] + out * probs_a[blk_idx, res_idx])
            inputs = outputs
        return inputs

    def decode(self):
        """Dijkstra decode over the feasible-topology DAG (reference: dints.py:949):
        nodes are (block, child-topology) pairs, edges exist only between
        consecutive-block topologies consistent under ``transfer_mtx``, edge weight
        is -log(child probability). Returns
        ``(node_a, arch_code_a, arch_code_c, arch_code_a_max)``."""
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import dijkstra

        probs, _ = self.get_prob_a(child=True)
        probs = np.asarray(probs)
        child_arr = np.asarray(self.child_list)
        arch_code_a_max = child_arr[np.argmax(probs, -1)]
        arch_code_c = np.asarray(jnp.argmax(
            jax.nn.softmax(self.log_alpha_c.value, axis=-1), axis=-1))

        n_child = len(child_arr)
        amtx = np.zeros((1 + n_child * self.num_blocks + 1,
                         1 + n_child * self.num_blocks + 1))
        path2child = {str(child_arr[i]): i for i in range(n_child)}
        sub_amtx = np.zeros((n_child, n_child))
        for child_idx in range(n_child):
            _node_act = np.zeros(self.num_depths, int)
            for path_idx in range(child_arr.shape[1]):
                _node_act[self.arch_code2out[path_idx]] += child_arr[child_idx][path_idx]
            _node_act = (_node_act >= 1).astype(int)
            for mtx in self.transfer_mtx[str(_node_act)]:
                mtx = np.asarray(mtx)
                connect_idx = path2child[str(mtx.flatten()[self.tidx].astype(int))]
                sub_amtx[child_idx, connect_idx] = 1
        amtx[0, 1:1 + n_child] = -np.log(probs[0] + 1e-5) + 0.001
        for blk_idx in range(1, self.num_blocks):
            amtx[1 + (blk_idx - 1) * n_child:1 + blk_idx * n_child,
                 1 + blk_idx * n_child:1 + (blk_idx + 1) * n_child] = (
                sub_amtx * np.tile(-np.log(probs[blk_idx] + 1e-5) + 0.001, (n_child, 1)))
        amtx[1 + (self.num_blocks - 1) * n_child:1 + self.num_blocks * n_child, -1] = 0.001

        _, predecessors, _ = dijkstra(csgraph=csr_matrix(amtx), directed=True, indices=0,
                                      min_only=True, return_predecessors=True)
        index, a_idx = -1, -1
        arch_code_a = np.zeros((self.num_blocks, len(self.arch_code2out)))
        node_a = np.zeros((self.num_blocks + 1, self.num_depths))
        while True:
            index = predecessors[index]
            if index == 0:
                break
            child_idx = (index - 1) % n_child
            arch_code_a[a_idx, :] = child_arr[child_idx]
            for res_idx in range(len(self.arch_code2out)):
                node_a[a_idx, self.arch_code2out[res_idx]] += arch_code_a[a_idx, res_idx]
            a_idx -= 1
        for res_idx in range(len(self.arch_code2out)):
            node_a[a_idx, self.arch_code2in[res_idx]] += arch_code_a[0, res_idx]
        node_a = (node_a >= 1).astype(int)
        return node_a, arch_code_a, arch_code_c, arch_code_a_max


class _Act(nnx.Module):
    def __init__(self, act_name):
        self.fn = get_act_layer(act_name)

    def __call__(self, x):
        return self.fn(x)


class _Stem(nnx.Module):
    """Sequential stem wrapper (reference: dints.py:56 StemTS)."""

    def __init__(self, *mods):
        self.mods = nnx.List(list(mods))

    def __call__(self, x):
        for m in self.mods:
            x = m(x)
        return x


class _Resize(nnx.Module):
    def __init__(self, scale: float, spatial_dims: int):
        self.scale = scale
        self.spatial_dims = spatial_dims

    def __call__(self, x):
        new_shape = (x.shape[0],) + tuple(int(round(s * self.scale)) for s in x.shape[1:-1]) \
            + (x.shape[-1],)
        method = "trilinear" if self.spatial_dims == 3 else "bilinear"
        return jax.image.resize(x, new_shape, method=method)


class DiNTS(nnx.Module):
    """(reference: dints.py:317). Channel-first public API; input spatial dims must be
    divisible by ``2 ** (num_depths + use_downsample)``."""

    def __init__(self, dints_space, in_channels: int, num_classes: int, act_name="RELU",
                 norm_name=_INSTANCE, spatial_dims: int = 3, use_downsample: bool = True,
                 node_a=None, *, rngs: nnx.Rngs):
        self.dints_space = dints_space
        self.filter_nums = dints_space.filter_nums
        self.num_blocks = dints_space.num_blocks
        self.num_depths = dints_space.num_depths
        if spatial_dims not in (2, 3):
            raise NotImplementedError(f"Spatial dimensions {spatial_dims} is not supported.")
        self._spatial_dims = spatial_dims
        self.node_a = np.ones((self.num_blocks + 1, self.num_depths)) if node_a is None \
            else np.asarray(node_a)

        f = self.filter_nums
        stem_down, stem_up = {}, {}
        for res_idx in range(self.num_depths):
            if use_downsample:
                stem_down[str(res_idx)] = _Stem(
                    _Resize(1 / (2 ** res_idx), spatial_dims),
                    nnx.Conv(in_channels, f[res_idx], kernel_size=(3,) * spatial_dims,
                             padding=(1,) * spatial_dims, use_bias=False, rngs=rngs),
                    get_norm_layer(norm_name, spatial_dims, f[res_idx], rngs=rngs),
                    _Act(act_name),
                    nnx.Conv(f[res_idx], f[res_idx + 1], kernel_size=(3,) * spatial_dims,
                             strides=(2,) * spatial_dims, padding=(1,) * spatial_dims,
                             use_bias=False, rngs=rngs),
                    get_norm_layer(norm_name, spatial_dims, f[res_idx + 1], rngs=rngs),
                )
                stem_up[str(res_idx)] = _Stem(
                    _Act(act_name),
                    nnx.Conv(f[res_idx + 1], f[res_idx], kernel_size=(3,) * spatial_dims,
                             padding=(1,) * spatial_dims, use_bias=False, rngs=rngs),
                    get_norm_layer(norm_name, spatial_dims, f[res_idx], rngs=rngs),
                    _Resize(2.0, spatial_dims),
                )
            else:
                stem_down[str(res_idx)] = _Stem(
                    _Resize(1 / (2 ** res_idx), spatial_dims),
                    nnx.Conv(in_channels, f[res_idx], kernel_size=(3,) * spatial_dims,
                             padding=(1,) * spatial_dims, use_bias=False, rngs=rngs),
                    get_norm_layer(norm_name, spatial_dims, f[res_idx], rngs=rngs),
                )
                stem_up[str(res_idx)] = _Stem(
                    _Act(act_name),
                    nnx.Conv(f[res_idx], f[max(res_idx - 1, 0)],
                             kernel_size=(3,) * spatial_dims, padding=(1,) * spatial_dims,
                             use_bias=False, rngs=rngs),
                    get_norm_layer(norm_name, spatial_dims, f[max(res_idx - 1, 0)], rngs=rngs),
                    _Resize(2.0 if res_idx != 0 else 1.0, spatial_dims),
                )
        self.stem_down = nnx.Dict(stem_down)
        self.stem_up = nnx.Dict(stem_up)
        self.stem_final_block = ActiConvNormBlock(f[0], f[0], act_name=act_name,
                                                  norm_name=norm_name,
                                                  spatial_dims=spatial_dims, rngs=rngs)
        self.stem_final_conv = nnx.Conv(f[0], num_classes, kernel_size=(1,) * spatial_dims,
                                        rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = jnp.transpose(x, (0,) + tuple(range(2, x.ndim)) + (1,))
        inputs = []
        for d in range(self.num_depths):
            x_out = self.stem_down[str(d)](h)
            inputs.append(x_out if self.node_a[0][d] else jnp.zeros_like(x_out))
        outputs = self.dints_space(inputs)
        start = False
        temp = None
        for res_idx in range(self.num_depths - 1, -1, -1):
            if start:
                temp = self.stem_up[str(res_idx)](outputs[res_idx] + temp)
            elif self.node_a[-1][res_idx]:
                start = True
                temp = self.stem_up[str(res_idx)](outputs[res_idx])
        pred = self.stem_final_conv(self.stem_final_block(temp))
        return jnp.transpose(pred, (0, pred.ndim - 1) + tuple(range(1, pred.ndim - 1)))


# ---------------------------------------------------------------------------
# Reference-name interface/stem classes (reference: dints.py CellInterface /
# StemInterface / StemTS — torchscript interface shims there; here plain modules)
# ---------------------------------------------------------------------------
class CellInterface(nnx.Module):
    """Interface protocol for a searchable cell: __call__(x, weight)."""

    def __call__(self, x, weight=None):
        raise NotImplementedError


class StemInterface(nnx.Module):
    """Interface protocol for a stem: __call__(x)."""

    def __call__(self, x):
        raise NotImplementedError


class StemTS(StemInterface):
    """Sequential stem wrapper (reference: dints.py StemTS)."""

    def __init__(self, *mod):
        self.mod = nnx.List(list(mod))

    def __call__(self, x):
        for m in self.mod:
            x = m(x)
        return x


__all__ += ["CellInterface", "StemInterface", "StemTS"]
