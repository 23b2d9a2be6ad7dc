"""Jitted train/eval/calibrate steps over the device mesh.

One `jax.jit` program per (model, batch-shape bucket): forward + loss + grad +
AdaBelief update + metric outputs — the fused TPU equivalent of the
reference's optimize_parameters (base_model.py:230-256). bf16-friendly, no
GradScaler (TPU bf16 needs no loss scaling, SURVEY.md §2.10).

The batch is sharded over the mesh's `data` axis, params replicated; GSPMD
inserts gradient psums over ICI. BatchNorm moments reduce over the global
(sharded) batch axis, i.e. cross-replica BN — see nn/norm.py.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.base import InstanceSpec, compute_reg_loss, convert_outputs, reg_output
from ..parallel.mesh import put_global_batch, replicate_sharding
from .state import TrainState


def decode_wire(batch):
    """Undo data/batch.encode_wire inside the jit (free: fuses into the
    first consumers). Handles raw batches unchanged, so encoded and
    unencoded callers share this code path (two jit signatures)."""
    repl = {}
    if batch.coords is not None and batch.coords.dtype == jnp.int16:
        repl["coords"] = batch.coords.astype(jnp.int32)
    if batch.x is not None and batch.x.dtype != jnp.float32:
        repl["x"] = batch.x.astype(jnp.float32)
    return dataclasses.replace(batch, **repl) if repl else batch


def _sample_meta(batch) -> Dict[str, Any]:
    """Per-sample metadata echoed through the jitted step. Trackers and the
    visualizer consume these alongside reg_out; because step outputs are
    REPLICATED over the mesh, every process sees the GLOBAL rows under
    multi-host data parallelism, where the host-side batch holds only the
    local shard (tiny [B]/[B,T] arrays — negligible traffic)."""
    return {"y_reg": batch.y_reg, "area_idx": batch.area_idx,
            "label_idx": batch.label_idx, "is_double": batch.is_double,
            "valid": batch.valid}


def _forward(net, spec: InstanceSpec, params, batch_stats, batch, train: bool,
             dropout_rng=None, enable_dropout: bool = False):
    variables = {"params": params, "batch_stats": batch_stats}
    kwargs = {"enable_dropout": enable_dropout} if enable_dropout else {}
    if dropout_rng is not None:
        kwargs["rngs"] = {"dropout": dropout_rng}
    if train:
        raw, mutated = net.apply(variables, batch, train=True,
                                 mutable=["batch_stats", "losses"], **kwargs)
        new_stats = mutated["batch_stats"]
        # internal losses sown by modules (e.g. deformable-KPConv p2p
        # regularizer, architectures.py:153-166)
        internal = sum(jnp.sum(leaf) for leaf in
                       jax.tree_util.tree_leaves(mutated.get("losses", {})))
    else:
        raw = net.apply(variables, batch, train=False, **kwargs)
        new_stats = batch_stats
        internal = 0.0
    reg_out = convert_outputs(spec, raw)
    return reg_out, new_stats, internal


def make_train_step(net, spec: InstanceSpec, tx: optax.GradientTransformation,
                    mesh=None, regularizer: Optional[Callable] = None,
                    seed: int = 0) -> Callable:
    root_rng = jax.random.PRNGKey(seed)

    def loss_fn(params, batch_stats, batch, dropout_rng):
        reg_out, new_stats, internal = _forward(
            net, spec, params, batch_stats, batch, train=True,
            dropout_rng=dropout_rng)
        loss = compute_reg_loss(spec, reg_out, batch.y_reg, batch.y_reg_mask,
                                training=True) + internal
        if regularizer is not None:
            loss = loss + regularizer(params)
        return loss, (new_stats, reg_out)

    def step(params, batch_stats, opt_state, batch, step_idx):
        batch = decode_wire(batch)
        # rng derived inside the jit: a host-side fold_in would dispatch an
        # eager device op per step (one transport RTT on remote TPUs)
        dropout_rng = jax.random.fold_in(root_rng, 2 + step_idx)
        (loss, (new_stats, reg_out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, batch, dropout_rng)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        out = {"loss": loss, "loss_reg": loss,
               "reg_out": reg_output(spec, reg_out),
               "sample_meta": _sample_meta(batch)}
        return new_params, new_stats, new_opt_state, out

    if mesh is None:
        # donate params/stats/opt_state: the step replaces them, saving one
        # HBM copy of the full training state per step
        return jax.jit(step, donate_argnums=(0, 1, 2))
    repl = replicate_sharding(mesh)
    return jax.jit(step, in_shardings=(repl, repl, repl, None, None),
                   out_shardings=(repl, repl, repl, repl),
                   donate_argnums=(0, 1, 2))


def make_eval_step(net, spec: InstanceSpec, mesh=None,
                   train_mode: bool = False,
                   enable_dropout: bool = False) -> Callable:
    """Forward-only. train_mode=True reproduces calibrate_bn (BN running-stat
    updates under no_grad, calibrate_bn.py:8-21) / enable_bn_in_eval;
    enable_dropout=True keeps Dropout live (enable_dropout_in_eval)."""
    root_rng = jax.random.PRNGKey(10_000_019)

    def step(params, batch_stats, batch, rng_salt):
        batch = decode_wire(batch)
        dropout_rng = (jax.random.fold_in(root_rng, rng_salt)
                       if enable_dropout or train_mode else None)
        reg_out, new_stats, _ = _forward(
            net, spec, params, batch_stats, batch, train=train_mode,
            dropout_rng=dropout_rng, enable_dropout=enable_dropout)
        loss = compute_reg_loss(spec, reg_out, batch.y_reg, batch.y_reg_mask,
                                training=False)
        out = {"loss": loss, "loss_reg": loss,
               "reg_out": reg_output(spec, reg_out),
               "sample_meta": _sample_meta(batch)}
        return new_stats, out

    if mesh is None:
        return jax.jit(step)
    repl = replicate_sharding(mesh)
    return jax.jit(step, in_shardings=(repl, repl, None, None),
                   out_shardings=(repl, repl))


@dataclasses.dataclass
class StepRunner:
    """Binds state + jitted steps; keeps host-side counters and rng folding."""
    net: Any
    spec: InstanceSpec
    tx: optax.GradientTransformation
    mesh: Any = None
    seed: int = 0
    regularizer: Optional[Callable] = None

    def __post_init__(self):
        # under a mesh, switch scatters/gathers to the batch-dim-preserving
        # layout BEFORE any trace (ops/layout.py: the batch-flattened forms
        # force GSPMD to replicate their tables through giant collectives).
        # The flags are process-global and read at TRACE time, and a jitted
        # step retraces on any new input shape (e.g. a fresh collate bucket)
        # — so a second StepRunner with different mesh-ness must not leak its
        # layout into this runner's future retraces. Remember this runner's
        # layout and re-assert it before every dispatch (_assert_layout).
        self._layout = (self.mesh is not None,
                        self.mesh.devices.size if self.mesh is not None else 1)
        # wire-compaction policy (device_put): x ships in the model's
        # compute dtype only when that round-trips exactly through the
        # model's own `x.astype(dtype)` (bf16); pos ships only to models
        # that read it (SparseResNet never does — minkowski.py set_input)
        from ..models.minkowski import SparseResNet
        sparse_net = isinstance(self.net, SparseResNet)
        self._wire_x_dtype = jnp.bfloat16 if sparse_net \
            and getattr(self.net, "dtype", None) == jnp.bfloat16 else None
        self._wire_drop_pos = sparse_net
        self._assert_layout()
        self._train_step = make_train_step(self.net, self.spec, self.tx,
                                           self.mesh, self.regularizer,
                                           self.seed)
        self._eval_step = make_eval_step(self.net, self.spec, self.mesh, False)
        self._eval_step_dropout = make_eval_step(self.net, self.spec,
                                                 self.mesh, False, True)
        self._calib_step = make_eval_step(self.net, self.spec, self.mesh, True)
        self._root_rng = jax.random.PRNGKey(self.seed)

    def init_state(self, example_batch) -> TrainState:
        # jit the init: eager flax init would dispatch thousands of single
        # ops (prohibitive over a remote-TPU transport)
        self._assert_layout()
        rngs = {"params": jax.random.fold_in(self._root_rng, 0),
                "dropout": jax.random.fold_in(self._root_rng, 1)}
        if self.mesh is None:
            variables = jax.jit(partial(self.net.init, train=False))(
                rngs, example_batch)
            params = variables["params"]
            return TrainState(params=params,
                              batch_stats=variables.get("batch_stats", {}),
                              opt_state=self.tx.init(params))
        # under a mesh, init as one SPMD program with replicated outputs:
        # on multi-host runs every jit input/output must be a global array
        # (the per-process local init would produce host-local params that
        # the train step cannot consume), and on single host this is
        # equivalent to the plain jit + eager tx.init above

        def initf(batch):
            variables = self.net.init(rngs, batch, train=False)
            params = variables["params"]
            return (params, variables.get("batch_stats", {}),
                    self.tx.init(params))

        repl = replicate_sharding(self.mesh)
        params, batch_stats, opt_state = jax.jit(
            initf, out_shardings=repl)(self._put(example_batch))
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state)

    def _assert_layout(self):
        from ..ops import layout
        layout.set_batch_local(*self._layout)

    def device_put(self, batch, keep_pos: bool = False):
        """Transfer a host batch to device ahead of dispatch (loader-side
        prefetch, Loader(put_fn=...)): the H2D copy of batch k+1 overlaps
        the device step of batch k. Safe from worker threads — placement
        only, no tracing.

        Host Batch payloads are wire-compacted first (data/batch.encode_wire
        — int16 coords, compute-dtype x, pos dropped for models that never
        read it) unless DPCR_WIRE=off; the jitted steps decode in-graph
        (decode_wire), so the step math is bit-identical. keep_pos=True
        preserves pos for consumers outside the step (the visualizer's
        point-cloud exports on eval loaders)."""
        from ..data.batch import Batch, encode_wire
        if os.environ.get("DPCR_WIRE", "1") != "0" \
                and isinstance(batch, Batch) \
                and not isinstance(batch.mask, jax.Array):
            batch = encode_wire(
                batch, drop_pos=self._wire_drop_pos and not keep_pos,
                x_dtype=self._wire_x_dtype)
        return (put_global_batch(self.mesh, batch)
                if self.mesh is not None else jax.device_put(batch))

    def _put(self, batch):
        # every dispatch can retrace (new bucket shape), and the layout flags
        # are read at trace time — re-assert this runner's layout first
        self._assert_layout()
        if self.mesh is None:
            return batch
        # already placed by a loader put_fn (device arrays): re-putting is a
        # no-op single-host but np.asarray would break on multi-host globals
        leaves = jax.tree_util.tree_leaves(batch)
        if leaves and all(isinstance(l, jax.Array) for l in leaves):
            return batch
        return put_global_batch(self.mesh, batch)

    def train(self, state: TrainState, batch) -> tuple:
        params, stats, opt_state, out = self._train_step(
            state.params, state.batch_stats, state.opt_state,
            self._put(batch), np.int32(state.step))
        new_state = dataclasses.replace(
            state, params=params, batch_stats=stats, opt_state=opt_state,
            step=state.step + 1,
            # num_samples drives on_num_sample schedules and is GLOBAL:
            # under multi-host each process sees 1/process_count of the batch
            num_samples=state.num_samples
            + batch.mask.shape[0] * jax.process_count())
        return new_state, out

    def evaluate(self, state: TrainState, batch, enable_dropout: bool = False,
                 rng_salt: int = 0) -> Dict[str, Any]:
        fn = self._eval_step_dropout if enable_dropout else self._eval_step
        _, out = fn(state.params, state.batch_stats, self._put(batch),
                    np.int32(rng_salt))
        return out

    def calibrate(self, state: TrainState, batch, salt: int = 0) -> tuple:
        stats, out = self._calib_step(state.params, state.batch_stats,
                                      self._put(batch), np.int32(salt))
        return dataclasses.replace(state, batch_stats=stats), out
