"""Trainer orchestration (reference torch_points3d/trainer.py:34-521).

Builds checkpoint/dataset/model/loaders/tracker/visualizer, runs the epoch
loops with the jitted StepRunner, tracks metrics (every 10th train batch,
every eval batch — trainer.py:333-335), selects best checkpoints on the
selection stage, and exports predictions.

TPU-architecture differences (deliberate):
  * the train step is one jitted program over the device mesh — no
    DataParallel wrap, no GradScaler (bf16 needs none)
  * host augmentation + collate overlap device compute via the Loader's
    prefetch threads
  * `enable_mixed` maps to bf16 compute inside models rather than AMP
"""
from __future__ import annotations

import dataclasses
import logging
import os
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import optax

from ..data.batch import CollateSpec
from ..data.dataset import instantiate_dataset
from ..data.loader import Loader
from ..models.factory import ModelBundle, instantiate_model
from ..parallel.mesh import make_mesh, maybe_init_distributed
from ..visualization.visualizer import Visualizer
from .optim import adabelief, make_lr_fn
from .state import ModelCheckpoint, TrainState, restore_opt_state
from .step import StepRunner

log = logging.getLogger(__name__)


def _cfg_to_dict(cfg):
    return cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)


class Trainer:
    def __init__(self, cfg, eval_mode: bool = False):
        self._cfg = cfg
        self._eval_mode = eval_mode
        self._initialize_trainer()

    # ------------------------------------------------------------------ init
    def _initialize_trainer(self) -> None:
        cfg = self._cfg
        # multi-host bring-up must precede the first device query
        maybe_init_distributed()
        # persistent compilation cache: TPU compiles through the axon tunnel
        # cost minutes; reruns of the same shapes (trials, eval, resume) hit
        # the disk cache instead (same setup as bench.py)
        cache_dir = str(cfg.get("jax_cache_dir", "") or os.path.join(
            os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except (OSError, AttributeError) as e:  # read-only fs etc.
            log.info(f"compilation cache disabled: {e}")
        self.training_cfg = cfg["training"]
        get_t = self.training_cfg.get
        self.epochs = int(get_t("epochs", 1))
        self.batch_size = int(get_t("batch_size", 2))
        self.shuffle = bool(get_t("shuffle", True))
        self.num_workers = int(get_t("num_workers", 4))
        self.seed = int(cfg.get("seed", 0) or 0)
        self.eval_frequency = int(cfg.get("eval_frequency", 1))
        self.selection_stage = str(cfg.get("selection_stage", "") or "val")
        self.update_lr_on = str(cfg.get("update_lr_scheduler_on", "on_epoch"))
        self.tracker_options = cfg.get("tracker_options", {}) or {}
        dbg = cfg.get("debugging", {}) or {}
        self.early_break = bool(dbg.get("early_break", False))
        self.num_batches_stop = dbg.get("num_batches", 0) or 0
        self.profiling = bool(dbg.get("profiling", False))
        self.find_neighbour_dist = bool(dbg.get("find_neighbour_dist", False))
        self.num_find_neighbour_samples = int(
            dbg.get("num_find_neighbour_samples", 32))
        self.progress_batches = int(dbg.get("progress_batches", 0) or 0)

        checkpoint_dir = str(get_t("checkpoint_dir", "") or "")
        self.resume = bool(checkpoint_dir)
        self.run_dir = str(cfg.get("run_dir", ".") or ".")
        Path(self.run_dir).mkdir(parents=True, exist_ok=True)
        self.model_name = str(cfg["model_name"])

        run_config = _cfg_to_dict(cfg)
        from .state import check_env_snapshot, dpcr_env_snapshot
        run_config["dpcr_env"] = dpcr_env_snapshot()
        self.checkpoint = ModelCheckpoint(
            checkpoint_dir or self.run_dir, self.model_name,
            self.selection_stage, run_config=run_config,
            resume=self.resume, save_dir=self.run_dir)
        self._saved_target_stats = (
            self.checkpoint.checkpoint.dataset_properties or {}).get(
            "target_stats")
        if self.resume and not self.checkpoint.is_empty():
            # re-create model/dataset from the stored run config
            # (model_checkpoint.py:182-193) unless the caller overrides
            saved = self.checkpoint.checkpoint.run_config
            check_env_snapshot(saved)
            if saved and not self._eval_mode:
                log.info("Resuming from checkpoint run config")
            # forward-only surfaces (eval.py / calibrate_bn.py) rebuild a
            # minimal cfg['training'] that carries no enable_mixed: inherit
            # the TRAIN-time compute dtype from the stored run config — the
            # reference evals/calibrates under the same AMP autocast it
            # trained with (its trainer.py:254-258,391-398). An explicit
            # enable_mixed=False override still wins (not-None check).
            saved_tr = dict((saved or {}).get("training") or {})
            if get_t("enable_mixed", None) is None and \
                    saved_tr.get("enable_mixed"):
                self.training_cfg["enable_mixed"] = True
                log.info("inherited enable_mixed=True (bf16 compute) from "
                         "the checkpoint run config")

        self.dataset = instantiate_dataset(cfg["data"])
        self._auto_calibrate_kpconv_limits(cfg)
        self.bundle: ModelBundle = instantiate_model(
            cfg["models"], self.model_name, self.dataset, bn_axis_name=None)
        # target-normalization stats travel with the checkpoint (the
        # reference stores reg_scale/center_targets as model buffers,
        # base.py:110-114; override_target_stats=True keeps them on load,
        # base.py:195-201)
        import numpy as _np
        if self.resume and self._saved_target_stats and \
                self.bundle.option.get("override_target_stats", True):
            st = self._saved_target_stats
            self.bundle.spec = dataclasses.replace(
                self.bundle.spec,
                scale=_np.asarray(st["scale"], _np.float32),
                center=_np.asarray(st["center"], _np.float32),
                weights=_np.asarray(st["weights"], _np.float32))
            log.info("restored target normalization stats from checkpoint")
        self.checkpoint.checkpoint.dataset_properties["target_stats"] = {
            "scale": _np.asarray(self.bundle.spec.scale).tolist(),
            "center": _np.asarray(self.bundle.spec.center).tolist(),
            "weights": _np.asarray(self.bundle.spec.weights).tolist(),
        }
        # label-free inference (predict.py) rebuilds the model + pipeline
        # from the checkpoint alone — record the names it needs
        self.checkpoint.checkpoint.dataset_properties.setdefault(
            "reg_targets", list(getattr(self.dataset, "reg_targets", [])))
        if bool(get_t("enable_mixed", False)) and hasattr(self.bundle.net,
                                                          "dtype"):
            # TPU mixed precision: bf16 compute, f32 params/BN stats —
            # replaces the reference's AMP GradScaler (SURVEY.md §2.10)
            import jax.numpy as jnp
            self.bundle.net = dataclasses.replace(self.bundle.net,
                                                  dtype=jnp.bfloat16)

        # mesh: data-parallel over all visible devices that divide batch_size
        self._n_proc = jax.process_count()
        self._is_main = jax.process_index() == 0
        n_dev = len(jax.devices())  # GLOBAL device count under multi-host
        if self._n_proc > 1:
            if self.batch_size % n_dev:
                # can't silently shrink the mesh: every process's devices
                # must participate or the collectives deadlock
                raise ValueError(
                    f"multi-host run: batch_size {self.batch_size} must "
                    f"divide by the global device count {n_dev}")
        else:
            while n_dev > 1 and self.batch_size % n_dev:
                n_dev -= 1
        self.mesh = make_mesh(n_dev) if n_dev > 1 else None

        self._create_loaders()

        # optimizer
        optim_cfg = self.training_cfg.get("optim", {}) or {}
        base_lr = float(optim_cfg.get("base_lr", 1e-3))
        accum = int(optim_cfg.get("accumulated_gradient", 1) or 1)
        self.lr_fn = make_lr_fn(
            optim_cfg.get("lr_scheduler"), base_lr, self.update_lr_on,
            batches_per_epoch=max((len(self.loaders.get("train"))
                                   if self.loaders.get("train") else 1)
                                  // accum, 1),
            batch_size=self.batch_size * accum, steps_per_update=accum)
        self.tx = self._build_optimizer(optim_cfg)

        from .regularizers import build_regularizer
        self.runner = StepRunner(net=self.bundle.net, spec=self.bundle.spec,
                                 tx=self.tx, mesh=self.mesh, seed=self.seed,
                                 regularizer=build_regularizer(
                                     self.bundle.option))
        self.bn_momentum_fn = None
        bn_sched = optim_cfg.get("bn_scheduler")
        if bn_sched:
            from .optim import bn_momentum_fn
            self.bn_momentum_fn = bn_momentum_fn(bn_sched)

        # ReduceLROnPlateau (conf/lr_scheduler/plateau.yaml): metric-driven
        # lr scaling with optimizer state preserved across rebuilds
        sched_cfg = optim_cfg.get("lr_scheduler") or {}
        self._plateau = None
        if str(sched_cfg.get("class", "")) == "ReduceLROnPlateau":
            p = sched_cfg.get("params", {}) or {}
            self._plateau = {
                "mode": str(p.get("mode", "min")),
                "factor": float(p.get("factor", 0.1)),
                "patience": int(p.get("patience", 10)),
                "best": None, "bad": 0, "scale": 1.0,
            }
        example = self._example_batch()
        self.state = self.runner.init_state(example)
        self._maybe_restore_weights()

        wandb_log = bool(self.training_cfg.get("wandb", {}).get("log", False)) \
            if self.training_cfg.get("wandb") else False
        wandb_log = wandb_log and self._is_main
        if wandb_log:
            from ..utils.wandb_utils import wandb_init
            self._wandb_run = wandb_init(self.training_cfg.get("wandb"),
                                         run_config, self.run_dir)
            wandb_log = self._wandb_run is not None
        tb_log = bool(self.training_cfg.get("tensorboard", {}).get("log", False)) \
            if self.training_cfg.get("tensorboard") else False
        # non-zero ranks compute the same replicated metrics/predictions;
        # only process 0 owns files, wandb, tensorboard, and export
        self.tracker = self.dataset.get_tracker(
            wandb_log, tb_log and self._is_main,
            log_dir=self.run_dir if self._is_main else None)
        num_batches = {s: (len(l) if l else 0) for s, l in self.loaders.items()}
        self.visualizer = Visualizer(
            (cfg.get("visualization", {}) or {}) if self._is_main
            else {"format": []},  # {} would fall back to the csv default
            num_batches, self.batch_size, self.run_dir)

    def _make_tx(self, name: str, params: dict, grad_clip, lr_fn
                 ) -> optax.GradientTransformation:
        chain = []
        if grad_clip and float(grad_clip) > 0:
            # torch clip_grad_value_ semantics (base_model.py:241-243)
            chain.append(optax.clip(float(grad_clip)))
        if name.lower() == "adabelief":
            chain.append(adabelief(lr_fn, **params))
        elif name.lower() == "sgd":
            chain.append(optax.sgd(lr_fn,
                                   momentum=params.get("momentum", 0.0)))
            if params.get("weight_decay"):
                chain.insert(-1, optax.add_decayed_weights(
                    float(params["weight_decay"])))
        elif name.lower() in ("adam", "adamw"):
            fn = optax.adamw if name.lower() == "adamw" else optax.adam
            kwargs = {}
            if name.lower() == "adamw" and "weight_decay" in params:
                kwargs["weight_decay"] = float(params["weight_decay"])
            chain.append(fn(lr_fn, **kwargs))
        else:
            raise ValueError(f"Unknown optimizer: {name}")
        return optax.chain(*chain)

    def _build_optimizer(self, optim_cfg) -> optax.GradientTransformation:
        opt = optim_cfg.get("optimizer", {}) or {}
        name = str(opt.get("class", "AdaBelief"))
        params = _cfg_to_dict(opt.get("params", {}) or {})
        params.pop("lr", None)
        grad_clip = optim_cfg.get("grad_clip", -1)
        self.optimizer_name = name

        head_set = dict(self.bundle.head_optim_settings or {})
        back_set = dict(self.bundle.backbone_optim_settings or {})
        if head_set or back_set:
            # per-group optimizer settings (reference get_parameter_list,
            # minkowski.py:54-65): the head namespace gets its own hyperparams
            ns = self.bundle.head_namespace

            def group_tx(settings):
                p = dict(params)
                lr_fn = self.lr_fn
                if "lr" in settings:
                    from .optim import constant
                    lr_fn = constant(float(settings["lr"]))
                for k, v in settings.items():
                    if k != "lr":
                        p[k] = v
                return self._make_tx(name, p, grad_clip, lr_fn)

            def label_tree(param_tree):
                def walk(node, path):
                    if isinstance(node, dict):
                        return {k: walk(v, path + (k,)) for k, v in
                                node.items()}
                    return "head" if any(ns in str(p) for p in path) \
                        else "backbone"
                return walk(param_tree, ())

            tx = optax.multi_transform(
                {"head": group_tx(head_set), "backbone": group_tx(back_set)},
                label_tree)
        else:
            tx = self._make_tx(name, params, grad_clip, self.lr_fn)
        accum = int(optim_cfg.get("accumulated_gradient", 1) or 1)
        if accum > 1:
            # reference gradient accumulation (base_model.py:195-207):
            # optimizer steps every `accum` batches with averaged grads
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        return tx

    def _create_loaders(self) -> None:
        spec: CollateSpec = self.bundle.collate
        shard = None
        if self._n_proc > 1:
            # every process must compile/execute the SAME program per step:
            # a data-dependent bucket choice could diverge across hosts and
            # deadlock the collectives, so pin to the top bucket
            if spec.buckets:
                spec = dataclasses.replace(spec,
                                           buckets=(max(spec.buckets),))
            elif spec.num_points is None:
                # dense collate without a fixed point count pads each batch
                # to a power of two of the LOCAL max count — data-dependent
                # per process, so hosts could compile different shapes and
                # deadlock. Refuse rather than hang nondeterministically.
                raise ValueError(
                    "multi-host run with a dense collate needs a "
                    "deterministic global shape: set the preset's "
                    "num_points (e.g. transform_type=fixed_xy) or a "
                    "bucket ladder")
            if getattr(self.dataset, "pre_batch_collate_transform", None) \
                    is not None:
                # the batch-level hook (ClampBatchSize) makes sample-drop
                # decisions from the whole batch's point counts; under
                # sharding each process would clamp its own slice — a
                # different global batch (and point budget) than the
                # single-process run. Refuse rather than silently diverge.
                raise ValueError(
                    "multi-host run is incompatible with "
                    "pre_batch_collate_transform (per-shard clamping would "
                    "diverge from the single-process batch); drop the hook "
                    "or run single-host")
            shard = (jax.process_index(), self._n_proc)
        # loader-side device placement: the H2D copy of batch k+1 overlaps
        # the device step of batch k (on the remote-TPU transport the
        # per-batch transfer otherwise sits on the critical path). Single
        # process only: under multi-host the tracker/visualizer read the
        # LOCAL numpy batch, which put_fn would replace with global arrays.
        prefetch_on = self._n_proc == 1 and \
            os.environ.get("DPCR_DEVICE_PREFETCH", "1") == "1"
        self.loaders: Dict[str, Optional[Loader]] = {}
        for split in ("train", "val", "test"):
            put_fn = None
            if prefetch_on:
                # eval loaders keep pos on the wire: the visualizer's
                # point-cloud exports read batch.pos host-side (wants_pos);
                # in eval mode the train split is an eval stage too
                keep_pos = split != "train" or self._eval_mode
                put_fn = (lambda b, _k=keep_pos:
                          self.runner.device_put(b, keep_pos=_k))
            ds = self.dataset.datasets.get(split)
            if ds is None or len(ds) == 0:
                self.loaders[split] = None
                continue
            is_train = split == "train" and not self._eval_mode
            self.loaders[split] = Loader(
                ds, self.dataset.transform_for(split),
                batch_size=self.batch_size, spec=spec,
                shuffle=is_train and self.shuffle,
                double_batch=self.bundle.spec.double_batch and is_train,
                drop_last=is_train, seed=self.seed,
                num_workers=self.num_workers,
                post_collate=self.bundle.post_collate,
                pre_batch_collate=getattr(
                    self.dataset, "pre_batch_collate_transform", None),
                shard=shard, put_fn=put_fn)

    def _example_batch(self):
        for split in ("train", "val", "test"):
            loader = self.loaders.get(split)
            if loader is not None:
                batch = next(iter(loader.epoch(0)), None)
                if batch is None:
                    raise RuntimeError(
                        f"The '{split}' split yields zero batches: "
                        f"{len(loader.dataset)} sample(s) with "
                        f"batch_size={loader.batch_size}"
                        + (" and drop_last" if loader.drop_last else "")
                        + ". Lower training.batch_size or provide more "
                        "data (e.g. data.synthetic_plots).")
                return batch
        raise RuntimeError("No data available in any split")

    def _maybe_restore_weights(self) -> None:
        if self.checkpoint.is_empty():
            return
        weight_name = str(self.training_cfg.get("weight_name", "latest"))
        saved = self.checkpoint.checkpoint.get_model_state(weight_name)
        self.state = _load_model_state(self.state, saved)
        opt = self.checkpoint.checkpoint.optimizer
        if opt and opt[1] and not self._eval_mode:
            try:
                restored = restore_opt_state(self.state.opt_state,
                                             opt[1]["opt_state"])
                self.state = dataclasses.replace(
                    self.state, opt_state=restored,
                    step=int(opt[1].get("step", 0)),
                    epoch=int(opt[1].get("epoch", 0)),
                    num_samples=int(opt[1].get("num_samples", 0)))
            except Exception as e:
                log.warning(f"Could not restore optimizer state: {e}")
        log.info(f"Restored weights '{weight_name}' "
                 f"(epoch {self.checkpoint.start_epoch - 1})")

    # ------------------------------------------------------------------ loops
    @property
    def start_epoch(self) -> int:
        return self.checkpoint.start_epoch

    def _apply_plateau(self, metrics: dict) -> None:
        """ReduceLROnPlateau on the selection-stage loss: after `patience`
        non-improving evals, scale the lr and rebuild the jitted step
        (optimizer state is preserved — same pytree structure)."""
        if self._plateau is None:
            return
        key = next((k for k in metrics if k.endswith("_loss")), None)
        if key is None:
            return
        value = float(metrics[key])
        st = self._plateau
        better = st["best"] is None or (
            value < st["best"] if st["mode"] == "min" else value > st["best"])
        if better:
            st["best"], st["bad"] = value, 0
            return
        st["bad"] += 1
        if st["bad"] > st["patience"]:
            st["scale"] *= st["factor"]
            st["bad"] = 0
            scale = st["scale"]
            base = self.lr_fn
            log.info(f"ReduceLROnPlateau: lr scale -> {scale:g}")
            scaled = lambda c, _b=base, _s=scale: _b(c) * _s  # noqa: E731
            optim_cfg = self.training_cfg.get("optim", {}) or {}
            opt = optim_cfg.get("optimizer", {}) or {}
            params = _cfg_to_dict(opt.get("params", {}) or {})
            params.pop("lr", None)
            self.tx = self._make_tx(self.optimizer_name, params,
                                    optim_cfg.get("grad_clip", -1), scaled)
            self.runner = dataclasses.replace(self.runner, tx=self.tx)
            self.runner.__post_init__()

    def _auto_calibrate_kpconv_limits(self, cfg) -> None:
        """Startup neighborhood-limit calibration for KPConv (the TPU
        analogue of the reference's uncapped variable-K CPU neighborhoods,
        models/instance/kpconv.py:46,133-143): static shapes need per-layer
        K caps; instead of the blanket default 40, sample training plots and
        cap at the 90th-percentile neighbor count per pyramid level — the
        edge pipeline (gather/influence/matmul) scales linearly with K.

        Skipped when extra_options.neighborhood_limits is set explicitly or
        models.<name>.auto_calibrate_limits=False. The calibrated limits are
        written into the model option (and therefore into the checkpoint's
        run_config) so restore/eval rebuild the exact same static shapes."""
        option = cfg["models"].get(self.model_name)
        if option is None or "kpconv" not in str(option.get("class", "")).lower():
            return
        if not option.get("auto_calibrate_limits", True):
            return
        extra = option.get("extra_options") or {}
        if extra.get("neighborhood_limits"):
            return
        from .. import native
        if not native.is_available():
            return
        # p90 default; models.<name>.calibrate_percentile (or the
        # DPCR_KP_CALIB_PCT env var) tightens the crop — the reference's own
        # neighborhood_limits cropping proves tolerance, and the edge
        # pipeline cost is linear in K (docs/experiments/round3)
        env_pct = os.environ.get("DPCR_KP_CALIB_PCT")
        pct = (float(env_pct) if env_pct
               else float(option.get("calibrate_percentile", 90.0)))
        try:
            from ..utils.neighbor_calibration import run_find_neighbour_dist
            limits = run_find_neighbour_dist(
                self.dataset, option, n_samples=16, percentile=pct)
        except Exception as e:
            log.warning(f"neighborhood-limit calibration skipped: {e}")
            return
        if not limits:
            return
        if hasattr(extra, "_data"):
            extra = dict(extra._data)
        else:
            extra = dict(extra)
        extra["neighborhood_limits"] = [int(x) for x in limits]
        option["extra_options"] = extra
        # run_config was snapshotted before the dataset existed — write the
        # calibrated limits into it so checkpoints rebuild identical shapes
        rc = self.checkpoint.checkpoint.run_config
        try:
            rc["models"][self.model_name].setdefault("extra_options", {})
            rc["models"][self.model_name]["extra_options"][
                "neighborhood_limits"] = extra["neighborhood_limits"]
        except (KeyError, TypeError):
            pass
        log.info(f"auto-calibrated neighborhood_limits: {limits}")

    def train(self) -> None:
        if self.find_neighbour_dist:
            from ..utils.neighbor_calibration import run_find_neighbour_dist
            limits = run_find_neighbour_dist(
                self.dataset, self.bundle.option,
                self.num_find_neighbour_samples)
            log.info(f"calibrated neighborhood_limits: {limits} "
                     "(pass via models.<name>.extra_options.neighborhood_limits)")
        start = self.start_epoch
        if start > self.epochs:
            # resume-finished: single final test epoch (trainer.py:214-217)
            self._test_epoch(start, "test")
            return
        for epoch in range(start, self.epochs + 1):
            log.info(f"EPOCH {epoch} / {self.epochs}")
            self._train_epoch(epoch)
            if self.profiling and self.num_batches_stop:
                return
            eval_stages = [s for s in ("val", "test")
                           if self.eval_frequency
                           and epoch % self.eval_frequency == 0
                           and self.loaders.get(s)]
            # one checkpoint serialization per epoch (persist on last stage)
            self._persist_next = not eval_stages
            if eval_stages:
                for i, stage in enumerate(eval_stages):
                    self._persist_next = (i == len(eval_stages) - 1)
                    metrics = self._test_epoch(epoch, stage)
                    if stage == (self.selection_stage or "val"):
                        self._apply_plateau(metrics)

    def eval(self, stage: str = "test") -> Dict[str, float]:
        if self.loaders.get(stage) is None:
            log.warning(f"No {stage} dataset, skipping")
            return {}
        return self._test_epoch(self.start_epoch - 1, stage)

    def iterate_epochs(self, n: int) -> None:
        """BN recalibration: forward-only train-mode epochs
        (calibrate_bn.py:8-21, trainer.py:230-283)."""
        for i in range(n):
            log.info(f"BN calibration epoch {i + 1}/{n}")
            self.tracker.reset("train")
            for bi, batch in enumerate(self.loaders["train"].epoch(i)):
                self.state, out = self.runner.calibrate(self.state, batch,
                                                        salt=i * 100003 + bi)
                self._track(batch, out, every=10, batch_i=bi)
                if self._stop_early(bi):
                    break
            metrics = self.tracker.get_metrics()
            self.checkpoint.save_best_models_under_current_metrics(
                self.state, "train", self.start_epoch - 1, metrics,
                self.tracker.metric_func, self.optimizer_name,
                persist=self._is_main)

    def _apply_bn_schedule(self, epoch: int) -> None:
        """BNMomentumScheduler parity (bn_schedulers.py:6-112): flax module
        attrs are static, so a momentum change rebuilds the net + jit."""
        if self.bn_momentum_fn is None:
            return
        m = self.bn_momentum_fn(epoch)
        for attr in ("bn_momentum", "batch_norm_momentum"):
            if hasattr(self.bundle.net, attr) and \
                    getattr(self.bundle.net, attr) != m:
                log.info(f"BN momentum -> {m:.4f} (epoch {epoch})")
                self.bundle.net = dataclasses.replace(self.bundle.net,
                                                      **{attr: m})
                self.runner = dataclasses.replace(self.runner,
                                                  net=self.bundle.net)
                self.runner.__post_init__()

    def _train_epoch(self, epoch: int) -> None:
        self._apply_bn_schedule(epoch)
        self.tracker.reset("train")
        self.visualizer.reset(epoch, "train")
        loader = self.loaders["train"]
        t0 = time.time()
        n_batches = len(loader)
        profiling = self.profiling and self.num_batches_stop
        if profiling:
            import jax.profiler
            jax.profiler.start_trace(str(Path(self.run_dir) / "profile"))
        # per-batch data-wait vs device-step split (the reference's tqdm
        # postfix signal, trainer.py:337-341): data_s counts time blocked on
        # the loader iterator (prefetch falling behind), step_s everything
        # else (dispatch + the 10th-batch metric fetch, which is where async
        # device work is actually awaited)
        progress = self.progress_batches
        if progress <= 0:
            progress = max(n_batches // 4, 1)
        data_s = step_s = 0.0
        it = iter(loader.epoch(epoch))
        bi = -1
        while True:
            td = time.perf_counter()
            batch = next(it, None)
            data_s += time.perf_counter() - td
            if batch is None:
                break
            bi += 1
            ts = time.perf_counter()
            self.state, out = self.runner.train(self.state, batch)
            if bi % 10 == 0:  # track every 10th batch (trainer.py:333-335)
                self._track(batch, out)
            step_s += time.perf_counter() - ts
            if bi and bi % progress == 0:
                n = bi + 1
                log.info(f"  batch {bi}/{n_batches}: "
                         f"data {data_s / n * 1e3:.0f} ms/b, "
                         f"step {step_s / n * 1e3:.0f} ms/b, "
                         f"{n * self.batch_size / (data_s + step_s):.1f} "
                         f"plots/s")
            if self._stop_early(bi):
                break
        if profiling:
            import jax.profiler
            jax.profiler.stop_trace()
            log.info(f"profile trace written to {self.run_dir}/profile")
        self.state = dataclasses.replace(self.state, epoch=epoch)
        dur = time.time() - t0
        log.info(f"train epoch {epoch}: {n_batches} batches in {dur:.1f}s "
                 f"({n_batches * self.batch_size / max(dur, 1e-9):.1f} plots/s"
                 f"; data {data_s:.1f}s / step {step_s:.1f}s)")
        self._finalize_epoch(epoch, "train")

    def _test_epoch(self, epoch: int, stage: str) -> Dict[str, float]:
        loader = self.loaders[stage]
        self.tracker.reset(stage)
        self.visualizer.reset(epoch, stage)
        voting_runs = int(self._cfg.get("voting_runs", 1) or 1)
        enable_dropout = bool(self._cfg.get("enable_dropout", False))
        enable_bn = bool(self._cfg.get("enable_bn", False))
        # Per-batch eval outputs are NOT pulled to host inside the loop:
        # every np.asarray on a device output is a full round-trip on a
        # remote transport (measured ~8-12 min per 3-stage eval through the
        # axon tunnel vs ~90 s per train epoch — docs/experiments/round4).
        # Instead the device `out` dicts (reg_out [B,T] + per-sample meta,
        # ~1 KB/batch) accumulate and ONE jax.device_get at stage end pulls
        # them all — device_get starts every copy async before blocking, so
        # the transfers pipeline. Tracker/visualizer math is unchanged (the
        # reference tracks every batch, trainer.py:391-398 — same semantics,
        # different transport). DPCR_EVAL_D2H=per_batch restores the old
        # path (debug aid).
        per_batch = os.environ.get("DPCR_EVAL_D2H", "") == "per_batch"
        pending: list = []
        for run in range(voting_runs):
            for bi, batch in enumerate(loader.epoch(run)):
                if enable_bn:
                    # BN in train mode during eval (enable_bn_in_eval,
                    # base_model.py:362-368) — batch stats, not persisted
                    _, out = self.runner._calib_step(
                        self.state.params, self.state.batch_stats,
                        self.runner._put(batch),
                        np.int32(run * 100003 + bi))
                else:
                    out = self.runner.evaluate(self.state, batch,
                                               enable_dropout=enable_dropout,
                                               rng_salt=run * 100003 + bi)
                if per_batch:
                    self._track(batch, out)
                    self._visualize(batch, out)
                else:
                    if self.visualizer.is_active and self.visualizer.wants_pos:
                        # the ply exporter consumes the (host-side) point
                        # cloud alongside the outputs; holding every
                        # batch.pos would pin the whole split in host
                        # memory, so visualize per batch and defer only the
                        # tracker outputs
                        self._visualize(batch, out)
                    pending.append(out)
                if self._stop_early(bi):
                    break
        if pending:
            host_outs = jax.device_get(pending)
            viz_deferred = not (self.visualizer.is_active
                                and self.visualizer.wants_pos)
            for out in host_outs:
                self._track(None, out)
                if viz_deferred:
                    self._visualize(None, out)
        return self._finalize_epoch(epoch, stage)

    # ------------------------------------------------------------------ utils
    def _track(self, batch, out, every: int = 1, batch_i: int = 0) -> None:
        if every > 1 and batch_i % every:
            return
        # per-sample metadata comes from the step OUTPUT, not the host batch:
        # step outputs are replicated over the mesh, so under multi-host the
        # tracker sees the GLOBAL rows while the host batch is local-only
        meta = out["sample_meta"]
        sample_mask = ~np.asarray(meta["is_double"])
        if meta["valid"] is not None:
            sample_mask &= np.asarray(meta["valid"])
        self.tracker.track({
            "losses": {"loss": float(out["loss"]),
                       "loss_reg": float(out["loss_reg"])},
            "reg_out": np.asarray(out["reg_out"]),
            "reg_y": np.asarray(meta["y_reg"]),
            "area_idx": np.asarray(meta["area_idx"]),
            "sample_mask": sample_mask,
        })

    def _visualize(self, batch, out) -> None:
        if not self.visualizer.is_active:
            return
        meta = out["sample_meta"]
        sample_mask = ~np.asarray(meta["is_double"])
        if meta["valid"] is not None:
            sample_mask &= np.asarray(meta["valid"])
        wants_pos = self.visualizer.wants_pos
        if self._n_proc > 1 and wants_pos:
            # the point cloud lives only in the local shard, but reg_out/meta
            # are global — skip ply/3D panels rather than mix row spaces;
            # csv/gpkg exports stay global
            log.warning("multi-host: ply/3D point-cloud panels are disabled "
                        "(positions are host-local); csv/gpkg stay global")
            wants_pos = False
        self.visualizer.save_visuals(
            np.asarray(out["reg_out"]), np.asarray(meta["y_reg"]),
            np.asarray(meta["area_idx"]), np.asarray(meta["label_idx"]),
            self.dataset.area_names, self.dataset.reg_targets,
            sample_mask=sample_mask,
            # device->host transfer of the full point cloud only when the
            # ply exporter will actually use it
            pos=(np.asarray(batch.pos) if wants_pos
                 and batch.pos is not None else None),
            pos_mask=(np.asarray(batch.mask) if wants_pos
                      and batch.mask is not None else None))

    def _finalize_epoch(self, epoch: int, stage: str) -> Dict[str, float]:
        self.tracker.finalise()
        metrics = self.tracker.get_metrics()
        improved = self.checkpoint.save_best_models_under_current_metrics(
            self.state, stage, epoch, metrics, self.tracker.metric_func,
            self.optimizer_name,
            persist=getattr(self, "_persist_next", True) and self._is_main)
        if improved:
            log.info(f"improved: {', '.join(improved)}")
            self.tracker.publish_best_tables(improved, metrics, epoch)
        self.tracker.publish_metrics(metrics, epoch)
        self.visualizer.finalize_epoch(self.dataset)
        return metrics

    def _stop_early(self, batch_i: int) -> bool:
        if self.early_break and batch_i >= 0:
            return True
        if self.num_batches_stop and batch_i + 1 >= self.num_batches_stop:
            return True
        return False


def _load_model_state(state: TrainState, saved: dict) -> TrainState:
    """Shape-checked partial load (base_model.py:151-159 semantics)."""
    def merge(template, src):
        out = {}
        for k, v in template.items():
            if isinstance(v, dict):
                out[k] = merge(v, src.get(k, {}) if isinstance(src, dict) else {})
            else:
                sv = src.get(k) if isinstance(src, dict) else None
                if sv is not None and np.shape(sv) == np.shape(v):
                    out[k] = np.asarray(sv).astype(np.asarray(v).dtype)
                else:
                    if sv is not None:
                        log.warning(f"shape mismatch for {k}, keeping init")
                    out[k] = v
        return out

    params = merge(jax.device_get(state.params), saved.get("params", {}))
    stats = merge(jax.device_get(state.batch_stats),
                  saved.get("batch_stats", {}))
    return dataclasses.replace(state, params=params, batch_stats=stats)
