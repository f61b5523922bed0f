"""Training harness: the reference's Lightning experiment, TPU-native.

Replaces BaseExperiment/MNISTExperiment + Lightning Trainer
(torch_scae_experiments/base_experiment.py:32-202, mnist/experiment.py,
mnist/train.py) with a compact loop around one jitted SPMD step:

  * model from factory (cfg['model'] == prepare_model_params kwargs)
  * optimizer zoo (rmsprop/radam/adam), eps = 1e-2/B^2, optional LookAhead,
    per-epoch exponential LR decay (base_experiment.py:44-77)
  * device-side pad+translate augmentation fused into the train step
  * per-step loss-term logging with the reference's metric names, val
    epoch means, and the three validation image grids
    (base_experiment.py:109-182)
  * Orbax top-k checkpointing + resume (SURVEY.md §5)
  * deterministic seeding: one root key -> init/data/noise streams
    (replaces global-RNG seed_everything, mnist/train.py:28-30)

No gc.collect() per batch (SURVEY.md §2.4(11)); steps are fully async on
device and the host only syncs when logging.
"""

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scae_tpu import factory
from scae_tpu.optim import make_optimizer
from scae_tpu.parallel.mesh import (
    DATA_AXIS,
    is_process_zero,
    make_global_array,
    make_mesh,
    replicate_sharding,
)
from scae_tpu.parallel.train_step import (
    TrainState,
    create_train_state,
    make_eval_scan,
    make_train_scan,
)
from jax.sharding import PartitionSpec as P
from scae_tpu.train import data as data_lib
from scae_tpu.train.checkpoint import (CheckpointManager,
                                       NullCheckpointManager)
from scae_tpu.train.metrics import (
    MetricsWriter,
    Profiler,
    viz_grid_tensors,
    write_reconstruction_grids,
)


def make_augment_fn(canvas: int, max_shift: int,
                    degrees: float = 0.0, scale_jitter: float = 0.0):
    """Device-side pad-to-canvas + random affine + translate (train only).

    degrees/scale_jitter default off (the reference recipe augments with
    translation only); when set they add per-sample rotation/zoom via
    the matmul-form warp (data.random_affine)."""

    def augment(batch, rng):
        images = batch["image"]
        if canvas and images.shape[-1] != canvas:
            images = data_lib.pad_to_canvas(images, canvas)
        if degrees or scale_jitter:
            rng, affine_rng = jax.random.split(rng)
            images = data_lib.random_affine(images, affine_rng,
                                            degrees, scale_jitter)
        if max_shift:
            images = data_lib.random_translate(images, rng, max_shift)
        return {**batch, "image": images}

    return augment


def make_center_pad_fn(canvas: int):
    @jax.jit
    def pad(batch):
        images = batch["image"]
        if canvas and images.shape[-1] != canvas:
            images = data_lib.pad_to_canvas(images, canvas)
        return {**batch, "image": images}

    return pad


class Trainer:
    def __init__(self, cfg: Dict):
        self.cfg = cfg
        self.model = factory.make_scae(dict(cfg["model"]))
        # a reconstruct-alternatives clone for visualization (same params)
        viz_model_cfg = dict(cfg["model"])
        viz_model_cfg["scae_params"] = dict(
            viz_model_cfg.get("scae_params") or {},
            reconstruct_alternatives=True)
        self.viz_model = factory.make_scae(viz_model_cfg)

        trainer_cfg = cfg["trainer"]
        mesh_cfg = trainer_cfg.get("mesh") or {}
        self.mesh = make_mesh(n_data=mesh_cfg.get("n_data"),
                              n_model=mesh_cfg.get("n_model", 1))

        self.batch_size = cfg["data_loader"]["batch_size"]
        # when set, the data (content + splits) is keyed independently
        # of the run seed — see data.load_datasets(split_seed=...)
        self.split_seed = cfg["data_loader"].get("split_seed")

        self.log_dir = trainer_cfg.get("log_dir", "./logs")
        # TB event files only from process 0 (JSONL writes are already
        # gated in the loop; the mirror would otherwise spawn one event
        # file per process)
        self.writer = MetricsWriter(self.log_dir,
                                    tensorboard=is_process_zero())
        # reference parity: Lightning's ModelCheckpoint(monitor=...)
        # (mnist/train.py:34-38); val_accuracy/max keeps the peak-
        # accuracy checkpoint that loss-monitored top-k would evict
        # (RESULTS.md: unsup accuracy peaks mid-run, then likelihood
        # keeps improving while accuracy degrades)
        self.monitor = trainer_cfg.get("monitor", "val_loss")
        self.monitor_mode = trainer_cfg.get("monitor_mode", "min")
        _top_k = trainer_cfg.get("save_top_k", 3)
        _ckpt_dir = trainer_cfg.get("checkpoint_dir", "./checkpoints")
        if _top_k <= 0:
            # sweep/probe runs judged on metrics alone: skip Orbax
            # entirely (async save churn costs seconds per eval)
            self.ckpt = NullCheckpointManager(_ckpt_dir)
        else:
            self.ckpt = CheckpointManager(
                _ckpt_dir, max_to_keep=_top_k,
                monitor=self.monitor, mode=self.monitor_mode)

        aug = trainer_cfg.get("augment") or {}
        model_hw = cfg["model"]["image_shape"][-1]
        _canvas = aug.get("canvas")
        self.canvas = model_hw if _canvas is None else _canvas
        if self.canvas != model_hw:
            raise ValueError(
                f"trainer.augment.canvas={self.canvas} but the model "
                f"consumes {model_hw}x{model_hw} images "
                "(model.image_shape); set canvas to null to derive it")
        self.max_shift = aug.get("max_shift", 0)
        self.aug_degrees = aug.get("degrees", 0.0) or 0.0
        self.aug_scale_jitter = aug.get("scale_jitter", 0.0) or 0.0
        self.center_pad = make_center_pad_fn(self.canvas)

        prof = trainer_cfg.get("profile") or {}
        self.profiler = Profiler(self.log_dir,
                                 start_step=prof.get("start_step", -1),
                                 n_steps=prof.get("n_steps", 3))

    def build_steps(self, steps_per_epoch: int):
        # idempotent per steps_per_epoch: the probe and the subsequent
        # full run share one set of jitted scans (one compile total)
        if getattr(self, "_built_spe", None) == steps_per_epoch:
            return
        self._built_spe = steps_per_epoch
        opt_cfg = self.cfg["optimizer"]
        la = self.cfg.get("lookahead") or {}
        self.tx = make_optimizer(
            name=opt_cfg["name"],
            learning_rate=opt_cfg["learning_rate"],
            batch_size=self.batch_size,
            momentum=opt_cfg.get("momentum", 0.9),
            use_lookahead=self.cfg.get("use_lookahead", False),
            lookahead_alpha=la.get("alpha", 0.5),
            lookahead_k=la.get("k", 6),
            lr_decay_rate=(self.cfg.get("lr_scheduler") or {})
            .get("decay_rate"),
            decay_steps=steps_per_epoch,
        )
        augment = make_augment_fn(self.canvas, self.max_shift,
                                  degrees=self.aug_degrees,
                                  scale_jitter=self.aug_scale_jitter)
        # K fused steps per dispatch (device-resident data, on-device
        # augmentation, scan over the log interval)
        self.train_scan = make_train_scan(self.model, self.tx,
                                          augment_fn=augment,
                                          mesh=self.mesh)
        self.eval_scan = make_eval_scan(self.model, canvas=self.canvas,
                                        mesh=self.mesh)

        # lr bookkeeping for the per-epoch log (base_experiment.py:98-104)
        lr0 = float(opt_cfg["learning_rate"])
        decay = (self.cfg.get("lr_scheduler") or {}).get("decay_rate")

        def lr_at(step: int) -> float:
            if not decay or decay == 1.0:
                return lr0
            return lr0 * decay ** (step // steps_per_epoch)

        self.lr_at = lr_at

    def init_state(self, seed: int) -> TrainState:
        example = {
            "image": jnp.zeros(
                (self.batch_size, self.cfg["model"]["image_shape"][0],
                 self.canvas, self.canvas), jnp.float32),
            "label": jnp.zeros((self.batch_size,), jnp.int32),
        }
        state = create_train_state(self.model, self.tx, example,
                                   jax.random.PRNGKey(seed))
        warm = self._warm_start_params(state.params)
        if warm is not None:
            state = state.replace(params=warm)
        return state

    def _patch_template_init(self, params, train_ds, seed: int):
        """Data-driven template init (`trainer.template_init=patches`):
        replace the QR-random template logits with M random content
        crops from the training images, so templates START as
        recognizable image fragments.

        Motivation (RESULTS.md): training must otherwise discover part
        structure from noise templates before the reconstruction term
        pays, which on small/padded data is a bimodal escape lottery.
        The reference's only init is QR noise (part_decoder.py:60-68).
        Inverse-maps crops through the configured template_nonlin
        (sigmoid -> logit; relu1 -> identity on [0,1])."""
        tree = params["template_generator"]
        shape = tree["template_logits"].shape      # (1, M, C, Ht, Wt)
        _, M, C, Ht, Wt = shape
        imgs = data_lib.to_nchw_float(train_ds.images)   # (N, C', H, W)
        N, Ci, H, W = imgs.shape
        if Ci != C or H < Ht or W < Wt:
            raise ValueError(
                f"template_init=patches: dataset images {imgs.shape[1:]} "
                f"cannot provide ({C},{Ht},{Wt}) template crops")
        rng = np.random.RandomState(seed)
        crops, tries = [], 0
        while len(crops) < M:
            i = rng.randint(N)
            y, x = rng.randint(H - Ht + 1), rng.randint(W - Wt + 1)
            c = imgs[i, :, y:y + Ht, x:x + Wt]
            # reject near-empty crops (background) unless we've been
            # unlucky too long (e.g. a sparse dataset)
            if c.mean() > 0.05 or tries > 50 * M:
                crops.append(c)
            tries += 1
        p = np.clip(np.stack(crops)[None], 0.01, 0.99).astype(np.float32)
        nonlin = self.model.template_generator.template_nonlin
        if nonlin == "sigmoid":
            logits = np.log(p / (1.0 - p))
        else:
            # relu1 is the identity on [0, 1]; other nonlins get the
            # raw crop values (documented best-effort)
            logits = p
        print(f"[scae_tpu] template_init=patches: {M} crops from "
              f"{N} train images (nonlin={nonlin})")
        return {**params,
                "template_generator": {**tree,
                                       "template_logits":
                                       jnp.asarray(logits)}}

    def _maybe_patch_templates(self, state, train_ds, seed: int):
        if (self.cfg.get("trainer") or {}).get("template_init") != \
                "patches" or self.cfg.get("init_from"):
            return state
        return state.replace(params=self._patch_template_init(
            state.params, train_ds, seed))

    def _warm_start_params(self, fresh_params):
        """Params from `init_from=<checkpoint_dir>` (warm start), or None.

        Transfer-learning analog of the reference notebook's
        resume_from_checkpoint (train.ipynb cell 9) for a NEW run:
        only the model parameters are taken — optimizer state, step,
        and RNG start fresh, and the new run's own seed still keys its
        data split and noise streams. Applies to every fresh init, so
        a seed probe (trainer.seed_probe) probes warm-started
        candidates. The source run's best checkpoint by its monitored
        metric is used (falling back to the latest)."""
        path = self.cfg.get("init_from")
        if not path:
            return None
        cached = getattr(self, "_warm_params", None)
        if cached is None:
            src = CheckpointManager(path, monitor=self.monitor,
                                    mode=self.monitor_mode)
            step = self.cfg.get("init_from_step")
            if step is None:
                # best by THIS run's monitor, but only if the source
                # actually recorded that metric — a source trained
                # under a different monitor ranks every checkpoint
                # equal-worst and best_step would silently return an
                # arbitrary one; fall back to the latest instead
                best = src.best_step
                if best is not None and self.monitor in (
                        src.metrics(best) or {}):
                    step = best
                else:
                    step = src.latest_step
            if step is None:
                raise FileNotFoundError(
                    f"init_from={path!r} contains no checkpoints")
            cached = src.restore_params(step=step)
            src.close()
            ref = jax.tree.map(lambda x: (x.shape, str(x.dtype)),
                               fresh_params)
            got = jax.tree.map(lambda x: (x.shape, str(x.dtype)), cached)
            if ref != got:
                raise ValueError(
                    f"init_from={path!r} step {step}: checkpoint "
                    "parameters do not match this model architecture "
                    "(tree structure / shapes / dtypes differ)")
            print(f"[scae_tpu] warm start: params from {path} "
                  f"step {step}")
            self._warm_params = cached
        return cached

    def _dataset_sizes(self):
        """Optional data_loader size overrides (synthetic fallback +
        val split) so demos/small runs can shrink the dataset from
        config (examples/train_resume_demo.py)."""
        dl = self.cfg["data_loader"]
        out = {}
        for key in ("val_size", "synthetic_train", "synthetic_test"):
            if dl.get(key) is not None:
                out[key] = int(dl[key])
        return out

    def _device_eval_data(self, dataset):
        """Eval split as (globally replicated) device arrays, cached for
        the most recent dataset object. Single slot, holding a strong
        reference: an id()-keyed dict would both pile up device copies
        across seed probes and alias a recycled object id onto a stale
        entry. Multi-host: every process holds the same split (derived
        from the shared seed), so replication is local."""
        cached = getattr(self, "_eval_data_cache", None)
        if cached is None or cached[0] is not dataset:
            rep = P()
            self._eval_data_cache = (dataset, {
                "image": make_global_array(dataset.images, self.mesh, rep),
                "label": make_global_array(
                    dataset.labels.astype(np.int32), self.mesh, rep),
            })
        return self._eval_data_cache[1]

    def evaluate(self, params, dataset, seed: int = 0,
                 max_batches: Optional[int] = None):
        """Mean loss terms over the eval split + host images for viz.

        Device-resident twin of the train path: the split lives on
        device, only (B,) index vectors cross the host boundary, and
        metrics stay on device until the pass ends (one sync per eval —
        decisive over a tunneled link, multi-host correct by
        construction).
        """
        data = self._device_eval_data(dataset)
        n_batches = len(dataset) // self.batch_size
        if max_batches is not None:
            n_batches = min(n_batches, max_batches)
        if n_batches:
            # one scan = one dispatch + one sync for the whole pass
            idxs = make_global_array(
                np.arange(n_batches * self.batch_size, dtype=np.int32)
                .reshape(n_batches, self.batch_size),
                self.mesh, P(None, DATA_AXIS))
            stacked = jax.device_get(self.eval_scan(params, data, idxs))
            means = {f"val_{k}": float(np.mean(v))
                     for k, v in stacked.items()}
        else:
            means = {}
        # viz inputs built host-side (no device round trip, works on any
        # process count); same center-pad treatment as the eval step
        viz = None
        if len(dataset) and n_batches:
            viz = np.asarray(jax.device_get(self.center_pad({
                "image": jnp.asarray(data_lib.to_nchw_float(
                    dataset.images[:8]))})["image"]))
        return means, viz

    def write_viz(self, step, params, images, max_n: int = 8):
        # alternatives (notably the B*O-tiled per-capsule decode) are heavy;
        # only the displayed images go through the viz forward
        images = np.asarray(images[:max_n])
        if jax.process_count() > 1:
            # local single-device forward on host-pulled replicated params:
            # grids are a process-0 side effect, not a collective
            params = jax.device_get(params)
        if not hasattr(self, "_viz_apply"):
            # grid tensors reduced ON DEVICE (viz_grid_tensors): pulling
            # the raw result pytree (>100 MB flagship) dominated epoch
            # wall time through the tunnel
            self._viz_apply = jax.jit(
                lambda p, x: viz_grid_tensors(
                    self.viz_model.apply({"params": p}, x),
                    n=min(max_n, x.shape[0])))
        viz = jax.device_get(self._viz_apply(params, images))
        write_reconstruction_grids(self.writer, step, viz,
                                   np.asarray(images), max_n=max_n)

    def run_test(self):
        """Evaluate the best/latest checkpoint on the test set.

        The reference's test path was broken (test_step stored the
        (loss, log) tuple and crashed on stacking, base_experiment.py:
        186-202, SURVEY.md §2.4(3)); this is the working equivalent —
        with the test split getting the same canvas treatment as
        train/val (fixing §2.4(8)).
        """
        cfg = self.cfg
        seed = cfg.get("seed", 42)
        # evaluate against the split the checkpoints were trained on
        # (a probe-selected run trained under the persisted winner,
        # not the config seed)
        rec = self._recorded_seed()
        if rec is not None:
            seed = rec
            print(f"[scae_tpu] test: recorded training seed {seed}")
        c, h, _ = cfg["model"]["image_shape"]
        train_ds, _, test_ds, source = data_lib.load_datasets(
            data_dir=cfg["data_loader"].get("data_dir"), seed=seed,
            image_size=min(h, 28 if c == 1 else h), n_channels=c,
            source=cfg["data_loader"].get("source"),
            tint=cfg["data_loader"].get("tint"),
            split_seed=self.split_seed,
            **self._dataset_sizes())
        steps_per_epoch = max(len(train_ds) // self.batch_size, 1)
        self.build_steps(steps_per_epoch)
        state = self.init_state(seed)
        assert self.ckpt.latest_step is not None, "no checkpoint to test"
        step = self.ckpt.best_step or self.ckpt.latest_step
        state = self.ckpt.restore(state, step=step)
        from scae_tpu.parallel.mesh import replicate_sharding

        state = jax.device_put(state, replicate_sharding(self.mesh))
        metrics, _ = self.evaluate(state.params, test_ds)
        metrics = {k.replace("val_", "test_"): v for k, v in metrics.items()}
        if jax.process_count() == 1:
            # per-class recall AND the headline test_accuracy over the
            # FULL split (remainder padded and trimmed) — evaluate()'s
            # scan floors to (n // B) * B batches, so its accuracy
            # (kept as test_accuracy_scan) misses up to B-1 examples.
            # Aggregate-only reporting hid an entire silent class
            # failure for three rounds (RESULTS.md round-4 class-8
            # diagnosis: recall 0.000 on one class across 14 runs while
            # overall accuracy looked healthy) — never again.
            if "test_accuracy" in metrics:
                metrics["test_accuracy_scan"] = metrics["test_accuracy"]
            metrics.update(self._per_class_recall(state.params, test_ds))
        self.writer.scalars(int(state.step), metrics)
        print(f"[scae_tpu] test @ ckpt {step} ({source}): "
              + ", ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items())
                          if k in ("test_loss", "test_accuracy",
                                   "test_rec_ll_loss")))
        recalls = [(k, v) for k, v in sorted(metrics.items())
                   if k.startswith("test_class")]
        if recalls:
            print("[scae_tpu] per-class recall: "
                  + ", ".join(f"{k.split('_')[-2][5:]}={v:.2f}"
                              for k, v in recalls))
        return metrics

    def _per_class_recall(self, params, test_ds):
        """test_class<k>_recall for the better head (the max(prior,
        posterior) accuracy convention, applied per head over the full
        split). Single-process only (grids-style side computation)."""
        model = self.model

        @jax.jit
        def _cls(params, images):
            res = model.apply({"params": params}, images,
                              deterministic=True)
            return res.prior_cls_prob, res.posterior_cls_prob

        images = self.center_pad({"image": jnp.asarray(
            data_lib.to_nchw_float(test_ds.images))})["image"]
        labels = np.asarray(test_ds.labels)
        n, B = len(labels), self.batch_size
        n_pad = (-n) % B
        images = jnp.pad(images, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
        pri, post = [], []
        for i in range(0, n + n_pad, B):
            p, q = _cls(params, images[i:i + B])
            pri.append(np.asarray(p))
            post.append(np.asarray(q))
        pri = np.concatenate(pri)[:n].argmax(-1)
        post = np.concatenate(post)[:n].argmax(-1)
        pred = post if np.mean(post == labels) >= np.mean(pri == labels) \
            else pri
        # the headline number, over ALL n examples: evaluate()'s scan
        # floors to (n // B) * B, silently dropping the remainder — 41
        # of 297 on the digits test split
        out = {"test_accuracy": float(np.mean(pred == labels))}
        for cls in np.unique(labels):
            m = labels == cls
            out[f"test_class{int(cls)}_recall"] = float(
                np.mean(pred[m] == cls))
        return out

    def _recorded_seed(self) -> Optional[int]:
        """The seed that trained the checkpoints in ckpt.directory
        (written by every run; probe_seed.json is the legacy name from
        when only probe-selected runs recorded it), or None."""
        for name in ("train_seed.json", "probe_seed.json"):
            path = os.path.join(self.ckpt.directory, name)
            if os.path.exists(path):
                with open(path) as f:
                    return int(json.load(f)["seed"])
        return None

    def probe_seeds(self, base_seed: int, n: int, probe_epochs: int):
        """Multi-restart selection: briefly train n candidate seeds and
        return (seed, state) of the lowest validation reconstruction
        NLL — the winner's probe training is continued, not replayed,
        so its probe_epochs count toward the full schedule.

        SCAE training on small data is bimodal — a seed either escapes
        the background-explains-everything optimum or it doesn't, and
        the two populations separate by ~20 nats of val_rec_ll within
        ~200 epochs (RESULTS.md, 6-seed study: escapees 1509-1513 vs
        stuck 1534-1536 at step 1800 on optdigits). One probe is a few
        scan dispatches (spans bounded at ~16k steps like the main
        loop), so n probes cost one extra compile plus n short runs.
        The seed also keys the data split, so each candidate probes
        its own split (as its full run would see) — unless
        `data_loader.split_seed` is set, in which case all candidates
        share one split and their scores compare without split noise.
        The probe score's predictive value is measured: it
        rank-predicts final accuracy (Spearman ~0.97 over 8 full runs,
        incl. a preregistered test).
        """
        cfg = self.cfg
        c, h, _ = cfg["model"]["image_shape"]
        results = []
        best_state = None
        built = False
        for s in range(base_seed, base_seed + n):
            train_ds, val_ds, _, _ = data_lib.load_datasets(
                data_dir=cfg["data_loader"].get("data_dir"), seed=s,
                image_size=min(h, 28 if c == 1 else h), n_channels=c,
                source=cfg["data_loader"].get("source"),
                tint=cfg["data_loader"].get("tint"),
                split_seed=self.split_seed,
                **self._dataset_sizes())
            spe = len(train_ds) // self.batch_size
            if spe <= 0:
                raise ValueError("dataset smaller than one batch")
            if not built:
                self.build_steps(spe)
                built = True
            state = self.init_state(s)
            state = self._maybe_patch_templates(state, train_ds, s)
            data = {
                "image": make_global_array(train_ds.images, self.mesh,
                                           P()),
                "label": make_global_array(
                    train_ds.labels.astype(np.int32), self.mesh, P()),
            }
            # bound one assembled stream to ~16k steps (a few MB of
            # indices), same discipline as the main loop
            max_span = max(1, -(-16384 // spe))
            e = 0
            while e < probe_epochs:
                span_end = min(probe_epochs, e + max_span)
                stream = np.concatenate([
                    np.random.RandomState(s + e2)
                    .permutation(len(train_ds))
                    [:spe * self.batch_size]
                    .reshape(spe, self.batch_size)
                    for e2 in range(e, span_end)], axis=0)
                idxs = make_global_array(stream.astype(np.int32),
                                         self.mesh, P(None, DATA_AXIS))
                state, _ = self.train_scan(state, data, idxs)
                e = span_end
            metrics, _ = self.evaluate(
                state.params, val_ds,
                max_batches=cfg["trainer"].get("max_eval_batches"))
            score = float(metrics.get("val_rec_ll_loss",
                                      metrics.get("val_loss",
                                                  float("inf"))))
            # a diverged probe (NaN) must lose outright: NaN compares
            # False everywhere, so min() could otherwise return it
            if not np.isfinite(score):
                score = float("inf")
            results.append((score, s))
            if (score, s) == min(results):
                best_state = state  # keep only the leader on device
            print(f"[scae_tpu] seed probe {s}: val_rec_ll={score:.2f} "
                  f"({probe_epochs} epochs)")
        best = min(results)[1]
        print(f"[scae_tpu] seed probe winner: {best} "
              f"(of {[s for _, s in results]})")
        return best, best_state

    def run(self, max_epochs: Optional[int] = None,
            max_steps: Optional[int] = None, resume: bool = False):
        cfg = self.cfg
        seed = cfg.get("seed", 42)
        trainer_cfg = cfg["trainer"]
        max_epochs = max_epochs or trainer_cfg.get("max_epochs", 1)
        log_every = trainer_cfg.get("log_every_steps", 50)

        probe = trainer_cfg.get("seed_probe") or {}
        n_probe = int(probe.get("n", 0) or 0)
        if resume and self.ckpt.latest_step is not None:
            # The training seed keys the data split, so a resume must
            # reuse the recorded one — re-splitting train/val under
            # restored params silently contaminates every eval
            rec = self._recorded_seed()
            if rec is not None:
                seed = rec
                print(f"[scae_tpu] resume: recorded training seed "
                      f"{seed}")
            elif n_probe > 0:
                raise FileNotFoundError(
                    "resume with trainer.seed_probe enabled, but the "
                    "checkpoint dir records no training seed — the "
                    "probe winner's data split cannot be recovered")
        probe_state = None
        if not (resume and self.ckpt.latest_step is not None):
            if n_probe > 0:
                seed, probe_state = self.probe_seeds(
                    seed, n_probe, int(probe.get("epochs", 200)))
            if is_process_zero():
                with open(os.path.join(self.ckpt.directory,
                                       "train_seed.json"), "w") as f:
                    json.dump({"seed": seed,
                               "split_seed": self.split_seed}, f)

        c, h, _ = cfg["model"]["image_shape"]
        train_ds, val_ds, test_ds, source = data_lib.load_datasets(
            data_dir=cfg["data_loader"].get("data_dir"),
            seed=seed,
            image_size=min(h, 28 if c == 1 else h),
            n_channels=c,
            source=cfg["data_loader"].get("source"),
            tint=cfg["data_loader"].get("tint"),
            split_seed=self.split_seed,
            **self._dataset_sizes())
        print(f"[scae_tpu] dataset source: {source} "
              f"(train={len(train_ds)}, val={len(val_ds)}, "
              f"test={len(test_ds)})")

        steps_per_epoch = len(train_ds) // self.batch_size
        self.build_steps(steps_per_epoch)
        if probe_state is not None:
            # the winner's probe training continues (same datasets and
            # deterministic index stream as a from-scratch run; its
            # probe epochs count toward max_epochs) instead of being
            # replayed from init
            state = probe_state
            print(f"[scae_tpu] continuing probe winner from step "
                  f"{int(state.step)}")
        else:
            state = self.init_state(seed)
            state = self._maybe_patch_templates(state, train_ds, seed)
        if resume and self.ckpt.latest_step is not None:
            state = self.ckpt.restore(state)
            print(f"[scae_tpu] resumed from step {int(state.step)}")
        if jax.process_count() > 1 or resume:
            # init/restore produce process-local single-device arrays;
            # re-place them as (globally) replicated mesh arrays or the
            # sharded train step sees incompatible devices. Multi-host:
            # every process inits identically from the shared seed, so
            # replication is purely local (no broadcast needed).
            if jax.process_count() > 1:
                state = jax.tree.map(
                    lambda x: make_global_array(jax.device_get(x),
                                                self.mesh, P()), state)
            else:
                state = jax.device_put(state,
                                       replicate_sharding(self.mesh))

        # dataset lives on device; per chunk only a (K, B) index array moves
        device_data = {
            "image": make_global_array(train_ds.images, self.mesh, P()),
            "label": make_global_array(train_ds.labels.astype(np.int32),
                                       self.mesh, P()),
        }

        t0 = time.time()
        global_step = int(state.step)
        stop = False

        # Double-buffered logging: chunk k+1 is dispatched BEFORE chunk
        # k's metrics are pulled to the host, so the device never idles
        # on the (tunneled) log round-trip. `pending` holds the
        # not-yet-synced chunk's device metrics.
        pending = None  # (step_after_chunk, device_metrics, k)

        def flush_pending():
            nonlocal pending, t0
            if pending is None:
                return
            p_step, p_metrics, p_k = pending
            pending = None
            # log the chunk's last step (means available in the stack);
            # this device_get is the only host sync in the hot loop
            host = jax.device_get(
                jax.tree.map(lambda m: m[-1], p_metrics))
            rate = p_k * self.batch_size / max(time.time() - t0, 1e-9)
            t0 = time.time()
            if is_process_zero():
                self.writer.scalars(p_step,
                                    {**host, "images_per_sec": rate,
                                     "learning_rate": self.lr_at(p_step)})

        # epoch and intra-epoch position derive from the restored step, so
        # a resumed run consumes exactly the indices a never-interrupted
        # run would (deterministic resume; perm seeded by absolute epoch).
        #
        # Chunks CROSS epoch boundaries: the index stream for a whole
        # eval period (eval_every_epochs worth of per-epoch permutations)
        # is assembled on the host and dispatched in log_every-step
        # scans. Clamping chunks to epochs made short-epoch runs
        # dispatch-bound over the tunneled link (the 9-step-epoch digits
        # runs paid 8,000 round trips for 72,000 steps); the stream is a
        # pure function of the absolute step either way, so resume
        # determinism and eval/ckpt cadence are unchanged.
        eval_every = trainer_cfg.get("eval_every_epochs", 1)
        if steps_per_epoch <= 0:
            raise ValueError(
                f"dataset ({len(train_ds)}) smaller than one batch "
                f"({self.batch_size}); nothing to train")
        # bound one assembled stream to ~16k steps (a few MB of indices)
        max_span = max(1, -(-16384 // steps_per_epoch))
        epoch = global_step // steps_per_epoch
        while epoch < max_epochs and not stop:
            period_end = min((epoch // eval_every + 1) * eval_every,
                             max_epochs, epoch + max_span)
            stream = np.concatenate([
                np.random.RandomState(seed + e).permutation(len(train_ds))
                [:steps_per_epoch * self.batch_size]
                .reshape(steps_per_epoch, self.batch_size)
                for e in range(epoch, period_end)], axis=0)
            stream = stream[global_step - epoch * steps_per_epoch:]
            n = stream.shape[0]
            if max_steps is not None:
                n = min(n, max(max_steps - global_step, 0))
                if n <= 0:
                    stop = True
            j = 0
            while j < n:
                profiling = self.profiler.maybe_start(global_step)
                # Merge a small remainder into one chunk (54 steps with
                # log_every=50 dispatches ONE 54-step scan, not 50+4):
                # a tiny trailing chunk pays the full dispatch round
                # trip for a few steps and halves the in-loop median
                # over a tunneled link.
                remaining = n - j
                k = remaining if remaining <= (log_every * 3) // 2 \
                    else log_every
                idxs = make_global_array(
                    stream[j:j + k].astype(np.int32),
                    self.mesh, P(None, DATA_AXIS))
                state, metrics = self.train_scan(state, device_data, idxs)
                j += k
                global_step += k
                flush_pending()  # sync chunk k-1 while chunk k computes
                pending = (global_step, metrics, k)
                if profiling:
                    # profiler brackets must not bleed into the next
                    # dispatch: sync this chunk before stopping the trace
                    flush_pending()
                    self.profiler.maybe_stop(global_step)
                if max_steps is not None and global_step >= max_steps:
                    stop = True
                    break
            flush_pending()  # period boundary: eval/ckpt need clean timing
            epoch = global_step // steps_per_epoch

            if (epoch % eval_every == 0 and epoch > 0) or stop \
                    or epoch >= max_epochs:
                val_metrics, viz_images = self.evaluate(
                    state.params, val_ds,
                    max_batches=trainer_cfg.get("max_eval_batches"))
                if is_process_zero():
                    # grids/scalars are process-0 side effects
                    self.writer.scalars(global_step, val_metrics)
                    if viz_images is not None:
                        self.write_viz(global_step, state.params,
                                       viz_images)
                # every process participates in the save (Orbax
                # coordinates multi-process writes internally; the
                # host tree is replicated so the primary writes it all)
                if self.monitor not in val_metrics:
                    # a typo'd monitor or an empty eval pass must not
                    # silently rank every checkpoint at a default score
                    raise KeyError(
                        f"trainer.monitor={self.monitor!r} not in eval "
                        f"metrics {sorted(val_metrics)} (empty means the "
                        "val split is smaller than one batch)")
                # state is passed lazily so the NullCheckpointManager
                # (save_top_k=0) never pulls the train state to host
                self.ckpt.save(
                    global_step, lambda: jax.device_get(state),
                    metrics={self.monitor: float(
                        val_metrics[self.monitor])})
                # keep images_per_sec clean: don't charge eval/ckpt wall
                # time to the next train chunk
                t0 = time.time()
            if stop:
                break

        self.ckpt.wait()
        if trainer_cfg.get("head_refit"):
            self.refit_head(train_ds, val_ds)
        return state

    def refit_head(self, train_ds, val_ds,
                   c_grid=(0.1, 1.0, 10.0, 100.0)):
        """End-of-run posterior-head refit on the frozen trunk
        (``trainer.head_refit=true``).

        The jointly-trained classifier head chronically under-trains the
        linear ceiling of its own features (RESULTS.md round 4: head
        mean 0.787 vs probe 0.869-0.899 on the SAME checkpoints — the
        head chases a moving representation at the shared lr, reference
        stacked_capsule_auto_encoder.py:203-213 semantics). This closes
        the gap in-loop: fit the SCAE paper's linear readout
        (multinomial logistic regression on mass_explained_by_capsule,
        fit on the train split, C selected on val) against the BEST
        retained checkpoint's frozen trunk, write it into that
        checkpoint's posterior head, re-evaluate val metrics, and save
        the result as a new checkpoint step ranked by its own metrics.
        ``mode=test``, serving export, and ensembling then read the
        refit head through zero new code paths. In-trainer twin of
        tools/probe_calibrate.py (which retrofits existing checkpoints).
        """
        if jax.process_count() > 1:
            print("[scae_tpu] head_refit: multi-process run — skipped "
                  "(run tools/probe_calibrate.py on the checkpoint)")
            return None
        best = self.ckpt.best_step or self.ckpt.latest_step
        if best is None:
            print("[scae_tpu] head_refit: no retained checkpoint "
                  "(trainer.save_top_k=0?) — skipped")
            return None
        from sklearn.linear_model import LogisticRegression

        params = jax.device_get(self.ckpt.restore_params(step=best))
        if "posterior_classifier" not in params:
            print("[scae_tpu] head_refit: model has no posterior "
                  "classifier — skipped")
            return None
        model = self.model
        h = self.cfg["model"]["image_shape"][1]

        @jax.jit
        def feats_scan(params, images, idxs):
            def body(_, ix):
                x = jnp.take(images, ix, axis=0)
                res = model.apply({"params": params}, x,
                                  deterministic=True)
                return None, jnp.sum(res.obj.posterior_mixing_prob,
                                     axis=-1)
            _, fs = jax.lax.scan(body, None, idxs)
            return fs

        def split_feats(ds):
            imgs = data_lib.pad_to_canvas(
                data_lib.to_nchw_float(ds.images), h)
            n, B = len(imgs), self.batch_size
            n_pad = (-n) % B
            imgs = np.pad(imgs, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
            idxs = np.arange(n + n_pad, dtype=np.int32).reshape(-1, B)
            fs = np.asarray(feats_scan(params, jnp.asarray(imgs),
                                       jnp.asarray(idxs)))
            return fs.reshape(-1, fs.shape[-1])[:n], np.asarray(ds.labels)

        Xtr, ytr = split_feats(train_ds)
        Xval, yval = split_feats(val_ds)
        best_fit = None
        for C in c_grid:
            clf = LogisticRegression(max_iter=5000, C=C).fit(Xtr, ytr)
            acc = float(np.mean(clf.predict(Xval) == yval))
            if best_fit is None or acc > best_fit[1]:
                best_fit = (clf, acc, C)
        clf, probe_val, c_star = best_fit

        head = dict(params["posterior_classifier"])
        kernel = np.asarray(clf.coef_.T, dtype=np.asarray(
            head["kernel"]).dtype)
        bias = np.asarray(clf.intercept_, dtype=np.asarray(
            head["bias"]).dtype)
        if kernel.shape != head["kernel"].shape:
            raise ValueError(f"head_refit: probe shape {kernel.shape} "
                             f"!= head {head['kernel'].shape}")
        head["kernel"], head["bias"] = kernel, bias
        new_params = {**params, "posterior_classifier": head}

        # full state at the refit step: trunk/optimizer/step from the
        # best checkpoint, params swapped — so resume/test restore a
        # complete, consistent tree
        template = self.init_state(self.cfg.get("seed", 42))
        state = self.ckpt.restore(template, step=best)
        state = state.replace(params=jax.tree.map(jnp.asarray, new_params))
        state = jax.device_put(state, replicate_sharding(self.mesh))
        vm, _ = self.evaluate(state.params, val_ds)
        if self.monitor not in vm:
            raise KeyError(f"head_refit: trainer.monitor={self.monitor!r}"
                           f" not in eval metrics {sorted(vm)}")
        # past the LATEST step, not best+1: Orbax silently refuses
        # non-monotonic saves, and the best checkpoint is usually not
        # the last one written
        refit_step = max(int(best), int(self.ckpt.latest_step or 0)) + 1
        if is_process_zero():
            self.writer.scalars(refit_step, vm)
        saved = self.ckpt.save(refit_step, lambda: jax.device_get(state),
                               metrics={self.monitor: float(vm[self.monitor])})
        self.ckpt.wait()
        if not saved:
            raise RuntimeError(
                f"head_refit: checkpoint manager refused save at step "
                f"{refit_step} (latest={self.ckpt.latest_step})")
        print(f"[scae_tpu] head_refit: C*={c_star} probe val "
              f"{probe_val:.4f}; refit ckpt {refit_step} "
              f"{self.monitor}={vm[self.monitor]:.4f} "
              f"(best was ckpt {best})")
        return vm
