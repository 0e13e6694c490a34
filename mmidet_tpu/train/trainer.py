"""Two-stream training driver: the TPU-native ``train_rgb_ir``.

Functional parity surface: reference ``train.py:476-943`` — model build,
dataloaders, optimizer groups + warmup + cosine, EMA, per-epoch eval with
fitness-driven best checkpointing, results logging, resume.  Differences by
design:
  * one jitted train step (fwd + aux + loss + grad + SGD + EMA) over a device
    mesh replaces the autocast/GradScaler/DDP loop;
  * augmentation is a second jitted program feeding the step (device
    resident), not cv2 worker processes;
  * checkpoints are orbax state pytrees (resume restores optimizer/EMA/epoch
    — fixing the reference's commented-out dual-stream resume,
    train.py:604-630);
  * no rank-conditional code: per-host data loading + GSPMD.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from mmidet_tpu.data.augment import AugmentHyp, make_batch_augment
from mmidet_tpu.data.datasets import PairedDataset, load_data_yaml
from mmidet_tpu.data.loader import MosaicLoader, PairedLoader
from mmidet_tpu.eval.evaluator import evaluate
from mmidet_tpu.eval.metrics import fitness
from mmidet_tpu.losses.detection import LossHyp
from mmidet_tpu.models.detector import TwoStreamDetector
from mmidet_tpu.models.spec import load_yolo_yaml
from mmidet_tpu.models.zoo import get_model_spec
from mmidet_tpu.train.checkpoint import (restore_checkpoint, save_checkpoint,
                                         strip_for_deploy)
from mmidet_tpu.train.optimizer import build_adam, build_optimizer
from mmidet_tpu.train.schedule import ScheduleConfig
from mmidet_tpu.train.step import init_state, make_train_step
from mmidet_tpu.utils.general import check_img_size, increment_path

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainConfig:
    model: str = "yolov5l_fuse3_fourier"   # zoo name or YAML path
    mesh: str = "auto"   # 'auto': shard training over all local devices
    #                      (('data','model') GSPMD mesh — the TPU-native
    #                      replacement for the reference's default
    #                      multi-GPU DataParallel/DDP, train.py:641-643,
    #                      683-686); 'off': single-device jit; 'on': force
    n_model: int = 1     # 'model' axis width: output-channel tensor
    #                      parallelism on wide kernels (parallel/mesh.py)
    tp_min_out: int = 256  # min out-channels for a kernel to shard on the
    #                        'model' axis (production TP gate)
    data: str = ""                         # dataset YAML path
    hyp: str | dict = ""                   # hyp YAML path or dict
    epochs: int = 100
    batch_size: int = 8
    img_size: int = 640
    max_labels: int = 120
    workdir: str = "runs/train/exp"
    adam: bool = False
    linear_lr: bool = False
    mosaic_prob: float = 1.0
    use_cem: bool = True
    aux_mode: str = "reference"
    dtype: str = "bfloat16"
    ema_decay: float = 0.9999
    eval_every: int = 1
    seed: int = 0
    resume: str = ""                        # checkpoint dir to resume from
    optimizer_groups: str = "fixed"         # 'fixed' | 'reference'
    autoanchor: bool = True                 # BPR check + kmeans refit
    use_wandb: bool = False
    warmup_floor: int = 1000                # reference's warmup iter floor
    nbs: int = 64            # nominal batch size (ref train.py:564): sets
    #                          gradient-accumulation steps round(nbs/batch)
    #                          and the weight-decay scale
    remat: str = ""                         # '' | 'dots' | 'full' (jax.checkpoint)
    weights: str = ""        # pretrained init: torch .pt | deploy bundle |
    #                          orbax variables dir (tolerant transfer)
    image_weights: bool = False  # resample train images by (1-mAP)^2 class
    #                              weights each epoch (ref train.py:715-727)
    single_cls: bool = False     # collapse all classes to one (ref --single-cls)
    multi_scale: bool = False    # random /32 img size in [0.5,1.5]x per batch
    #                              (ref train.py:778-783; one XLA compile per
    #                              size — slow first epoch over remote compile)
    multi_scale_buckets: int = 0  # opt-in: cap the random-size set to N
    #                               evenly spaced /gs sizes across [0.5,1.5]x
    #                               (bounds XLA compiles to N).  Default 0 =
    #                               the exact reference range (~21 sizes at
    #                               640/32, train.py:778-783)
    rect: bool = False           # aspect-bucketed train batches (disables
    #                              mosaic, as the reference does)
    fused_loop: bool = True      # pipelined hot loop: one jit program per
    #                              iteration (step N + augment N+1); False
    #                              forces the two-dispatch fallback (debug)
    notest: bool = False         # eval only on the final epoch
    nosave: bool = False         # checkpoint only on the final epoch
    save_period: int = -1        # extra checkpoint every N epochs
    exist_ok: bool = False       # reuse workdir without incrementing
    workers: int = 2             # loader prefetch depth (ref --workers)
    freeze: tuple = ()           # param-path substrings to freeze
    upload_dataset: bool = False  # version the dataset as an artifact
    #                               (ref --upload_dataset, wandb_utils.py)
    log_artifacts: bool = False  # version checkpoints as model artifacts
    artifact_alias: str = "latest"  # dataset artifact alias to pull
    #                                 (ref --artifact_alias)
    artifact_project: str = "mmidet_tpu"
    label_smoothing: float | None = None  # BCE target smoothing eps
    #                                       (ref --label-smoothing; None =
    #                                       use the hyp-file value)
    cache_images: bool = False   # RAM-cache decoded images after first
    #                              epoch (ref --cache-images)
    quad: bool = False           # groups of 4 -> one 2x-size sample
    #                              (ref --quad / collate_fn4)
    bucket: str = ""             # gsutil bucket for results upload
    #                              (ref --bucket, train.py:860-861)
    entity: str = ""             # W&B entity (ref --entity)
    bbox_interval: int = -1      # every N epochs, dump annotated val
    #                              images (+W&B media) (ref --bbox_interval)


DEFAULT_HYP = {
    "lr0": 0.01, "lrf": 0.2, "momentum": 0.937, "weight_decay": 0.0005,
    "warmup_epochs": 3.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1,
    "box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0, "obj_pw": 1.0,
    "iou_t": 0.20, "anchor_t": 4.0, "fl_gamma": 0.0,
    "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "degrees": 0.0,
    "translate": 0.1, "scale": 0.5, "shear": 0.0, "perspective": 0.0,
    "flipud": 0.0, "fliplr": 0.5, "mosaic": 1.0, "mixup": 0.0,
    "label_smoothing": 0.0,
}


def load_hyp(hyp) -> dict:
    if isinstance(hyp, dict):
        return {**DEFAULT_HYP, **hyp}
    if hyp and os.path.isfile(hyp):
        with open(hyp) as fh:
            return {**DEFAULT_HYP, **yaml.safe_load(fh)}
    return dict(DEFAULT_HYP)


def multi_scale_sizes(img_size: int, gs: int, buckets: int) -> np.ndarray:
    """Distinct /gs image sizes for --multi-scale across [0.5, 1.5]x
    img_size (ref train.py:778-783).  buckets>0 caps the set at that many
    evenly spaced sizes (each distinct size costs one XLA compile);
    buckets=0 yields the full reference range."""
    lo, hi = img_size // 2 // gs, img_size * 3 // 2 // gs
    if buckets > 0:
        return np.unique(np.round(
            np.linspace(lo, hi, buckets)).astype(int)) * gs
    return np.arange(lo, hi + 1) * gs


def _spec_from_cfg(cfg: TrainConfig, nc: int):
    if cfg.model.endswith((".yaml", ".yml")):
        return load_yolo_yaml(cfg.model, nc=nc)
    return get_model_spec(cfg.model, nc=nc)


def _anchors_grid(spec):
    a = np.asarray(spec.anchors, np.float32).reshape(spec.nl, spec.na, 2)
    s = np.asarray(spec.strides, np.float32)[:, None, None]
    return jnp.asarray(a / s)


def load_pretrained_variables(path: str, template_variables: dict,
                              spec=None) -> dict:
    """Load pretrained variables from a torch ``.pt``, a deploy bundle dir,
    or a bare orbax StandardCheckpointer dir (best-effort by format)."""
    if path.endswith((".pt", ".pth")):
        from mmidet_tpu.train.checkpoint import (convert_torch_state_dict,
                                                 load_torch_checkpoint)
        ref = os.environ.get("MMIDET_REFERENCE_REPO", "/root/reference")
        sd = load_torch_checkpoint(
            path, reference_repo=ref if os.path.isdir(ref) else None)
        # tolerant (ref intersect_dicts + strict=False, train.py:544-547):
        # a different-nc head or extra/missing modules keep template leaves
        return convert_torch_state_dict(template_variables, sd,
                                        strict=False)
    if os.path.isfile(os.path.join(path, "model.json")):
        from mmidet_tpu.deploy.export import load_deploy_bundle
        _, variables, _ = load_deploy_bundle(path)
        return variables
    import orbax.checkpoint as ocp
    try:  # a training run's ckpt dir (CheckpointManager layout): prefer EMA
        with ocp.CheckpointManager(os.path.abspath(path)) as mgr:
            step = mgr.latest_step()
            if step is not None:
                raw = mgr.restore(step, args=ocp.args.Composite(
                    state=ocp.args.StandardRestore()))["state"]
                ema = raw.get("ema") or {}
                return {"params": ema.get("params", raw.get("params")),
                        "batch_stats": ema.get("batch_stats",
                                               raw.get("batch_stats"))}
    except Exception:
        pass
    with ocp.StandardCheckpointer() as ckptr:  # bare variables dir
        return ckptr.restore(os.path.abspath(path))


def transfer_matching(template: dict, loaded: dict) -> tuple[dict, int, int]:
    """Shape-tolerant parameter transfer — the reference's intersect_dicts +
    strict=False load (train.py:544-547): copy every leaf whose path and
    shape match; keep the template elsewhere.  Returns (merged, n_copied,
    n_total)."""
    import flax
    tflat = flax.traverse_util.flatten_dict(template)
    lflat = flax.traverse_util.flatten_dict(loaded)
    copied = 0
    for k, v in tflat.items():
        src = lflat.get(k)
        if src is not None and tuple(np.shape(src)) == tuple(v.shape):
            tflat[k] = jnp.asarray(src, v.dtype)
            copied += 1
    return flax.traverse_util.unflatten_dict(tflat), copied, len(tflat)


def build_sched_and_loss(cfg: TrainConfig, hyp: dict,
                         steps_per_epoch: int):
    sched = ScheduleConfig(
        lr0=hyp["lr0"], lrf=hyp["lrf"], momentum=hyp["momentum"],
        warmup_epochs=hyp["warmup_epochs"],
        warmup_momentum=hyp["warmup_momentum"],
        warmup_bias_lr=hyp["warmup_bias_lr"], epochs=cfg.epochs,
        steps_per_epoch=steps_per_epoch, linear_lr=cfg.linear_lr,
        warmup_floor=cfg.warmup_floor)
    loss_hyp = LossHyp(
        box=hyp["box"], cls=hyp["cls"], cls_pw=hyp["cls_pw"],
        obj=hyp["obj"], obj_pw=hyp["obj_pw"], anchor_t=hyp["anchor_t"],
        fl_gamma=hyp["fl_gamma"],
        label_smoothing=hyp.get("label_smoothing", 0.0))
    return sched, loss_hyp


def assemble_step(cfg: TrainConfig, spec, model, variables, hyp: dict,
                  steps_per_epoch: int):
    """The production step assembly: optimizer groups + schedule + loss hyp
    + anchors + the fused train step.  Shared by ``train()`` and the
    driver's multichip dryrun (``__graft_entry__.dryrun_multichip``), so
    the dryrun validates the REAL trainer path rather than a copy.

    Returns (state, tx, step_core, sched)."""
    sched, loss_hyp = build_sched_and_loss(cfg, hyp, steps_per_epoch)
    build = build_adam if cfg.adam else build_optimizer
    tx, _ = build(variables["params"], sched, hyp["weight_decay"],
                  total_batch_size=cfg.batch_size, nbs=cfg.nbs,
                  groups=cfg.optimizer_groups, freeze=tuple(cfg.freeze))
    state = init_state(model, tx, jax.random.PRNGKey(cfg.seed), None, None,
                       variables=variables)
    anchors = _anchors_grid(spec)
    # NOTE: no donate_argnums on the state — state.ema aliases state.params
    # at init (and after pretrained transfer), and donating the same buffer
    # through two leaves is a runtime error; donation also measured
    # time-neutral on this model (PERF.md, 145.6 vs 146.4 ms).
    step_core = make_train_step(model, tx, anchors, loss_hyp,
                                ema_decay=cfg.ema_decay,
                                remat=cfg.remat or None)
    return state, tx, step_core, sched


def setup_mesh(cfg: TrainConfig, devices=None):
    """The production ('data','model') mesh (VERDICT r4 #1), or
    (None, None) when a single device is available or ``cfg.mesh='off'``.

    The 'data' axis width is clamped to the largest divisor of
    ``cfg.batch_size`` (the reference asserts batch % world_size == 0 for
    DDP, train.py:992-996; clamping keeps auto mode usable at any batch).
    Returns (mesh, batch_sharding)."""
    from mmidet_tpu.parallel.mesh import batch_sharding, make_mesh
    devices = list(jax.devices() if devices is None else devices)
    n_model = max(int(cfg.n_model), 1)
    if cfg.mesh == "off" or (len(devices) == 1 and n_model == 1):
        if n_model > 1 and cfg.mesh != "off":
            raise ValueError(f"n_model={n_model} needs >1 device")
        return None, None
    if n_model > len(devices):
        raise ValueError(f"n_model={n_model} > {len(devices)} devices")
    n_data = len(devices) // n_model
    while cfg.batch_size % n_data:
        n_data -= 1
    if n_data * n_model == 1:
        return None, None
    if n_data < len(devices) // n_model:
        logger.warning(
            "mesh: data axis clamped to %d (batch %d not divisible by %d)",
            n_data, cfg.batch_size, len(devices) // n_model)
    mesh = make_mesh(n_data=n_data, n_model=n_model, devices=devices)
    logger.info("mesh: data=%d x model=%d over %d devices", n_data,
                n_model, len(devices))
    return mesh, batch_sharding(mesh)


def train(cfg: TrainConfig) -> dict:
    """Run training; returns summary dict with best fitness and workdir."""
    hyp = load_hyp(cfg.hyp)
    # resume semantics (ref --resume, train.py:1000-1010): a previous RUN
    # dir (contains ckpt/) continues in place; a bare checkpoint dir seeds
    # a fresh workdir; any other truthy value ("latest"/True) reuses
    # cfg.workdir as-is and continues from its own ckpt dir.
    from mmidet_tpu.utils.artifacts import (default_backend,
                                            is_artifact_path,
                                            resume_from_artifact)
    art_backend = None
    if cfg.upload_dataset or cfg.log_artifacts or \
            is_artifact_path(cfg.resume):
        art_backend = default_backend(project=cfg.artifact_project)
    resume_src = None
    r = cfg.resume if isinstance(cfg.resume, str) else ""
    if r in ("latest", "true", "True") or cfg.resume is True:
        # bare --resume: continue the most recent run under the project
        # dir (ref get_latest_run, train.py:1000-1002)
        from mmidet_tpu.utils.general import get_latest_run
        r = get_latest_run(os.path.dirname(cfg.workdir) or ".")
        if not r:
            raise FileNotFoundError(
                f"--resume latest: no previous run with a ckpt/ under "
                f"{os.path.dirname(cfg.workdir) or '.'}")
        logger.info("resuming latest run %s", r)
        cfg = dataclasses.replace(cfg, resume=r)
    if is_artifact_path(r):
        # wandb-artifact://<project>/<run_id> resume (ref
        # check_wandb_resume + download_model_artifact,
        # wandb_utils.py:42-53,168-177): pull the checkpoint artifact and
        # continue in a fresh workdir with the stored run config's epochs
        r, art_meta = resume_from_artifact(r, art_backend)
        stored = art_meta.get("opt") or {}
        if stored.get("epochs"):
            cfg = dataclasses.replace(cfg, epochs=int(stored["epochs"]))
        if stored.get("hyp"):
            cfg = dataclasses.replace(cfg, hyp=stored["hyp"])
            hyp = load_hyp(cfg.hyp)
        cfg = dataclasses.replace(cfg, resume=r)
    if cfg.resume and os.path.isdir(os.path.join(r, "ckpt")):
        workdir = r
        resume_src = os.path.join(r, "ckpt")
        # in-place resume adopts the stored run config for every field
        # that determines the TRAIN-STATE STRUCTURE (the reference
        # re-reads opt.yaml and replaces opt wholesale, train.py:1004-1008
        # — we keep the caller's schedule fields so `--resume --epochs N`
        # can extend a run, a deliberate improvement): otherwise e.g.
        # resuming an --adam run with default flags builds an SGD
        # opt_state and the checkpoint restore structure-mismatches
        opt_path = os.path.join(r, "opt.yaml")
        if os.path.isfile(opt_path):
            with open(opt_path) as fh:
                stored = yaml.safe_load(fh) or {}
            keep = {k: stored[k] for k in
                    ("model", "adam", "optimizer_groups", "nbs",
                     "batch_size", "use_cem", "aux_mode", "dtype",
                     "single_cls") if k in stored}
            if isinstance(stored.get("freeze"), list):
                keep["freeze"] = tuple(stored["freeze"])
            cfg = dataclasses.replace(cfg, **keep)
            hyp_path = os.path.join(r, "hyp.yaml")
            if os.path.isfile(hyp_path):
                cfg = dataclasses.replace(cfg, hyp=hyp_path)
            hyp = load_hyp(cfg.hyp)
    elif cfg.resume and os.path.isdir(r):
        workdir = increment_path(cfg.workdir, cfg.exist_ok)
        resume_src = r
    elif cfg.resume:
        workdir = cfg.workdir
    else:
        workdir = increment_path(cfg.workdir, cfg.exist_ok)
    if cfg.label_smoothing is not None:  # CLI override (ref opt-level flag)
        hyp["label_smoothing"] = float(cfg.label_smoothing)
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "hyp.yaml"), "w") as fh:
        yaml.safe_dump(hyp, fh)
    with open(os.path.join(workdir, "opt.yaml"), "w") as fh:
        yaml.safe_dump(dataclasses.asdict(cfg), fh)

    data = load_data_yaml(cfg.data)
    if cfg.upload_dataset:
        # version the dataset + rewrite paths to artifact references (ref
        # check_and_upload_dataset, wandb_utils.py:116-124); the rewritten
        # yaml lands in the run dir as *_wandb.yaml does in the reference
        from mmidet_tpu.utils.artifacts import log_dataset_artifact
        data = log_dataset_artifact(
            data, art_backend, project=cfg.artifact_project,
            out_yaml=os.path.join(workdir, "data_wandb.yaml"))
    if any(is_artifact_path(data.get(k)) for k in
           ("train_rgb", "train_ir", "val_rgb", "val_ir")):
        from mmidet_tpu.utils.artifacts import resolve_data_artifacts
        data = resolve_data_artifacts(
            data, art_backend or default_backend(cfg.artifact_project),
            alias=cfg.artifact_alias)
    nc = 1 if cfg.single_cls else int(data["nc"])
    names = ["item"] if cfg.single_cls else \
        data.get("names", [str(i) for i in range(nc)])
    img_size = check_img_size(cfg.img_size)

    spec = _spec_from_cfg(cfg, nc)
    dtype = getattr(jnp, cfg.dtype)

    train_ds = PairedDataset(data["train_rgb"], data["train_ir"],
                             nc=None if cfg.single_cls else nc,
                             cache_dir=workdir,
                             cache_images=cfg.cache_images)
    if cfg.single_cls:  # ref --single-cls: all labels -> class 0
        for lab in train_ds.labels:
            if len(lab):
                lab[:, 0] = 0.0

    # pre-training anchor fit check (reference train.py:678-679)
    if cfg.autoanchor:
        from mmidet_tpu.utils.autoanchor import check_anchors
        import dataclasses as _dc
        shapes = [train_ds[i]["shape"] for i in
                  range(min(len(train_ds), 512))]
        labels = train_ds.labels[:len(shapes)]
        new_anchors = check_anchors(labels, shapes,
                                    np.asarray(spec.anchors, np.float64),
                                    spec.strides, img_size)
        flat = tuple(tuple(int(round(v)) for v in lvl.reshape(-1))
                     for lvl in new_anchors)
        if flat != spec.anchors:
            logger.info("autoanchor updated anchors: %s", flat)
            spec = _dc.replace(spec, anchors=flat)

    from mmidet_tpu.models.spec import is_two_stream
    two_stream = is_two_stream(spec)
    # single-stream models (reference models/yolo.py, trained by the legacy
    # train() driver, train.py:45-473) carry no CEM and no fusion aux losses
    use_cem = cfg.use_cem and two_stream
    aux_mode = cfg.aux_mode if two_stream else "off"
    model = TwoStreamDetector(spec=spec, use_cem=use_cem,
                              aux_mode=aux_mode, dtype=dtype)
    # per-epoch eval runs the fused Pallas token-transformer kernel on TPU
    # (same param tree; 14x on the d>=512 fusion levels — PERF.md)
    eval_model = dataclasses.replace(
        model, pallas_fusion=jax.devices()[0].platform == "tpu")
    val_ds = PairedDataset(data["val_rgb"], data["val_ir"],
                           nc=None if cfg.single_cls else nc,
                           cache_dir=workdir)
    if cfg.single_cls:
        for lab in val_ds.labels:
            if len(lab):
                lab[:, 0] = 0.0
    # rect disables mosaic, exactly as the reference
    # (datasets.py: mosaic = augment and not rect)
    use_mosaic = (hyp.get("mosaic", 1.0) > 0 and cfg.mosaic_prob > 0
                  and not cfg.rect)
    if use_mosaic:
        loader = MosaicLoader(train_ds, cfg.batch_size, img_size,
                              seed=cfg.seed, prefetch=cfg.workers)
    elif cfg.rect:
        from mmidet_tpu.data.loader import RectLoader
        # train-rect uses pad=0.0 (the reference passes pad=0.5 only for
        # eval, train.py:651 vs test.py:93) and the model's max stride so
        # P6 (stride-64) shapes stay FPN-consistent
        loader = RectLoader(train_ds, cfg.batch_size, img_size,
                            cfg.max_labels,
                            stride=int(max(spec.strides)), pad=0.0,
                            scaleup=True)  # train letterbox scales up
    else:
        loader = PairedLoader(train_ds, cfg.batch_size, img_size,
                              cfg.max_labels, shuffle=True, seed=cfg.seed,
                              prefetch=cfg.workers)
    # val: scaleup=False, the reference's test-time letterbox behavior
    val_loader_fn = lambda: PairedLoader(val_ds, cfg.batch_size, img_size,
                                         cfg.max_labels, drop_last=False,
                                         prefetch=cfg.workers,
                                         scaleup=False)
    steps_per_epoch = max(len(loader), 1)

    aug_hyp = AugmentHyp(
        hsv_h=hyp["hsv_h"], hsv_s=hyp["hsv_s"], hsv_v=hyp["hsv_v"],
        degrees=hyp["degrees"], translate=hyp["translate"],
        scale=hyp["scale"], shear=hyp["shear"],
        perspective=hyp["perspective"], flipud=hyp["flipud"],
        fliplr=hyp["fliplr"], mosaic=hyp["mosaic"])
    augment_core = make_batch_augment(img_size, aug_hyp, cfg.max_labels,
                                      mosaic=use_mosaic)
    augment = jax.jit(augment_core)
    quad_fn = None
    if cfg.quad:
        from mmidet_tpu.data.augment import quad_batch
        if cfg.batch_size % 4:
            raise ValueError("--quad needs --batch-size divisible by 4")
        quad_fn = jax.jit(quad_batch)

    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(cfg.seed)}, small,
                           small, train=False)
    state, tx, step_core, sched = assemble_step(cfg, spec, model, variables,
                                                hyp, steps_per_epoch)
    if cfg.weights:  # pretrained init (ref --weights + intersect_dicts)
        loaded = load_pretrained_variables(cfg.weights,
                                           {"params": state.params,
                                            "batch_stats": state.batch_stats})
        merged, n_cp, n_tot = transfer_matching(
            {"params": state.params, "batch_stats": state.batch_stats},
            loaded)
        logger.info("transferred %d/%d items from %s", n_cp, n_tot,
                    cfg.weights)
        state = dataclasses.replace(
            state, params=merged["params"],
            batch_stats=merged["batch_stats"],
            ema={**state.ema, "params": merged["params"],
                 "batch_stats": merged["batch_stats"]})
    # --- production multi-chip placement (VERDICT r4 #1): shard the state
    # over the ('data','model') mesh; batches shard below; gradient psum is
    # implicit under GSPMD.  Replaces the reference's DataParallel/DDP
    # default multi-GPU modes (train.py:641-643,683-686).
    mesh, bsh = setup_mesh(cfg)
    if mesh is not None:
        from mmidet_tpu.parallel.mesh import shard_train_state
        state = shard_train_state(state, mesh, tp_min_out=cfg.tp_min_out)
    step_fn = jax.jit(step_core)

    def _to_dev(arrs: dict) -> dict:
        """Batch arrays -> device; batch dim sharded over 'data' when the
        mesh is up (ragged batches keep default placement — their shapes
        already force a separate compile)."""
        out = {}
        for k, v in arrs.items():
            v = np.asarray(v)
            if bsh is not None and v.shape[0] % mesh.shape["data"] == 0:
                out[k] = jax.device_put(v, bsh)
            else:
                out[k] = jnp.asarray(v)
        return out

    # Pipelined hot loop (VERDICT r3 #5): when no per-batch host-side
    # transform is needed (no quad regroup, no multi-scale resize), each
    # iteration dispatches ONE jit program that runs train-step N and
    # augmentation N+1 — data-independent subgraphs XLA can interleave
    # (measured: 24.1 ms aug + 35.0 ms step serialized vs one fused
    # program, tools/train_bench.py) — and accumulates the loss means on
    # device, so the host reads ONE (3,) array per epoch instead of three
    # floats per step.
    # rect training excluded: its per-batch shapes would make the fused
    # program retrace per (shape_N, shape_N+1) PAIR — quadratic compiles
    use_fused = (cfg.fused_loop and quad_fn is None
                 and not cfg.multi_scale and not cfg.rect)

    def _prep(raw):
        return {k: (v.astype(jnp.float32) / 255.0
                    if k in ("rgb", "ir", "rgb4", "ir4") else v)
                for k, v in raw.items()}

    if use_fused:
        augment_prep = jax.jit(lambda raw, k: augment_core(_prep(raw), k))

        @jax.jit
        def fused_fn(state, cur, raw_next, k_step, k_aug, loss_acc):
            state, metrics = step_core(state, cur, k_step)
            nxt = augment_core(_prep(raw_next), k_aug)
            # float32 device accumulation (f64 needs jax_enable_x64, which
            # TPU lacks): logged epoch-mean loss can differ from the
            # fallback loop's host-side f64 sum in the last ulps — LOGGING
            # ONLY; params/EMA/opt_state stay bit-equivalent (pinned by
            # test_fused_loop_matches_fallback)
            loss_acc = loss_acc + jnp.stack(
                [metrics["box"], metrics["obj"],
                 metrics["cls"]]).astype(jnp.float32)
            return state, nxt, loss_acc

    start_epoch, best_fit = 0, -1.0
    ckpt_dir = os.path.join(workdir, "ckpt")
    if cfg.resume:
        src = resume_src or ckpt_dir
        try:
            state, step, meta = restore_checkpoint(src, state)
            if meta:
                start_epoch = int(meta.get("epoch", -1)) + 1
                best_fit = float(meta.get("best_fitness", -1.0))
            if mesh is not None:
                # orbax restores arrays committed to device 0; re-place
                # the whole state on the mesh (jit rejects mixed commits)
                from mmidet_tpu.parallel.mesh import shard_train_state
                state = shard_train_state(state, mesh,
                                          tp_min_out=cfg.tp_min_out)
            logger.info("resumed from %s at epoch %d", src, start_epoch)
        except FileNotFoundError:
            logger.warning("no checkpoint to resume under %s", src)

    rng = jax.random.PRNGKey(cfg.seed + 1)
    results_path = os.path.join(workdir, "results.txt")
    from mmidet_tpu.utils.logger import MetricLogger
    mlog = MetricLogger(workdir, use_wandb=cfg.use_wandb,
                        run_name=os.path.basename(workdir),
                        config=dataclasses.asdict(cfg),
                        entity=cfg.entity or None)
    try:
        from mmidet_tpu.utils.plots import plot_labels
        plot_labels(train_ds.labels, nc, workdir)
    except Exception:
        pass
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info("model %s: %.2fM params, %d classes, %d train imgs, "
                "%d epochs x %d steps", cfg.model, n_params / 1e6, nc,
                len(train_ds), cfg.epochs, steps_per_epoch)

    plotted_batches = 0
    ms_rng = np.random.default_rng(cfg.seed + 2)
    maps = np.zeros(nc)  # per-class mAP from the latest eval
    gs = int(max(spec.strides))
    if cfg.multi_scale:
        ms_sizes = multi_scale_sizes(img_size, gs, cfg.multi_scale_buckets)
        logger.info("multi-scale: %d sizes %s (one XLA compile each, "
                    "cached after the first epoch)",
                    len(ms_sizes), ms_sizes.tolist())
    from mmidet_tpu.nn.resize import bilinear_resize
    _ms_resize = jax.jit(bilinear_resize, static_argnums=1)
    def _plot_batch(jb):
        nonlocal plotted_batches
        if plotted_batches >= 3:  # first train batches w/ boxes
            return                # (ref train.py:816-817, plots.py:128)
        try:
            from mmidet_tpu.utils.plots import plot_images
            plot_images(np.asarray(jb["rgb"]), np.asarray(jb["targets"]),
                        np.asarray(jb["mask"]),
                        os.path.join(workdir,
                                     f"train_batch{plotted_batches}.jpg"),
                        names=names)
        except Exception:
            pass
        plotted_batches += 1

    res = None  # survives an already-finished resume (empty epoch range)
    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        mloss = np.zeros(3)
        nb = 0
        if use_fused:
            # pipelined: fused_fn runs step N and augments batch N+1 in one
            # program; the first batch is augmented standalone (prologue),
            # the last is stepped standalone (epilogue).  Per-batch PRNG
            # keys are drawn exactly as in the fallback loop.
            loss_acc = jnp.zeros(3, jnp.float32)
            cur, k_step_cur = None, None
            for batch in loader:
                rng, k_aug, k_step = jax.random.split(rng, 3)
                raw = _to_dev({k: v for k, v in batch.items()
                               if k not in ("shapes", "files")})
                if cur is None:
                    cur = augment_prep(raw, k_aug)
                else:
                    state, cur, loss_acc = fused_fn(
                        state, cur, raw, k_step_cur, k_aug, loss_acc)
                    nb += 1
                k_step_cur = k_step
                _plot_batch(cur)
            if cur is not None:
                state, metrics = step_fn(state, cur, k_step_cur)
                loss_acc = loss_acc + jnp.stack(
                    [metrics["box"], metrics["obj"],
                     metrics["cls"]]).astype(jnp.float32)
                nb += 1
            mloss = np.asarray(loss_acc, np.float64)
        else:
            for batch in loader:
                rng, k_aug, k_step = jax.random.split(rng, 3)
                jb = _to_dev({k: v for k, v in batch.items()
                              if k not in ("shapes", "files")})
                jb = augment(_prep(jb), k_aug)
                if quad_fn is not None:
                    rng, k_q = jax.random.split(rng)
                    jb = quad_fn(jb["rgb"], jb["ir"], jb["targets"],
                                 jb["mask"], k_q)
                if cfg.multi_scale:
                    # ref train.py:778-783: random /gs size in [0.5, 1.5]x,
                    # bilinear batch resize; labels normalized -> unchanged.
                    # Each distinct size is one extra XLA compile (cached);
                    # the size set is bucketed (multi_scale_sizes above).
                    sz = int(ms_rng.choice(ms_sizes))
                    if sz != jb["rgb"].shape[1]:
                        jb["rgb"] = _ms_resize(jb["rgb"], (sz, sz))
                        jb["ir"] = _ms_resize(jb["ir"], (sz, sz))
                _plot_batch(jb)
                state, metrics = step_fn(state, jb, k_step)
                mloss += np.asarray([float(metrics["box"]),
                                     float(metrics["obj"]),
                                     float(metrics["cls"])])
                nb += 1
        mloss /= max(nb, 1)

        def _log_model_art(ep: int, fit_val: float, best: bool) -> None:
            # checkpoint -> model artifact with metadata + aliases (ref
            # log_model, wandb_utils.py:181-191), run_id = run dir name
            if not (cfg.log_artifacts and art_backend is not None):
                return
            from mmidet_tpu.utils.artifacts import log_model_artifact
            try:
                log_model_artifact(
                    art_backend, os.path.basename(workdir), ckpt_dir, ep,
                    cfg.epochs, fit_val, best=best,
                    project=cfg.artifact_project,
                    opt={"epochs": cfg.epochs, "model": cfg.model,
                         "hyp": hyp, "batch_size": cfg.batch_size,
                         "img_size": cfg.img_size})
            except Exception:
                logger.exception("model artifact logging failed")

        res = None
        saved_this_epoch = False
        final = epoch == cfg.epochs - 1
        do_eval = (((epoch + 1) % cfg.eval_every == 0 or final)
                   and (not cfg.notest or final))
        if do_eval:
            ema_vars = {"params": state.ema["params"],
                        "batch_stats": state.ema["batch_stats"]}
            # per-epoch val-prediction dump -> "progress" evaluation
            # artifact (ref log_training_progress + end_epoch result
            # artifact, wandb_utils.py:265-306)
            pred_json = os.path.join(workdir, "val_predictions.json") \
                if (cfg.log_artifacts and art_backend is not None) else None
            media_dir = None
            if cfg.bbox_interval > 0 and \
                    ((epoch + 1) % cfg.bbox_interval == 0 or final):
                media_dir = os.path.join(workdir, "media", f"epoch{epoch}")
            res = evaluate(eval_model, ema_vars, val_loader_fn(), nc,
                           names=names, save_json=pred_json,
                           media_dir=media_dir)
            if media_dir is not None and os.path.isdir(media_dir):
                import glob as _glob
                mlog.log_media_files(
                    epoch, "val/bbox",
                    sorted(_glob.glob(os.path.join(media_dir, "*.jpg"))))
            fit = float(fitness(res.fitness_vector())[0])
            is_best = fit > best_fit
            if is_best:
                best_fit = fit
            if not cfg.nosave or final:
                save_checkpoint(ckpt_dir, state, epoch,
                                metadata={"epoch": epoch,
                                          "best_fitness": best_fit,
                                          "fitness": fit})
                saved_this_epoch = True
                _log_model_art(epoch, fit, is_best)
            if pred_json and os.path.isfile(pred_json):
                try:
                    art_backend.log_artifact(
                        f"run_{os.path.basename(workdir)}_progress",
                        "evaluation", {"val_predictions.json": pred_json},
                        metadata={"epoch": epoch, "mAP50": res.map50},
                        aliases=("latest", f"epoch {epoch + 1}",
                                 "best" if is_best else ""),
                        project=cfg.artifact_project)
                except Exception:
                    logger.exception("progress artifact logging failed")
            if is_best and not cfg.nosave:
                # the reference keeps best.pt whenever fi == best_fitness
                # (train.py:893-894); the rolling keep=3 last-checkpoints
                # would otherwise garbage-collect the best epoch
                save_checkpoint(os.path.join(workdir, "ckpt_best"), state,
                                epoch, metadata={"epoch": epoch,
                                                 "best_fitness": best_fit,
                                                 "fitness": fit}, keep=1)
            # unevaluated classes default to the MEAN mAP, as the
            # reference (maps = np.zeros(nc) + map, test.py:305) — zero
            # would maximally oversample absent classes via (1-maps)^2
            maps[:] = res.map
            for i, nm in enumerate(names):
                maps[i] = res.per_class.get(nm, {}).get("ap", res.map)
            with open(results_path, "a") as fh:
                fh.write(
                    f"{epoch}/{cfg.epochs - 1} "
                    f"box {mloss[0]:.4f} obj {mloss[1]:.4f} "
                    f"cls {mloss[2]:.4f} P {res.mp:.4f} R {res.mr:.4f} "
                    f"mAP50 {res.map50:.4f} mAP {res.map:.4f}\n")
            if cfg.bucket:  # per-epoch results upload (ref train.py:860-861)
                from mmidet_tpu.utils.general import gsutil_upload
                gsutil_upload(cfg.bucket, results_path)
            mlog.log_metrics(epoch, {
                "train/box": mloss[0], "train/obj": mloss[1],
                "train/cls": mloss[2], "val/P": res.mp, "val/R": res.mr,
                "val/mAP50": res.map50, "val/mAP": res.map,
                "fitness": fit})
            logger.info(
                "epoch %d/%d loss(box/obj/cls) %.4f/%.4f/%.4f "
                "mAP50 %.4f mAP %.4f fit %.4f (%.1fs)", epoch,
                cfg.epochs - 1, *mloss, res.map50, res.map, fit,
                time.time() - t0)
        if cfg.save_period > 0 and (epoch + 1) % cfg.save_period == 0 \
                and not saved_this_epoch:
            # periodic save is independent of eval/nosave (ref save_period)
            save_checkpoint(ckpt_dir, state, epoch,
                            metadata={"epoch": epoch,
                                      "best_fitness": best_fit})
            _log_model_art(epoch, best_fit, False)
        if cfg.image_weights and not final:
            # EVERY epoch, as the reference (train.py:715-727):
            # cw = class_weights*(1-maps)^2 with the latest eval's maps;
            # resample next epoch's indices ~ image weights
            from mmidet_tpu.utils.general import (labels_to_class_weights,
                                                  labels_to_image_weights)
            cw = labels_to_class_weights(train_ds.labels, nc)
            iw = labels_to_image_weights(train_ds.labels, nc,
                                         cw * (1 - maps) ** 2)
            if hasattr(loader, "set_image_weights") and iw.sum() > 0:
                loader.set_image_weights(iw)

    mlog.close()
    try:
        from mmidet_tpu.utils.plots import plot_results
        plot_results(results_path)
    except Exception:
        pass
    # deploy weights come from the BEST checkpoint when one was kept (the
    # reference strips best.pt for distribution, general.py:584-598)
    deploy_state = state
    best_dir = os.path.join(workdir, "ckpt_best")
    if os.path.isdir(best_dir):
        try:
            deploy_state, _, _ = restore_checkpoint(best_dir, state)
        except Exception:
            pass
    deploy = strip_for_deploy(deploy_state)
    return {"workdir": workdir, "best_fitness": best_fit,
            "deploy": deploy, "state": state,
            "last_results": res, "nc": nc, "names": names, "spec": spec}
