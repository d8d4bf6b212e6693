"""Training loop: optax + pjit over an ICI mesh + orbax checkpoints.

Functional counterpart of the reference ``OpenProvenceTrainer`` (an HF
Trainer subclass, open_provence/trainer.py:404-588) redesigned TPU-first:

* one jitted ``train_step`` (forward + backward + adafactor update) with the
  pair dimension sharded over the mesh ``data`` axis — XLA inserts the psum
  gradient all-reduce (the reference is single-GPU; SURVEY §2.4),
* bf16 compute with fp32 master params (the reference trains bf16 autocast,
  trainer.py:387),
* optax adafactor + warmup-cosine schedule + global-norm clipping
  (defaults from PruningTrainingArguments, trainer.py:365-394),
* loss-component accumulation and eval_* metrics (trainer.py:488-588),
* orbax ``checkpoint-N`` directories + best-model tracking on eval_loss +
  resume resolution (trainer.py:58-101, 1365-1368),
* every checkpoint also writes the self-describing HF-layout export
  (config.json + model.safetensors) like the reference's ``_save``
  (trainer.py:415-461).
"""

from __future__ import annotations

import json
import logging
import math
import re
import shutil
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Iterator, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import OpenProvenceConfig
from ..models.model import OpenProvenceModule
from ..parallel.mesh import batch_sharding, batch_sharding_2d, create_mesh, replicated
from .losses import joint_loss

logger = logging.getLogger(__name__)

_CHECKPOINT_DIR_PATTERN = re.compile(r"checkpoint-(\d+)$")


@dataclass
class ResolvedCheckpoint:
    checkpoint_dir: Path
    run_dir: Path
    steps: int | None = None


def resolve_resume_checkpoint_path(candidate_path: str | Path) -> ResolvedCheckpoint:
    """Accept either a checkpoint-N dir or its parent run dir
    (reference trainer.py:58-101); validity marker is trainer_state.json."""
    path = Path(candidate_path).expanduser().resolve()
    if not path.exists():
        raise FileNotFoundError(f"Checkpoint path '{path}' does not exist")
    if path.is_file():
        raise ValueError(
            f"Checkpoint path '{path}' is a file. Please point to a checkpoint directory."
        )
    trainer_state = path / "trainer_state.json"
    if trainer_state.exists():
        match = _CHECKPOINT_DIR_PATTERN.search(path.name)
        steps = int(match.group(1)) if match else None
        return ResolvedCheckpoint(checkpoint_dir=path, run_dir=path.parent, steps=steps)

    checkpoint_dirs: list[tuple[int, Path]] = []
    for child in path.iterdir():
        if not child.is_dir():
            continue
        match = _CHECKPOINT_DIR_PATTERN.match(child.name)
        if not match:
            continue
        if not (child / "trainer_state.json").exists():
            continue
        checkpoint_dirs.append((int(match.group(1)), child))
    if not checkpoint_dirs:
        raise ValueError(
            f"Checkpoint path '{path}' does not contain any checkpoint-* "
            "directories with trainer_state.json"
        )
    checkpoint_dirs.sort(key=lambda pair: pair[0])
    steps, latest = checkpoint_dirs[-1]
    return ResolvedCheckpoint(checkpoint_dir=latest, run_dir=path, steps=steps)


def calculate_dynamic_steps(
    dataset_size: int,
    per_device_batch_size: int,
    gradient_accumulation_steps: int,
    num_epochs: float,
    num_devices: int = 1,
    target_eval_points: int = 20,
    target_log_points: int = 100,
) -> tuple[int, int, int]:
    """eval ≈ total/20, log ≈ total/100 (reference trainer.py:1240-1277)."""
    effective_batch_size = (
        per_device_batch_size * gradient_accumulation_steps * num_devices
    )
    steps_per_epoch = dataset_size // effective_batch_size
    total_steps = int(steps_per_epoch * num_epochs)
    eval_steps = max(1, total_steps // target_eval_points)
    logging_steps = max(1, total_steps // target_log_points)
    if logging_steps > eval_steps:
        logging_steps = max(1, eval_steps // 2)
    return eval_steps, logging_steps, total_steps


def make_optimizer(
    *,
    learning_rate: float,
    total_steps: int,
    warmup_ratio: float = 0.1,
    lr_scheduler_type: str = "cosine",
    optim: str = "adafactor",
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    warmup_steps = max(1, int(total_steps * warmup_ratio))
    decay_steps = max(total_steps, warmup_steps + 1)
    if lr_scheduler_type == "cosine":
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, decay_steps, end_value=0.0
        )
    elif lr_scheduler_type == "linear":
        schedule = optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, warmup_steps),
                optax.linear_schedule(
                    learning_rate, 0.0, max(1, decay_steps - warmup_steps)
                ),
            ],
            [warmup_steps],
        )
    elif lr_scheduler_type == "constant":
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps),
             optax.constant_schedule(learning_rate)],
            [warmup_steps],
        )
    else:
        raise ValueError(f"Unknown lr_scheduler_type: {lr_scheduler_type!r}")

    transforms = []
    if max_grad_norm and max_grad_norm > 0:
        transforms.append(optax.clip_by_global_norm(max_grad_norm))
    if optim == "adafactor":
        transforms.append(
            optax.adafactor(
                learning_rate=schedule,
                multiply_by_parameter_scale=True,
                clipping_threshold=1.0,
                weight_decay_rate=None,
            )
        )
    elif optim in ("adamw", "adamw_torch"):
        transforms.append(optax.adamw(schedule, weight_decay=weight_decay))
    else:
        raise ValueError(f"Unknown optimizer: {optim!r}")
    return optax.chain(*transforms)


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int


class OpenProvenceTrainer:
    """Owns the jitted steps, the loop, logging, and checkpoints."""

    def __init__(
        self,
        config: OpenProvenceConfig,
        params: Any,
        tokenizer: Any,
        *,
        output_dir: str | Path,
        learning_rate: float = 5e-5,
        total_steps: int = 1000,
        warmup_ratio: float = 0.1,
        lr_scheduler_type: str = "cosine",
        optim: str = "adafactor",
        weight_decay: float = 0.01,
        max_grad_norm: float = 1.0,
        ranking_weight: float = 0.05,
        pruning_weight: float = 1.0,
        bf16: bool = True,
        gradient_checkpointing: bool = False,
        gradient_accumulation_steps: int = 1,
        seed: int = 42,
        mesh: Any = None,
        tensor_parallel: bool = False,
        save_total_limit: int = 5,
        attention_impl: str = "auto",
        log_fn: Callable[[dict[str, Any]], None] | None = None,
    ):
        self.config = config
        self.module = OpenProvenceModule(
            backbone_config=config.backbone(), pruning_config=config.pruning_head()
        )
        self.tokenizer = tokenizer
        self.output_dir = Path(output_dir)
        self.ranking_weight = ranking_weight
        self.pruning_weight = pruning_weight
        self.bf16 = bf16
        self.gradient_checkpointing = gradient_checkpointing
        if gradient_accumulation_steps < 1:
            raise ValueError(
                f"gradient_accumulation_steps must be >= 1, got {gradient_accumulation_steps}"
            )
        self.gradient_accumulation_steps = int(gradient_accumulation_steps)
        self.seed = seed
        self.save_total_limit = save_total_limit
        self.attention_impl = attention_impl
        self.mesh = mesh if mesh is not None else create_mesh()
        self.tensor_parallel = bool(tensor_parallel)
        self.log_fn = log_fn
        self.log_history: list[dict[str, Any]] = []

        self.optimizer = make_optimizer(
            learning_rate=learning_rate,
            total_steps=total_steps,
            warmup_ratio=warmup_ratio,
            lr_scheduler_type=lr_scheduler_type,
            optim=optim,
            weight_decay=weight_decay,
            max_grad_norm=max_grad_norm,
        )
        # Take ownership with a fresh device copy: the jitted step donates the
        # param buffers, and jax.device_put aliases (rather than copies) arrays
        # whose placement already matches — without the copy, the first step
        # would delete the CALLER's arrays out from under it.
        params = jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else jnp.asarray(x),
            params,
        )
        with self.mesh:
            if tensor_parallel:
                from ..parallel.mesh import shard_params

                params = shard_params(params, self.mesh, tensor_parallel=True)
            else:
                params = jax.device_put(params, replicated(self.mesh))
            opt_state = self.optimizer.init(params)
        self.state = TrainState(params=params, opt_state=opt_state, step=0)
        self._rng = jax.random.PRNGKey(seed)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self.best_eval_loss = float("inf")
        self.best_checkpoint: Path | None = None

    # --- jitted steps -------------------------------------------------------

    def _loss_for_batch(self, params, batch, dropout_rng, deterministic):
        compute_params = params
        if self.bf16:
            compute_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                params,
            )
        rngs = None if deterministic else {"dropout": dropout_rng}
        outputs = self.module.apply(
            {"params": compute_params},
            batch["input_ids"],
            batch["attention_mask"],
            deterministic=deterministic,
            attention_impl=self.attention_impl,
            remat=self.gradient_checkpointing and not deterministic,
            rngs=rngs,
        )
        return joint_loss(
            outputs,
            batch,
            ranking_weight=self.ranking_weight,
            pruning_weight=self.pruning_weight,
        )

    def _build_train_step(self):
        # Shardings are inferred from the committed placements of params /
        # opt_state (replicated or TP-sharded) and the batch (data-sharded in
        # _prepare_batch); GSPMD inserts the gradient all-reduce over "data".
        accum = self.gradient_accumulation_steps

        grad_fn = jax.value_and_grad(
            lambda p, mb, rng: self._loss_for_batch(p, mb, rng, deterministic=False),
            has_aux=True,
        )

        def apply_update(params, opt_state, grads, loss, components):
            updates, new_opt_state = self.optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt_state, {"loss": loss, **components}

        if accum == 1:

            def step(params, opt_state, batch, dropout_rng):
                (loss, components), grads = grad_fn(params, batch, dropout_rng)
                return apply_update(params, opt_state, grads, loss, components)

        else:
            # Each batch leaf carries a leading microbatch axis [A, ...].
            # lax.scan over microbatches keeps live memory at one microbatch's
            # activations; grads/losses are averaged (matching the reference's
            # HF-Trainer accumulation semantics, trainer.py:365-375) before a
            # single optimizer update.
            def step(params, opt_state, batch, dropout_rng):
                rngs = jax.random.split(dropout_rng, accum)
                first = jax.tree.map(lambda x: x[0], batch)
                rest = jax.tree.map(lambda x: x[1:], batch)
                (loss0, comps0), grads0 = grad_fn(params, first, rngs[0])

                def micro(carry, xs):
                    g_acc, l_acc, c_acc = carry
                    mb, rng = xs
                    (loss, comps), grads = grad_fn(params, mb, rng)
                    return (
                        jax.tree.map(jnp.add, g_acc, grads),
                        l_acc + loss,
                        jax.tree.map(jnp.add, c_acc, comps),
                    ), None

                (grads, loss, components), _ = jax.lax.scan(
                    micro, (grads0, loss0, comps0), (rest, rngs[1:])
                )
                inv = 1.0 / accum
                grads = jax.tree.map(lambda g: g * inv, grads)
                components = jax.tree.map(lambda c: c * inv, components)
                return apply_update(params, opt_state, grads, loss * inv, components)

        return jax.jit(step, donate_argnums=(0, 1))

    def _build_eval_step(self):
        def step(params, batch):
            total, components = self._loss_for_batch(
                params, batch, None, deterministic=True
            )
            return {"loss": total, **components}

        return jax.jit(step)

    # --- loop ---------------------------------------------------------------

    def _prepare_batch(self, batch: Mapping[str, np.ndarray]) -> dict[str, jnp.ndarray]:
        bs1 = batch_sharding(self.mesh)
        bs2 = batch_sharding_2d(self.mesh)
        out: dict[str, jnp.ndarray] = {}
        for key, value in batch.items():
            arr = np.asarray(value)
            sharding = bs2 if arr.ndim >= 2 else bs1
            out[key] = jax.device_put(arr, sharding)
        return out

    def _prepare_accum_batch(
        self, batches: list[Mapping[str, np.ndarray]]
    ) -> dict[str, jnp.ndarray]:
        """Stack microbatches on a leading axis [A, ...], sharding the pair
        axis (now axis 1) over the mesh data axis."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        out: dict[str, jnp.ndarray] = {}
        for key in batches[0]:
            arr = np.stack([np.asarray(b[key]) for b in batches])
            spec = P(None, DATA_AXIS, *([None] * (arr.ndim - 2)))
            out[key] = jax.device_put(arr, NamedSharding(self.mesh, spec))
        return out

    def train_one_step(
        self,
        batch: Mapping[str, np.ndarray] | list[Mapping[str, np.ndarray]],
        *,
        sync: bool = True,
    ) -> dict[str, Any]:
        """One optimizer step. With ``gradient_accumulation_steps > 1``,
        ``batch`` must be a list of exactly that many microbatches.

        ``sync=False`` returns the metrics as device arrays without the
        blocking host fetch — steps then stream back-to-back on the device
        (one tunnel round trip per LOGGED step instead of per step); call
        ``jax.device_get`` on the returned dict when a value is needed."""
        accum = self.gradient_accumulation_steps
        if accum > 1:
            if not isinstance(batch, (list, tuple)) or len(batch) != accum:
                raise ValueError(
                    f"gradient_accumulation_steps={accum} requires a list of "
                    f"{accum} microbatches per step, got "
                    f"{type(batch).__name__} of length "
                    f"{len(batch) if isinstance(batch, (list, tuple)) else 'n/a'}"
                )
            device_batch = self._prepare_accum_batch(list(batch))
        else:
            if isinstance(batch, (list, tuple)):
                if len(batch) != 1:
                    raise ValueError(
                        "Multiple microbatches passed but gradient_accumulation_steps == 1"
                    )
                batch = batch[0]
            device_batch = self._prepare_batch(batch)
        self._rng, dropout_rng = jax.random.split(self._rng)
        with self.mesh:
            params, opt_state, metrics = self._train_step(
                self.state.params,
                self.state.opt_state,
                device_batch,
                dropout_rng,
            )
        self.state = TrainState(
            params=params, opt_state=opt_state, step=self.state.step + 1
        )
        if not sync:
            return metrics
        return {k: float(v) for k, v in jax.device_get(metrics).items()}

    def evaluate(self, eval_batches: Iterator[Mapping[str, np.ndarray]]) -> dict[str, float]:
        totals: dict[str, float] = {}
        count = 0
        with self.mesh:
            for batch in eval_batches:
                metrics = jax.device_get(
                    self._eval_step(self.state.params, self._prepare_batch(batch))
                )
                for k, v in metrics.items():
                    totals[k] = totals.get(k, 0.0) + float(v)
                count += 1
        if count == 0:
            return {}
        return {f"eval_{k}": v / count for k, v in totals.items()}

    def log(self, logs: dict[str, Any]) -> None:
        logs = {**logs, "step": self.state.step}
        self.log_history.append(logs)
        if self.log_fn is not None:
            self.log_fn(logs)
        else:
            logger.info("step %s: %s", self.state.step, logs)

    def train(
        self,
        train_batches: Callable[[], Iterator[Mapping[str, np.ndarray]]],
        *,
        total_steps: int,
        eval_batches: Callable[[], Iterator[Mapping[str, np.ndarray]]] | None = None,
        eval_steps: int | None = None,
        logging_steps: int = 100,
        save_steps: int | None = None,
        load_best_model_at_end: bool = True,
        resume_from: Path | None = None,
    ) -> None:
        if resume_from is not None:
            self.load_checkpoint(resume_from)

        # Per-step metrics stay on device between log points; one windowed
        # device_get per LOGGED step keeps steps streaming back-to-back
        # instead of paying a blocking tunnel round trip per step.
        pending_metrics: list[dict[str, Any]] = []
        iterator = train_batches()

        def _flush_pending() -> dict[str, float]:
            fetched = jax.device_get(pending_metrics)
            pending_metrics.clear()
            totals: dict[str, float] = {}
            for entry in fetched:
                for k, v in entry.items():
                    totals[k] = totals.get(k, 0.0) + float(v)
            return {k: v / len(fetched) for k, v in totals.items()}

        def _next_microbatch():
            nonlocal iterator
            try:
                return next(iterator)
            except StopIteration:
                iterator = train_batches()
                try:
                    return next(iterator)
                except StopIteration:
                    return None

        micro_per_step = self.gradient_accumulation_steps
        while self.state.step < total_steps:
            micro = [_next_microbatch() for _ in range(micro_per_step)]
            if any(m is None for m in micro):
                break
            batch = micro if micro_per_step > 1 else micro[0]
            pending_metrics.append(self.train_one_step(batch, sync=False))

            step = self.state.step
            if logging_steps and step % logging_steps == 0 and pending_metrics:
                self.log(_flush_pending())
            if eval_batches is not None and eval_steps and step % eval_steps == 0:
                eval_metrics = self.evaluate(eval_batches())
                self.log(eval_metrics)
                if eval_metrics.get("eval_loss", float("inf")) < self.best_eval_loss:
                    self.best_eval_loss = eval_metrics["eval_loss"]
                    self.best_checkpoint = self.save_checkpoint()
            if save_steps and step % save_steps == 0:
                self.save_checkpoint()

        if pending_metrics:
            self.log(_flush_pending())
        if (
            load_best_model_at_end
            and self.best_checkpoint is not None
            and self.best_checkpoint.exists()
        ):
            self.load_checkpoint(self.best_checkpoint, restore_opt_state=False)

    # --- checkpoints --------------------------------------------------------

    def save_checkpoint(self) -> Path:
        """checkpoint-N dir: orbax train state + HF-layout export + tokenizer
        + trainer_state.json (reference trainer.py:415-461)."""
        step = self.state.step
        ckpt_dir = self.output_dir / f"checkpoint-{step}"
        if ckpt_dir.exists():
            shutil.rmtree(ckpt_dir)
        ckpt_dir.mkdir(parents=True, exist_ok=True)

        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                (ckpt_dir / "train_state").resolve(),
                {
                    "params": jax.device_get(self.state.params),
                    "opt_state": jax.device_get(self.state.opt_state),
                },
            )
        (ckpt_dir / "trainer_state.json").write_text(
            json.dumps(
                {
                    "global_step": step,
                    "best_eval_loss": self.best_eval_loss
                    if math.isfinite(self.best_eval_loss)
                    else None,
                    "log_history": self.log_history[-200:],
                    # Dropout rng state so a resumed run replays the exact
                    # step sequence (the reference checkpoints torch rng).
                    "rng_state": np.asarray(
                        jax.random.key_data(self._rng)
                    ).tolist(),
                    "tensor_parallel": self.tensor_parallel,
                }
            )
        )
        self.export_model(ckpt_dir)
        self._rotate_checkpoints()
        return ckpt_dir

    def _rotate_checkpoints(self) -> None:
        if not self.save_total_limit:
            return
        checkpoints = sorted(
            (
                (int(m.group(1)), child)
                for child in self.output_dir.iterdir()
                if child.is_dir() and (m := _CHECKPOINT_DIR_PATTERN.match(child.name))
            ),
        )
        keep_paths = {p for _, p in checkpoints[-self.save_total_limit :]}
        if self.best_checkpoint is not None:
            keep_paths.add(self.best_checkpoint)
        for _, child in checkpoints:
            if child not in keep_paths:
                shutil.rmtree(child, ignore_errors=True)

    def load_checkpoint(self, path: str | Path, *, restore_opt_state: bool = True) -> None:
        path = Path(path)
        import orbax.checkpoint as ocp

        target = {
            "params": jax.device_get(self.state.params),
            "opt_state": jax.device_get(self.state.opt_state),
        }
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore((path / "train_state").resolve(), target)

        # Re-place each restored leaf with the LIVE state's sharding so resume
        # preserves whatever layout __init__ established (replicated for DP,
        # PartitionSpecs from shard_params for tensor_parallel=True). A fixed
        # replicated() here used to silently drop TP sharding on resume.
        # Leaves whose live sharding is not a NamedSharding (e.g. scalar
        # optimizer counters created uncommitted inside optimizer.init) are
        # placed replicated — committing them to their current single device
        # would poison the jitted step with mixed placements.
        from jax.sharding import NamedSharding

        def _place_like(current, restored_leaf):
            sharding = getattr(current, "sharding", None)
            if not isinstance(sharding, NamedSharding):
                sharding = replicated(self.mesh)
            return jax.device_put(jnp.asarray(restored_leaf), sharding)

        with self.mesh:
            params = jax.tree.map(_place_like, self.state.params, restored["params"])
            opt_state = self.state.opt_state
            if restore_opt_state:
                opt_state = jax.tree.map(
                    _place_like, self.state.opt_state, restored["opt_state"]
                )
        state_file = path / "trainer_state.json"
        step = self.state.step
        if state_file.exists():
            payload = json.loads(state_file.read_text())
            step = int(payload.get("global_step", step))
            best = payload.get("best_eval_loss")
            if best is not None:
                self.best_eval_loss = float(best)
            rng_state = payload.get("rng_state")
            if rng_state is not None:
                self._rng = jax.random.wrap_key_data(
                    jnp.asarray(rng_state, dtype=jnp.uint32)
                )
            saved_tp = payload.get("tensor_parallel")
            if saved_tp is not None and bool(saved_tp) != self.tensor_parallel:
                logger.warning(
                    "Checkpoint was written with tensor_parallel=%s but this "
                    "trainer uses tensor_parallel=%s; restored arrays take the "
                    "live trainer's layout.",
                    saved_tp,
                    self.tensor_parallel,
                )
        self.state = TrainState(params=params, opt_state=opt_state, step=step)

    def export_model(self, directory: str | Path) -> Path:
        """Write the self-describing HF-layout artifact: config.json +
        model.safetensors (merged ranking_model.* + pruning_head.* keys) +
        tokenizer files (reference encoder.py:1040-1094)."""
        from ..utils.hf_convert import flax_params_to_hf, save_safetensors_state_dict

        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        self.config.save(directory)
        sd = flax_params_to_hf(jax.device_get(self.state.params), self.config)
        save_safetensors_state_dict(sd, directory / "model.safetensors")
        save_fn = getattr(self.tokenizer, "save_pretrained", None)
        if callable(save_fn):
            try:
                save_fn(str(directory))
            except Exception:  # pragma: no cover - tokenizer-specific
                logger.warning("Failed to save tokenizer files", exc_info=True)
        return directory
