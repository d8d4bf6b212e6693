"""OpenProvenceModel — the standalone inference runtime (TPU-native).

Counterpart of the reference's flagship artifact
(modeling_open_provence_standalone.py:1467-3805): ``from_pretrained`` +
``process()`` + raw-prediction APIs, with the same input-shape contract and
output payload schema, but a TPU-shaped device path:

* one jitted forward per (batch, length) bucket — fixed shapes, compiled
  once and reused (inference/batching.py) instead of pad-to-batch-max,
* attention via the Pallas flash kernel on TPU (ops/flash_attention.py) with
  the XLA path as fallback/reference,
* fp32 sigmoid/softmax of logits on device (parity with standalone:2900-2924),
* optional data-parallel sharding of inference batches over a device mesh.

Everything outside the jitted forward is host text processing, mirroring the
reference's pipeline: sentence split → fragmentation → greedy block packing →
postprocess (SURVEY §3.2).
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Mapping, Sequence
from pathlib import Path
from time import perf_counter
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import OpenProvenceConfig
from ..models.model import (
    OpenProvenceModule,
    keep_probs_from_logits,
    ranking_score_from_logits,
)
from ..text.fragmentation import (
    FragmentRecord,
    assemble_blocks,
    fragmentize_jobs,
    fragments_from_payload,
    max_fragment_tokens_for,
    tokenize_sentences,
)
from ..text.splitters import SentenceSplitter, resolve_sentence_splitter
from ..text.tokenizer import TokenizerAdapter
from ..utils.jit_cache import shared_jit
from ..utils.tracing import ProcessPerformanceTrace
from .batching import bucket_batch, bucket_length, length_buckets, pad_block_batch
from .inputs import normalize_inputs, resolve_prefix_sentences, resolve_titles
from .postprocess import (
    BlockScores,
    build_payload,
    reorder_outcomes,
    summarize_contexts,
)

_LOG = logging.getLogger(__name__)


class _Stopwatch:
    """Accumulates wall-clock seconds per named phase.

    ``with watch("preprocess"): ...`` adds the block's duration to that
    phase; ``watch["preprocess"]`` reads the total. Re-entrant per phase.
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self._stack: list[tuple[str, float]] = []

    def begin(self, phase: str) -> None:
        self._stack.append((phase, perf_counter()))

    def end(self) -> None:
        phase, began = self._stack.pop()
        self.totals[phase] = self.totals.get(phase, 0.0) + perf_counter() - began

    def __call__(self, phase: str) -> "_Stopwatch":
        self.begin(phase)
        return self

    def __enter__(self) -> "_Stopwatch":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.end()

    def __getitem__(self, phase: str) -> float:
        return self.totals.get(phase, 0.0)

    def add(self, phase: str, seconds: float) -> None:
        self.totals[phase] = self.totals.get(phase, 0.0) + seconds


def _debug_emitter(
    debug_messages: bool | Callable[[str], None],
) -> Callable[[str], None] | None:
    """Map the ``debug_messages`` argument to an emitter: True → logger,
    False → None, callable → itself."""
    if debug_messages is True:
        return _LOG.info
    if debug_messages is False:
        return None
    if callable(debug_messages):
        return debug_messages
    raise TypeError("debug_messages must be a bool or a callable that accepts a string")


class _BlockDispatcher:
    """Buckets prepared block inputs by padded length and dispatches jitted
    forwards AS BUCKETS FILL, so host fragmentation of later cells overlaps
    device compute of earlier ones (jax dispatch is async; the device-tunnel
    round trip alone measures 10-35 ms). Results are fetched in windowed
    ``device_get`` batches — one tunnel round trip per window, not per batch.

    The first batch flushes at half size to put the device to work early;
    ``OPEN_PROVENCE_TPU_PIPELINE=0`` reverts to collect-then-dispatch.
    """

    FETCH_WINDOW = 256

    def __init__(
        self,
        model: "OpenProvenceModel",
        batch_size: int,
        *,
        use_device_pooling: bool,
        cell_table: dict[tuple[int, int], dict[str, Any]],
        watch: _Stopwatch,
        progress: Any = None,
        pipeline: bool = True,
    ):
        self.model = model
        self.batch_size = batch_size
        self.pooling = use_device_pooling
        self.cell_table = cell_table
        self.watch = watch
        self.progress = progress
        self.pipeline = pipeline
        self._buckets = length_buckets(model.max_length, model.bucket_step)
        self._buffers: dict[int, list[dict[str, Any]]] = {}
        self._pending: list[tuple[list[dict[str, Any]], Any]] = []
        self._dispatched = 0
        self.total_blocks = 0

    def add(self, entry: dict[str, Any]) -> None:
        blen = bucket_length(
            min(len(entry["input_ids"]), self.model.max_length), self._buckets
        )
        buf = self._buffers.setdefault(blen, [])
        buf.append(entry)
        self.total_blocks += 1
        if not self.pipeline:
            return
        # Half-size first flush: on single-batch workloads the device would
        # otherwise sit idle until the last cell is fragmentized. Never
        # above batch_size — a chunk larger than the padded batch would be
        # silently truncated by pad_block_batch.
        threshold = (
            min(self.batch_size, max(8, self.batch_size // 2))
            if self._dispatched == 0
            else self.batch_size
        )
        if len(buf) >= threshold:
            self._dispatch(blen, buf[:])
            buf.clear()

    def finish(self) -> None:
        """Dispatch every partial bucket, then fetch and attach everything."""
        for blen in sorted(self._buffers):
            buf = self._buffers[blen]
            for lo in range(0, len(buf), self.batch_size):
                self._dispatch(blen, buf[lo : lo + self.batch_size])
            buf.clear()
        self._drain()

    def _dispatch(self, seq_len: int, chunk: list[dict[str, Any]]) -> None:
        model = self.model
        n_rows = model._bucket_rows(len(chunk), self.batch_size)
        batch_arrays = pad_block_batch(
            chunk, seq_len, n_rows, model.tokenizer.pad_token_id
        )
        with self.watch("inference"):
            if self.pooling:
                f_cap = model._frag_cap(max(len(e["ranges"]) for e in chunk))
                frag_starts = np.zeros((n_rows, f_cap), dtype=np.int32)
                frag_ends = np.zeros((n_rows, f_cap), dtype=np.int32)
                for row, entry in enumerate(chunk):
                    for j, (frag_lo, frag_hi) in enumerate(entry["ranges"]):
                        frag_starts[row, j] = frag_lo
                        frag_ends[row, j] = frag_hi
                fn = model._pooled_forward_fn(n_rows, seq_len, f_cap)
                ids, mask, fs, fe = model._shard_inputs(
                    batch_arrays["input_ids"],
                    batch_arrays["attention_mask"],
                    frag_starts,
                    frag_ends,
                )
                res = fn(model.params, ids, mask, fs, fe)
            else:
                fn = model._forward_fn(n_rows, seq_len)
                ids, mask = model._shard_inputs(
                    batch_arrays["input_ids"], batch_arrays["attention_mask"]
                )
                res = fn(model.params, ids, mask)
        self._pending.append((chunk, res))
        self._dispatched += 1
        if self.progress is not None:
            self.progress.update(1)
        if len(self._pending) >= self.FETCH_WINDOW:
            self._drain()

    def _drain(self) -> None:
        if not self._pending:
            return
        with self.watch("inference"):
            fetched = jax.device_get([res for _, res in self._pending])
        for (chunk, _), res in zip(self._pending, fetched):
            if self.pooling:
                rank, means = res
                for row, entry in enumerate(chunk):
                    work = entry["job"]
                    n_frags = len(entry["ranges"])
                    scores = BlockScores(
                        order=work["block_idx"],
                        rank=float(rank[row]),
                        fragment_gids=entry["gids"],
                        fragment_spans=np.asarray(
                            entry["ranges"], dtype=np.int64
                        ).reshape(-1, 2),
                        fragment_means=means[row][:n_frags],
                    )
                    self.cell_table[(work["query_idx"], work["context_idx"])][
                        "raw_blocks"
                    ].append(scores)
            else:
                rank, keep = res
                for row, entry in enumerate(chunk):
                    work = entry["job"]
                    n_tokens = len(entry["input_ids"])
                    scores = BlockScores(
                        order=work["block_idx"],
                        rank=float(rank[row]),
                        fragment_gids=entry["gids"],
                        fragment_spans=np.asarray(
                            entry["ranges"], dtype=np.int64
                        ).reshape(-1, 2),
                        token_probs=keep[row][:n_tokens],
                    )
                    self.cell_table[(work["query_idx"], work["context_idx"])][
                        "raw_blocks"
                    ].append(scores)
        self._pending.clear()


class OpenProvenceRawPrediction:
    """Raw pruning outputs for a (query, contexts) pair
    (standalone:451-459)."""

    def __init__(
        self,
        query: str,
        contexts: list[str],
        ranking_score: float | None,
        pruning_probs: np.ndarray,
        context_ranges: list[tuple[int, int]],
    ):
        self.query = query
        self.contexts = contexts
        self.ranking_score = ranking_score
        self.pruning_probs = pruning_probs
        self.context_ranges = context_ranges


class OpenProvenceModel:
    """Inference runtime: config + params + tokenizer + jitted forwards."""

    def __init__(
        self,
        config: OpenProvenceConfig,
        params: Mapping[str, Any],
        tokenizer: Any,
        *,
        dtype: Any = None,
        attention_impl: str = "auto",
        bucket_step: int | None = None,
        mesh: Any = None,
        tensor_parallel: bool = False,
        device_pooling: bool = True,
    ):
        self.config = config
        self.module = OpenProvenceModule(
            backbone_config=config.backbone(),
            pruning_config=config.pruning_head(),
        )
        if dtype is not None:
            params = jax.tree.map(
                lambda x: x.astype(dtype) if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
                params,
            )
        self.params = jax.tree.map(jnp.asarray, dict(params))
        if mesh is not None:
            if tensor_parallel:
                from ..parallel.mesh import shard_params

                self.params = shard_params(self.params, mesh, tensor_parallel=True)
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self.params = jax.device_put(self.params, NamedSharding(mesh, P()))
        self.tokenizer = (
            tokenizer
            if isinstance(tokenizer, TokenizerAdapter)
            else TokenizerAdapter(tokenizer, max_length=config.max_length)
        )
        self.max_length = int(config.max_length)
        self.default_threshold = config.default_threshold
        self.attention_impl = attention_impl
        if bucket_step is None:
            # On TPU, buckets must be 128-multiples or the packed flash
            # kernel disengages (S % 128): a 448-token bucket silently ran
            # XLA attention, ~1.5x the whole-model time of the 512 bucket.
            # 128 trades ≤14% padding for keeping every bucket on the fast
            # path; finer steps only pay on CPU/debug runs.
            from ..ops.attention import _default_platform

            bucket_step = 128 if _default_platform() == "tpu" else 64
        self.bucket_step = int(bucket_step)
        self.mesh = mesh
        # Device-side fragment mean pooling (ops/segment.py): exact only when
        # no title-prefix offset correction applies; the engine falls back to
        # token-prob transfer otherwise.
        self.device_pooling = bool(device_pooling)
        self._data_axis = 1
        if mesh is not None:
            self._data_axis = int(mesh.devices.shape[0])
        self._jit_cache: dict[tuple[int, int], Callable] = {}
        self._jit_pool_cache: dict[tuple[int, int], Callable] = {}

    # --- loading -------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        path: str | Path,
        *,
        dtype: Any = None,
        attention_impl: str = "auto",
        max_length: int | None = None,
        tokenizer: Any = None,
        **kwargs: Any,
    ) -> "OpenProvenceModel":
        """Load a reference-layout checkpoint directory (config.json +
        model.safetensors + tokenizer files)."""
        from ..utils.hf_convert import load_checkpoint

        path = Path(path)
        config, params = load_checkpoint(path)
        if max_length is not None:
            config.max_length = int(max_length)
        if tokenizer is None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(str(path))
        if dtype is None and jax.devices()[0].platform == "tpu":
            dtype = jnp.bfloat16
        return cls(
            config,
            params,
            tokenizer,
            dtype=dtype,
            attention_impl=attention_impl,
            **kwargs,
        )

    # --- device forward -------------------------------------------------------

    def _bucket_rows(self, n: int, batch_size: int) -> int:
        """Pad the row count to a power of two (capped at batch_size) and,
        under a mesh, to a multiple of the data axis."""
        rows = bucket_batch(n, batch_size)
        if self._data_axis > 1:
            d = self._data_axis
            rows = ((rows + d - 1) // d) * d
        return rows

    def _shard_inputs(self, *arrays: jnp.ndarray):
        """Commit inputs to the mesh data axis so the jitted forward runs
        data-parallel (GSPMD infers the rest)."""
        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrays)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(self.mesh, P("data", *([None] * 1)))
        return tuple(jax.device_put(np.asarray(a), sharding) for a in arrays)

    def _forward_fn(self, batch: int, seq_len: int) -> Callable:
        key = (batch, seq_len)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn

        module = self.module
        impl = self.attention_impl

        def _build() -> Callable:
            def _run(params, input_ids, attention_mask):
                out = module.apply(
                    {"params": params},
                    input_ids,
                    attention_mask,
                    deterministic=True,
                    attention_impl=impl,
                )
                rank = ranking_score_from_logits(out["ranking_logits"])  # [B] fp32
                keep = keep_probs_from_logits(out["pruning_logits"])  # [B, S] fp32
                return rank, keep

            return jax.jit(_run)

        # Process-wide sharing: same architecture + impl → same jitted fn
        # (and so the same compiled executables) across engine instances.
        # The per-instance dict remains the record of warmed shapes.
        fn = shared_jit(("engine_forward", module, impl), _build)
        self._jit_cache[key] = fn
        return fn

    def _run_device_batch(
        self, input_ids: np.ndarray, attention_mask: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        batch, seq_len = input_ids.shape
        fn = self._forward_fn(batch, seq_len)
        ids, mask = self._shard_inputs(input_ids, attention_mask)
        rank, keep = fn(self.params, ids, mask)
        return np.asarray(jax.device_get(rank)), np.asarray(jax.device_get(keep))

    @staticmethod
    def _frag_cap(n_frags: int) -> int:
        """Bucket the per-row fragment capacity (power of two, min 16) so the
        pooled jit cache stays small while [B, F] transfers stay ~F-sized
        instead of seq_len-sized (16-32x smaller fetches over the tunnel)."""
        cap = 16
        while cap < n_frags:
            cap *= 2
        return cap

    def _pooled_forward_fn(self, batch: int, seq_len: int, f_cap: int) -> Callable:
        """Forward + on-device fragment mean pooling: only [B] scores and
        [B, f_cap] fragment means cross the device boundary. Empty slots
        (start == end) come back as 1.0 — the keep-everything sentinel the
        postprocess expects — folded on device so counts never transfer."""
        key = (batch, seq_len, f_cap)
        fn = self._jit_pool_cache.get(key)
        if fn is not None:
            return fn

        module = self.module
        impl = self.attention_impl

        def _build() -> Callable:
            def _run(params, input_ids, attention_mask, frag_starts, frag_ends):
                from ..ops.segment import fragment_mean_pool_ranges

                out = module.apply(
                    {"params": params},
                    input_ids,
                    attention_mask,
                    deterministic=True,
                    attention_impl=impl,
                )
                rank = ranking_score_from_logits(out["ranking_logits"])  # [B]
                keep = keep_probs_from_logits(out["pruning_logits"])  # [B, S]
                means, counts = fragment_mean_pool_ranges(
                    keep, frag_starts, frag_ends
                )
                return rank, jnp.where(counts > 0, means, 1.0)

            return jax.jit(_run)

        fn = shared_jit(("engine_pooled_forward", module, impl), _build)
        self._jit_pool_cache[key] = fn
        return fn

    def _run_device_batch_pooled(
        self,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        frag_starts: np.ndarray,
        frag_ends: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        batch, seq_len = input_ids.shape
        fn = self._pooled_forward_fn(batch, seq_len, frag_starts.shape[1])
        ids, mask, fs, fe = self._shard_inputs(
            input_ids, attention_mask, frag_starts, frag_ends
        )
        rank, means = jax.device_get(fn(self.params, ids, mask, fs, fe))
        return np.asarray(rank), np.asarray(means)

    def warmup(
        self,
        batch_size: int | None = None,
        lengths: Sequence[int] | None = None,
        *,
        include_pooled: bool = True,
        fragment_caps: Sequence[int] = (16,),
    ) -> list[tuple[int, ...]]:
        """Pre-compile the bucketed forward programs ``process()`` will hit.

        TPU compiles take 20 s+ each; a serving deployment calls this once at
        startup so the first user request doesn't pay them. Compiles the
        full-batch program for every bucket length (all ``lengths`` from the
        model's bucket table by default) — the shapes the engine dispatches
        for full chunks — plus, when ``include_pooled``, the device-pooling
        variant at each ``fragment_caps`` entry (``_frag_cap`` buckets
        per-row fragment capacity to powers of two, min 16). Returns the
        compiled cache keys. New surface (no reference counterpart — the
        torch reference has no compile step)."""
        if batch_size is None:
            # Match process()'s auto-batch default so serving pre-compiles
            # the programs it will actually dispatch.
            from ..ops.attention import _default_platform

            batch_size = 64 if _default_platform() == "tpu" else 32
        if lengths is None:
            lengths = length_buckets(self.max_length, self.bucket_step)
        warmed: list[tuple[int, ...]] = []
        rows = self._bucket_rows(batch_size, batch_size)
        for seq_len in lengths:
            ids = np.zeros((rows, seq_len), dtype=np.int32)
            mask = np.ones((rows, seq_len), dtype=np.int32)
            self._run_device_batch(ids, mask)
            warmed.append((rows, seq_len))
            if include_pooled and self.device_pooling:
                for cap in fragment_caps:
                    f_cap = self._frag_cap(int(cap))
                    starts = np.zeros((rows, f_cap), dtype=np.int32)
                    ends = np.zeros((rows, f_cap), dtype=np.int32)
                    self._run_device_batch_pooled(ids, mask, starts, ends)
                    warmed.append((rows, seq_len, f_cap))
        return warmed

    # --- raw prediction APIs ---------------------------------------------------

    def get_raw_predictions(
        self, query: str, contexts: Sequence[str]
    ) -> OpenProvenceRawPrediction:
        return self.get_raw_predictions_batch(query, [list(contexts)])[0]

    def _queries_for_batch(
        self, query: str | Sequence[str], n_rows: int
    ) -> list[str]:
        """Broadcast a scalar query / validate a per-row query list."""
        if isinstance(query, str) or not isinstance(query, Sequence):
            return [str(query)] * n_rows
        rows = [str(entry) for entry in query]
        if len(rows) != n_rows:
            raise ValueError(
                "When providing multiple queries, their count must match contexts_batch."
            )
        return rows

    def get_raw_predictions_batch(
        self,
        query: str | Sequence[str],
        contexts_batch: Sequence[Sequence[str]],
        batch_size: int | None = None,
    ) -> list[OpenProvenceRawPrediction]:
        """Joint forward over ``query [SEP] ctx0 ctx1 …`` rows, returning
        per-token keep probabilities plus each context's token range
        (behavior of standalone:1752-1841)."""
        if not contexts_batch:
            return []
        step = batch_size if batch_size and batch_size > 0 else len(contexts_batch)
        queries = self._queries_for_batch(query, len(contexts_batch))
        sep = self.tokenizer.sep_token or ""
        buckets = length_buckets(self.max_length, self.bucket_step)

        out: list[OpenProvenceRawPrediction] = []
        for lo in range(0, len(contexts_batch), step):
            rows = [
                (queries[i], [str(c) for c in contexts_batch[i]])
                for i in range(lo, min(lo + step, len(contexts_batch)))
            ]
            id_rows = self.tokenizer.tokenizer(
                [q + sep + "".join(ctxs) for q, ctxs in rows],
                padding=False,
                truncation=True,
                max_length=self.max_length,
            )["input_ids"]
            longest = max((len(ids) for ids in id_rows), default=1)
            padded = pad_block_batch(
                [{"input_ids": ids, "attention_mask": [1] * len(ids)} for ids in id_rows],
                bucket_length(longest, buckets),
                self._bucket_rows(len(id_rows), max(len(id_rows), 1)),
                self.tokenizer.pad_token_id,
            )
            rank, keep = self._run_device_batch(
                padded["input_ids"], padded["attention_mask"]
            )
            for row_idx, (q, ctxs) in enumerate(rows):
                if not ctxs:
                    continue
                out.append(
                    OpenProvenceRawPrediction(
                        query=q,
                        contexts=ctxs,
                        ranking_score=float(rank[row_idx]),
                        pruning_probs=keep[row_idx][: len(id_rows[row_idx])],
                        context_ranges=self._token_windows_per_context(q, ctxs),
                    )
                )
        return out

    def _token_windows_per_context(
        self, query: str, contexts: Sequence[str]
    ) -> list[tuple[int, int]]:
        """Token range of each context inside the joint encoding, found by
        encoding the cumulative prefixes (behavior of standalone:1926-1969) —
        all cumulative texts go through the tokenizer in ONE batched call
        instead of one call per context."""
        if not contexts:
            return []
        head = query + (self.tokenizer.sep_token or "")
        growing: list[str] = []
        acc = head
        for ctx in contexts:
            acc += ctx
            growing.append(acc)
        encoded = self.tokenizer.tokenizer(
            growing, padding=False, truncation=True, max_length=self.max_length
        )
        edges = [len(ids) for ids in encoded["input_ids"]]
        head_len = len(self.tokenizer.tokenizer([head], padding=False, truncation=False)["input_ids"][0])
        return list(zip([head_len, *edges[:-1]], edges))

    def predict_with_thresholds(
        self,
        query: str,
        contexts: Sequence[str],
        thresholds: Sequence[float],
        *,
        use_majority: bool = False,
    ) -> dict[str, Any]:
        """Per-context keep decisions swept over thresholds (behavior of
        standalone:1843-1881): mean-probability rule by default, majority of
        per-token votes with ``use_majority``. Empty token ranges always
        predict keep. Vectorized over numpy; the forward runs once."""
        raw_pred = self.get_raw_predictions(query, contexts)
        probs = np.asarray(raw_pred.pruning_probs, dtype=np.float32)
        spans = np.asarray(raw_pred.context_ranges, dtype=np.int64).reshape(-1, 2)
        sizes = np.maximum(spans[:, 1] - spans[:, 0], 0)
        running = np.concatenate([[0.0], np.cumsum(probs, dtype=np.float64)])
        sums = running[np.minimum(spans[:, 1], len(probs))] - running[
            np.minimum(spans[:, 0], len(probs))
        ]
        means = np.divide(sums, np.maximum(sizes, 1))

        by_threshold: dict[float, list[int]] = {}
        for th in thresholds:
            if use_majority:
                votes = np.array(
                    [
                        np.count_nonzero(probs[lo:hi] > th)
                        for lo, hi in raw_pred.context_ranges
                    ]
                )
                decided = votes >= sizes / 2
            else:
                decided = means > th
            by_threshold[th] = np.where(sizes == 0, 1, decided.astype(int)).tolist()
        return {
            "query": raw_pred.query,
            "contexts": raw_pred.contexts,
            "ranking_score": raw_pred.ranking_score,
            "predictions": by_threshold,
            "context_ranges": raw_pred.context_ranges,
            "pruning_probs": raw_pred.pruning_probs,
        }

    # --- process() --------------------------------------------------------------

    def _threshold_or_default(self, threshold: float | None) -> float:
        return self.config.resolve_threshold(threshold)

    def _prep_cell(
        self,
        query_idx: int,
        context_idx: int,
        context_entry: Any,
        title_spec: Any,
    ) -> dict[str, Any]:
        """Preprocessing unit for one (query, context) cell: title prefixes
        resolved, sentence splitting deferred. The split runs inside the
        fragmentize stage (fragmentize_jobs' own collect+normalize path) so
        it is chunked with the rest of per-cell work — lazy under the
        pipelined dispatcher and parallel under preprocess_workers — instead
        of serial up-front work that delays the first device dispatch."""
        manual: list[str] | None = None
        if isinstance(context_entry, list):
            manual = [str(s) for s in context_entry if str(s).strip()]
            text = "".join(manual)
        else:
            text = context_entry
        prefixes, title_is_first = resolve_prefix_sentences(title_spec, context_idx)
        return {
            "query_idx": query_idx,
            "context_idx": context_idx,
            "context_text": text,
            "prefix_sentences": prefixes,
            "title_is_first_sentence": title_is_first,
            "manual_sentences": manual,
        }

    def _plan_preprocessing(
        self,
        queries: list[str],
        contexts: list[list[Any]],
        titles: list[Any],
    ) -> tuple[list[dict[str, Any]], list[list[int]]]:
        """Flatten the (query, context) grid into preprocessing jobs and
        encode each query once (behavior of standalone:2436-2519).

        Nothing but the queries is tokenized here: title-prefix token counts
        are produced by each cell's fragmentize stage from the NORMALIZED
        sentence token lists (fragmentize_jobs), matching the reference's
        cached_token_lists accounting (standalone:2486-2489), and the bulk
        sentence tokenization happens there too so the pipelined dispatcher
        can start device work before later cells are even tokenized."""
        # One batched encode for every query (a per-query encode() pays the
        # Rust-call overhead len(queries) times).
        encoded_queries = [
            list(ids) for ids in tokenize_sentences(self.tokenizer, [str(q) for q in queries])
        ]
        jobs = [
            self._prep_cell(q_idx, c_idx, entry, titles[q_idx])
            for q_idx, group in enumerate(contexts)
            for c_idx, entry in enumerate(group)
        ]
        return jobs, encoded_queries

    def _cell_blocks(
        self,
        job: dict[str, Any],
        entry: dict[str, Any],
        encoded_queries: list[list[int]],
        sep_ids: list[int],
    ) -> tuple[tuple[int, int], dict[str, Any], list[dict[str, Any]]]:
        """One job's fragments → blocks + inference jobs
        (standalone:2649-2759)."""
        fragments = fragments_from_payload(entry)
        sentences: list[str] = entry.get("sentences", [])
        query_idx, context_idx = job["query_idx"], job["context_idx"]
        blocks = assemble_blocks(
            self.tokenizer,
            self.max_length,
            len(encoded_queries[query_idx]),
            len(sep_ids),
            fragments,
        )
        info = {
            "sentences": sentences,
            "fragments": fragments,
            "blocks": blocks,
            "prefix_length": len(job.get("prefix_sentences", [])),
            "prefix_sentences": job.get("prefix_sentences", []),
            "prefix_token_counts": entry.get("prefix_token_counts", []),
            "title_is_first_sentence": job.get("title_is_first_sentence", False),
            "original_text": job["context_text"],
            "raw_blocks": [],
        }
        block_work = [
            {
                "query_idx": query_idx,
                "context_idx": context_idx,
                "block_idx": block_idx,
            }
            for block_idx in range(len(blocks))
        ]
        return (query_idx, context_idx), info, block_work

    def _prepare_block(
        self,
        work: dict[str, Any],
        query_ids: list[int],
        block_fragments: list[FragmentRecord],
        start_cache: dict[int, int] | None = None,
    ) -> dict[str, Any]:
        """Host-side inputs for one block: token ids, mask, fragment token
        ranges, and fragment global ids. ``start_cache`` memoizes the
        context-start offset per query token LENGTH — the block layout
        ([specials] query [sep] context…) puts the context at an offset
        determined by the specials template and the query length alone, so
        the subsequence search runs once per distinct length, not per
        block."""
        hint = None if start_cache is None else start_cache.get(len(query_ids))
        input_ids, attention_mask, _token_type_ids, ranges = (
            self.tokenizer.prepare_block_inputs(
                query_ids,
                block_fragments,
                want_token_type_ids=False,
                context_start_hint=hint,
            )
        )
        if start_cache is not None and hint is None and ranges:
            start_cache[len(query_ids)] = int(ranges[0][0])
        return {
            "job": work,
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "ranges": ranges,
            "gids": np.array(
                [f.global_index for f in block_fragments], dtype=np.int64
            ),
        }

    def process(
        self,
        question: str | Sequence[str],
        context: Any,
        title: Any = "first_sentence",
        first_line_as_title: bool = False,
        *,
        batch_size: int | None = None,
        threshold: float | None = None,
        always_select_title: bool = False,
        reorder: bool = False,
        top_k: int | None = None,
        sentence_splitter: SentenceSplitter | Mapping[str, SentenceSplitter] | None = None,
        language: str | None = None,
        use_best_reranker_score: bool = True,
        zero_score_when_empty: bool = True,
        show_progress: bool = True,
        debug_messages: bool | Callable[[str], None] = False,
        enable_warnings: bool = True,
        strip_sentences: bool = False,
        respect_sentence_boundaries: bool = False,
        return_sentence_metrics: bool = False,
        return_sentence_texts: bool = False,
        show_inference_progress: bool | None = None,
        preprocess_workers: int | None = None,
        preprocess_batch_size: int | None = None,
        torch_dataloader_kwargs: Mapping[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Prune long contexts while preserving sentence boundaries.

        Full argument semantics match the reference's ``process()``
        (standalone:3314-3406): see that docstring for the contract.
        ``batch_size=None`` (default) auto-selects the device batch cap:
        64 on TPU (row counts pad to powers of two capped at the batch
        size, so small workloads reuse the same programs; the larger cap
        merges 33-64-block chunks into one dispatch), 32 elsewhere —
        matching the reference's explicit default of 32.
        ``preprocess_workers`` selects thread-parallel fragmentation (fast
        tokenizers release the GIL); left unset, workers and the map chunk
        size are auto-tuned from the job count and device memory with the
        reference's heuristics (standalone:2567-2623 — see
        preprocess_tuning.py). ``preprocess_batch_size`` pins the per-worker
        chunk; ``torch_dataloader_kwargs`` is accepted for drop-in
        compatibility but unused (there is no torch DataLoader here — a
        warning notes this unless ``enable_warnings=False``).
        ``enable_warnings`` gates the engine's logging-module warnings
        (counterpart of standalone:3427-3439).
        """
        warn: Callable[[str], None] = _LOG.warning if enable_warnings else (lambda _msg: None)
        if torch_dataloader_kwargs:
            warn(
                "torch_dataloader_kwargs is accepted for reference "
                "compatibility but has no effect (no torch DataLoader here)."
            )
        if batch_size is None:
            # TPU default 64: row counts are padded to powers of two capped
            # at batch_size (bucket_batch), so small workloads reuse the
            # same ≤32-row programs either way; the larger cap only merges
            # 33-64-block chunks into one dispatch, amortizing the ~1.5 ms
            # tunnel/dispatch overhead per call (measured: B64 batches
            # amortize dispatch; 256-pair e2e is dispatch-bound).
            from ..ops.attention import _default_platform

            batch_size = 64 if _default_platform() == "tpu" else 32
        batch_size = max(batch_size, 1)
        threshold = self._threshold_or_default(threshold)
        watch = _Stopwatch()
        began = perf_counter()

        splitter = resolve_sentence_splitter(sentence_splitter, language)
        emit_debug = _debug_emitter(debug_messages)
        if show_inference_progress is None:
            show_inference_progress = bool(show_progress)

        queries, contexts, structure = normalize_inputs(question, context)
        contexts, titles = resolve_titles(
            queries, contexts, title, first_line_as_title=first_line_as_title
        )
        max_fragment_tokens = max_fragment_tokens_for(
            self.max_length, respect_sentence_boundaries
        )
        sep_ids = self.tokenizer.sep_token_ids()

        watch.begin("prep")
        prep_jobs, encoded_queries = self._plan_preprocessing(queries, contexts, titles)

        def _fragmentize_chunk(jobs: list[dict[str, Any]]) -> list[dict[str, Any]]:
            return fragmentize_jobs(
                self.tokenizer,
                jobs,
                max_fragment_tokens=max_fragment_tokens,
                splitter=splitter,
                strip_sentences=strip_sentences,
                respect_sentence_boundaries=respect_sentence_boundaries,
                # "filter_only": the decoded text itself is unused here, but
                # the empty-decode filter it feeds is load-bearing —
                # fragments that decode to nothing (e.g. all-UNK) must be
                # dropped for reference keep-decision parity. This mode
                # applies the exact same filter while decoding only
                # undecidable fragments (fragmentize_jobs docstring).
                decode_fragments="filter_only",
            )

        # Thread-parallel fragmentation (the reference uses DataLoader worker
        # processes, standalone:3510-3651; HF fast tokenizers release the GIL
        # so threads suffice here). Worker count and map chunk size are
        # auto-tuned with the reference's heuristics unless pinned by
        # argument or OPEN_PROVENCE_PREPROCESS_WORKERS (standalone:2525).
        from .preprocess_tuning import (
            auto_tune_preprocess_loader,
            estimate_device_memory_bytes,
            resolve_preprocess_workers,
        )

        workers, chunk_size, _prefetch = auto_tune_preprocess_loader(
            total_jobs=len(prep_jobs),
            inference_batch_size=batch_size,
            current_workers=resolve_preprocess_workers(preprocess_workers),
            current_preprocess_batch=preprocess_batch_size,
            device_memory_bytes=estimate_device_memory_bytes(),
        )
        span = max(1, int(chunk_size or 1))
        slices = [prep_jobs[i : i + span] for i in range(0, len(prep_jobs), span)]

        def _entries():
            """Fragmentized entries in job order, yielded lazily so the
            dispatcher can put the device to work while later cells are
            still being tokenized. Each chunk is fragmentized with ONE
            tokenizer encode + ONE decode (fragmentize_jobs) — the Rust
            per-call overhead dominates per-job calls."""
            if workers > 0 and len(slices) > 1:
                from concurrent.futures import ThreadPoolExecutor

                # ThreadPoolExecutor.map ignores chunksize (it only applies
                # to process pools), so the job list is chunked by hand:
                # each worker task fragmentizes one slice.
                with ThreadPoolExecutor(max_workers=workers) as pool:
                    for batch in pool.map(_fragmentize_chunk, slices):
                        yield from batch
            else:
                for jobs in slices:
                    yield from _fragmentize_chunk(jobs)

        # Device pooling is exact only when the title-prefix offset
        # correction never applies (standalone:3075-3081) — i.e. no cell
        # in this call carries title-prefix sentences.
        use_device_pooling = self.device_pooling and all(
            not job["prefix_sentences"] for job in prep_jobs
        )
        progress = None
        if show_inference_progress:
            try:
                from tqdm import tqdm

                progress = tqdm(desc="Model inference", unit="batch", leave=False)
            except Exception:
                progress = None
        import os as _os

        # The half-size early flush only pays when later chunks are still
        # fragmentizing while the device works; with a single prep chunk all
        # entries materialize together, and splitting the batch would just run
        # two smaller (less MXU-efficient) forwards back to back.
        dispatcher = _BlockDispatcher(
            self,
            batch_size,
            use_device_pooling=use_device_pooling,
            cell_table=(cell_table := {}),
            watch=watch,
            progress=progress,
            pipeline=(
                _os.environ.get("OPEN_PROVENCE_TPU_PIPELINE", "1") != "0"
                and len(slices) > 1
            ),
        )
        context_start_cache: dict[int, int] = {}
        for job, entry in zip(prep_jobs, _entries()):
            for stage in ("sentence_collect", "sentence_normalize", "tokenize",
                          "fragment_split", "fragment_decode"):
                watch.add(stage, entry.pop(f"timing_{stage}", 0.0))
            with watch("assembly"):
                key, info, works = self._cell_blocks(
                    job, entry, encoded_queries, sep_ids
                )
                cell_table[key] = info
                prepared = [
                    self._prepare_block(
                        work,
                        encoded_queries[key[0]],
                        info["blocks"][work["block_idx"]],
                        start_cache=context_start_cache,
                    )
                    for work in works
                ]
            for block_entry in prepared:
                dispatcher.add(block_entry)
        dispatch_during_prep = watch["inference"]
        watch.end()  # close "prep"

        dispatcher.finish()
        if progress is not None:
            progress.close()
        device_seconds = watch["inference"]

        if show_progress and dispatcher.total_blocks:
            note = (
                f"[OpenProvenceModel] Model inference time: {device_seconds:.2f}s "
                f"({dispatcher.total_blocks} blocks)"
            )
            (emit_debug or (lambda m: print(m, flush=True)))(note)

        with watch("post"):
            outcomes = summarize_contexts(
                queries,
                contexts,
                cell_table,
                threshold=threshold,
                always_select_title=always_select_title,
                use_best_reranker_score=use_best_reranker_score,
                first_line_as_title=first_line_as_title,
                zero_score_when_empty=zero_score_when_empty,
            )
            if reorder:
                outcomes = reorder_outcomes(outcomes, top_k=top_k)

        trace = ProcessPerformanceTrace(
            # "prep" wraps the pipelined loop, so dispatch time that landed
            # inside it is excluded along with assembly.
            preprocess_seconds=max(
                0.0, watch["prep"] - watch["assembly"] - dispatch_during_prep
            ),
            assembly_seconds=watch["assembly"],
            inference_seconds=watch["inference"],
            postprocess_seconds=watch["post"],
            total_seconds=perf_counter() - began,
            sentence_collect_seconds=watch["sentence_collect"],
            sentence_normalize_seconds=watch["sentence_normalize"],
            tokenize_seconds=watch["tokenize"],
            fragment_split_seconds=watch["fragment_split"],
            fragment_decode_seconds=watch["fragment_decode"],
        )
        if emit_debug is not None:
            emit_debug(f"[OpenProvenceModel] {trace.timing_line()}")

        payload = build_payload(
            structure,
            outcomes,
            include_sentence_texts=return_sentence_texts,
            include_sentence_probs=return_sentence_metrics,
        )
        payload["timing"] = trace.as_dict()
        payload["performance_trace"] = trace
        return payload
