"""Node classification task.

TPU-native rebuild of the reference task layer
(``SSRG/tasks/node_classification.py:13-146`` + the train/eval steps in
``tasks/utils.py:105-161``; SURVEY.md §2.7, §3.1): preprocess (normalize →
K-hop propagate → aggregate) runs once as compiled device code; training is a
jitted optax step over the precomputed features; the best-val→test protocol
and multi-run mean±std match the reference exactly.

Differences by design:
- Preprocessing produces a stacked hop tensor on device via ``lax.scan`` —
  no ctypes, no per-epoch host↔device feature copies (the reference moves
  ``processed_feature[idx]`` H2D every step, ``base_model.py:84-87``).
- Mini-batches are static-shape index gathers (padded last batch) so the
  whole epoch runs through one compiled step function.
- ``normalize_times`` repeats re-initialize parameters per run (the reference
  silently continues training the same parameters across repeats).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
from ssrg_tpu.models.zoo import ModelSpec, PrecomputeModel
from ssrg_tpu.ops.combine import make_message_op
from ssrg_tpu.ops.propagate import propagate
from ssrg_tpu.ops.sparse import device_adjacency
from ssrg_tpu.train.common import (
    TrainState,
    accuracy,
    batch_iterator,
    create_train_state,
    cross_entropy_loss,
    seed_everything,
)


@dataclass
class Prepared:
    """Result of the preprocess phase (reference base_model.preprocess)."""

    module: PrecomputeModel
    inputs: jnp.ndarray            # [N, D] or hop stack [K+1, N, F]
    hops_layout: bool              # True when inputs is the hop stack
    adj_device: Any = None         # device adjacency for naive GCN / (phi, phi_inv)
    preprocess_seconds: float = 0.0
    # resolved basic engine name (meta-engines "autotune"/"reorder_banded"
    # resolved to a concrete format) — consumers that build further device
    # adjacencies (postprocess label-prop, serving) must use this, not the
    # raw cfg.spmm_engine string
    engine: str = "auto"


def prepare(
    spec: ModelSpec,
    dataset,
    model_cfg: ModelConfig,
    training_cfg: TrainingConfig,
) -> Prepared:
    """Run the one-time precompute: adjacency normalization (host), K-hop
    propagation (device), and non-learnable aggregation (device)."""
    if not isinstance(spec, ModelSpec):
        raise TypeError(
            f"expected a ModelSpec (from ssrg_tpu.models.load_model), got "
            f"{type(spec).__name__}; did you pass the ModelConfig instead?"
        )
    t0 = time.time()
    x = jnp.asarray(dataset.x, dtype=jnp.float32)
    engine = training_cfg.spmm_engine
    if engine == "autotune":
        from ssrg_tpu.ops.autotune import autotune_engine

        engine, _ = autotune_engine(dataset.adj, x.shape[1])
    # the reorder meta-engines apply to the hop-precompute path only (the
    # reorder is undone on the hop stack); naive/spectral/tuple paths fall
    # back to auto
    is_meta = engine in ("reorder_banded", "reorder_tiled")
    basic_engine = "auto" if is_meta else engine

    def _warn_meta_degrade(path: str) -> None:
        # observability for the silent degrade (round-3 weak #3): a user
        # benchmarking e.g. GCN with --spmm_engine reorder_tiled gets hybrid
        # and must be told, like the banded-fallback warning below
        if is_meta:
            from ssrg_tpu.logger import get_logger

            get_logger().warning(
                "spmm_engine=%s only applies to hop-precompute models; the "
                "%s path for model %r uses engine='auto' instead",
                engine, path, model_cfg.model_name,
            )

    if spec.spectral:
        _warn_meta_degrade("spectral")
        from ssrg_tpu.models.wavelet import prepare_spectral

        phi, phi_inv = prepare_spectral(
            dataset.adj, model_cfg.wavelet, engine=basic_engine
        )
        module = spec.module
        return Prepared(module, x, False, adj_device=(phi, phi_inv),
                        preprocess_seconds=time.time() - t0,
                        engine=basic_engine)

    if spec.naive:
        _warn_meta_degrade("naive")
        adj_norm = spec.construct_adj(dataset.adj, model_cfg)
        adj_dev = device_adjacency(adj_norm, basic_engine)
        return Prepared(spec.module, x, False, adj_device=adj_dev,
                        preprocess_seconds=time.time() - t0,
                        engine=basic_engine)

    if spec.graph_op is None:
        _warn_meta_degrade("featureless")
        return Prepared(spec.module, x, False,
                        preprocess_seconds=time.time() - t0,
                        engine=basic_engine)

    adj_norm = spec.construct_adj(dataset.adj, model_cfg)
    if isinstance(adj_norm, tuple):
        _warn_meta_degrade("tuple-adjacency")
        devs = tuple(device_adjacency(a, basic_engine) for a in adj_norm)
        if spec.graph_op in ("magnetic", "magnetic_ppr"):
            # complex propagation; "last" aggregate over the (re, im) pair
            from ssrg_tpu.ops.propagate import propagate_complex

            re_hops, im_hops = propagate_complex(
                devs[0], devs[1], x, spec.prop_steps
            )
            inputs = (re_hops[-1], im_hops[-1])
        else:
            # two_dir triple / two_order pair: last hop of each, concatenated
            from ssrg_tpu.ops.propagate import propagate_multi

            hop_stacks = propagate_multi(devs, x, spec.prop_steps)
            inputs = jnp.concatenate([h[-1] for h in hop_stacks], axis=-1)
        jax.tree_util.tree_leaves(inputs)[0].block_until_ready()
        return Prepared(spec.module, inputs, False,
                        preprocess_seconds=time.time() - t0,
                        engine=basic_engine)
    from ssrg_tpu.cache import cached_propagate

    if engine in ("reorder_banded", "reorder_tiled"):
        # Locality meta-engines: renumber nodes so the adjacency becomes
        # banded (RCM) or cluster-diagonal (label-propagation communities),
        # propagate on the corresponding dense-block MXU engine, and
        # un-permute the hop stack back to original node order (downstream
        # slicing/splits are unaffected).
        from ssrg_tpu.ops.reorder import apply_permutation, reorder_permutation

        if engine == "reorder_banded":
            # same banded storage, two execution strategies: the window-DMA
            # Pallas kernel measured 1.57x the XLA dynamic-slice scan on the
            # chip (benchmarks/banded_kernel_bench.py); interpret mode on CPU
            # is correct but slow, so CPU keeps the XLA engine
            method = "rcm"
            dense_engine = (
                "banded" if jax.default_backend() == "cpu" else "pallas_banded"
            )
        else:
            method = "cluster"
            dense_engine = "tiled"
        merge_target = (
            training_cfg.cluster_merge_target if engine == "reorder_tiled"
            else 0
        )
        engine_kwargs: dict = {}
        if training_cfg.spmm_bf16:
            # the measured-fastest tier (docs/PERFORMANCE.md round-3 push):
            # bf16 block/tile storage; the Pallas kernel additionally stages
            # the X window in bf16 over 512-row blocks
            engine_kwargs["dtype"] = jnp.bfloat16
            if dense_engine == "pallas_banded":
                engine_kwargs.update(window_bf16=True, row_block=512)
            elif dense_engine == "tiled":
                # the user opted into bf16 rounding on the precompute: run
                # the scatter-free one-hot rest with a bf16 slab — the
                # measured round-5 composite winner (273 M edges/s at
                # nested products vs 186 M with blockcoo), with half the
                # slab HBM of the f32 variant (docs/PERFORMANCE.md)
                engine_kwargs["rest_engine"] = "onehot"
                engine_kwargs["rest_gather_bf16"] = True
        perm = reorder_permutation(adj_norm, method,
                                   merge_target=merge_target)
        adj_p, x_p, _, inverse = apply_permutation(
            adj_norm, perm, np.asarray(dataset.x)
        )
        try:
            hops_p = cached_propagate(
                adj_p, x_p, spec.prop_steps,
                training_cfg.cache_dir, dense_engine,
                tag=f"{spec.graph_op}:{model_cfg.r}:{method}"
                    + (f":mt{merge_target}" if merge_target else "")
                    + (":bf16" if training_cfg.spmm_bf16 else ""),
                engine_kwargs=engine_kwargs,
            )
            hops = jnp.take(hops_p, jnp.asarray(inverse), axis=1)
        except ValueError as exc:
            from ssrg_tpu.logger import get_logger

            get_logger().warning(
                "%s fell back to hybrid: %s", engine, exc
            )
            hops = cached_propagate(
                adj_norm, np.asarray(dataset.x), spec.prop_steps,
                training_cfg.cache_dir, "hybrid",
                tag=f"{spec.graph_op}:{model_cfg.r}",
            )
    else:
        hops = cached_propagate(
            adj_norm, np.asarray(dataset.x), spec.prop_steps,
            training_cfg.cache_dir, engine,
            tag=f"{spec.graph_op}:{model_cfg.r}",
        )
    hops.block_until_ready()

    if spec.pre_msg_learnable:
        # aggregation is trainable: runs per-batch inside forward
        return Prepared(spec.module, hops, True,
                        preprocess_seconds=time.time() - t0,
                        engine=basic_engine)

    # aggregate now, once (reference base_model.py:38-44)
    msg = spec.module.msg_op
    if msg is not None:
        variables = msg.init(jax.random.PRNGKey(0), hops)
        aggregated = msg.apply(variables, hops)
        module = spec.module.clone(msg_op=None)
    else:
        aggregated, module = hops[-1], spec.module
    aggregated.block_until_ready()
    return Prepared(module, aggregated, False,
                    preprocess_seconds=time.time() - t0,
                    engine=basic_engine)


def slice_inputs(prepared: "Prepared", idx):
    """Select the rows of a ``Prepared.inputs`` payload for node ids ``idx``,
    handling the three layouts: complex (re, im) tuple, hop stack
    ``[K+1, N, F]``, and aggregated ``[N, D]``. Shared by the training task
    and the serving Predictor."""
    inp = prepared.inputs
    if isinstance(inp, tuple):  # complex (re, im) pair
        return tuple(part[idx] for part in inp)
    if prepared.hops_layout:
        return inp[:, idx]
    return inp[idx]


def _make_step_fns(module: PrecomputeModel, adj_device, has_bn: bool):
    """Build jitted train/eval steps. ``idx`` (when not None) selects logits
    after a full-graph forward (naive GCN / spectral); otherwise inputs are
    already the batch rows."""

    # NOTE: the adjacency flows through the jitted steps as an ARGUMENT
    # (bound with functools.partial below), never as a closure capture:
    # captured device arrays are inlined into the HLO as constants, which
    # bloats compilation and overflows remote-compile request limits on
    # tunneled backends (observed: HTTP 413 at ~0.8 GB of constants).
    def forward(adj, params, batch_stats, inputs, train, rng):
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = batch_stats
        kwargs = {"train": train}
        if adj is not None:
            kwargs["adj"] = adj
        out = module.apply(
            variables,
            inputs,
            rngs={"dropout": rng} if train else None,
            mutable=["batch_stats"] if (train and has_bn) else False,
            **kwargs,
        )
        if train and has_bn:
            logits, new_vars = out
            return logits, new_vars["batch_stats"]
        return out, batch_stats

    @jax.jit
    def train_step(adj, state: TrainState, inputs, labels, weights, idx, rng):
        def loss_fn(params):
            logits, new_bs = forward(
                adj, params, state.batch_stats, inputs, True, rng
            )
            if idx is not None:
                logits = logits[idx]
            loss = cross_entropy_loss(logits, labels, weights)
            return loss, (logits, new_bs)

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if has_bn:
            state = state.replace(batch_stats=new_bs)
        return state, loss, accuracy(logits, labels)

    @jax.jit
    def eval_step(adj, state: TrainState, inputs, labels, idx):
        logits, _ = forward(
            adj, state.params, state.batch_stats, inputs, False, None
        )
        if idx is not None:
            logits = logits[idx]
        return accuracy(logits, labels), logits

    # raw fns (adjacency as explicit first arg) are also returned so callers
    # composing larger jitted programs (the epoch-scan trainer) can pass the
    # adjacency through their own argument list instead of re-capturing it
    return (
        partial(train_step, adj_device),
        partial(eval_step, adj_device),
        train_step,
        eval_step,
    )


class NodeClassification:
    """Train/eval orchestrator with the reference protocol:
    best-val→test selection, optional post-propagation, multi-run mean±std
    (``tasks/node_classification.py:45-119``)."""

    def __init__(
        self,
        dataset,
        spec: ModelSpec,
        model_cfg: ModelConfig,
        training_cfg: TrainingConfig,
        post_graph_op: Optional[str] = None,
        post_msg_aggr: str = "mean",
        verbose: bool = False,
        run: bool = True,
    ):
        self.dataset = dataset
        self.spec = spec
        self.model_cfg = model_cfg
        self.cfg = training_cfg
        self.post_graph_op = post_graph_op
        self.post_msg_aggr = post_msg_aggr
        self.verbose = verbose
        self.record = {"val_acc": [], "test_acc": []}

        self.labels = jnp.asarray(dataset.y)
        self.train_idx = np.asarray(dataset.train_idx)
        self.val_idx = np.asarray(dataset.val_idx)
        self.test_idx = np.asarray(dataset.test_idx)

        self.prepared = prepare(spec, dataset, model_cfg, training_cfg)
        if run:
            for i in range(training_cfg.normalize_times):
                self.execute(seed=training_cfg.seed + i)
            if training_cfg.normalize_times > 1 and verbose:
                v, t = self.record["val_acc"], self.record["test_acc"]
                print(
                    f"Mean Val ± Std Val: {np.mean(v):.4f}±{np.std(v, ddof=1):.4f}, "
                    f"Mean Test ± Std Test: {np.mean(t):.4f}±{np.std(t, ddof=1):.4f}"
                )

    # -- public results ----------------------------------------------------

    @property
    def best_val(self) -> float:
        return float(np.mean(self.record["val_acc"]))

    @property
    def best_test(self) -> float:
        return float(np.mean(self.record["test_acc"]))

    def get_test_acc(self) -> float:
        return self.best_test

    # -- internals ---------------------------------------------------------

    def _slice_inputs(self, idx):
        return slice_inputs(self.prepared, idx)

    def _batched_eval(self, state, eval_step, idx, batch_size) -> float:
        """Memory-bounded evaluation: static-shape batches with padded tail
        (reference node_cls_mini_batch_evaluate, tasks/utils.py:114-129)."""
        correct = 0.0
        total = 0.0
        rng = np.random.default_rng(0)
        for batch, w in batch_iterator(
            np.asarray(idx), batch_size, rng, shuffle=False
        ):
            _, logits = eval_step(
                state, self._slice_inputs(batch), self.labels[batch], None
            )
            pred = np.argmax(np.asarray(logits), axis=1)
            labels = np.asarray(self.labels)[batch]
            correct += float(((pred == labels) * w).sum())
            total += float(w.sum())
        return correct / max(total, 1.0)

    def execute(self, seed: int = 2023) -> Tuple[float, float]:
        p = self.prepared
        cfg = self.cfg
        rng = seed_everything(seed)
        np_rng = np.random.default_rng(seed)

        init_inputs = (
            self._slice_inputs(self.train_idx[:2])
            if p.adj_device is None
            else p.inputs
        )
        init_kwargs = {"adj": p.adj_device} if p.adj_device is not None else {}
        rng, init_rng = jax.random.split(rng)
        state = create_train_state(
            p.module, init_rng, init_inputs, cfg.lr, cfg.weight_decay,
            warmup_epochs=cfg.warmup_epochs, **init_kwargs
        )
        if cfg.resume_from:
            from ssrg_tpu.cache import load_metadata, load_params

            meta = load_metadata(cfg.resume_from) or {}
            if meta.get("has_bn"):
                restored = load_params(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    cfg.resume_from,
                )
                state = state.replace(
                    params=restored["params"],
                    batch_stats=restored["batch_stats"],
                )
            else:
                state = state.replace(
                    params=load_params(state.params, cfg.resume_from)
                )
        has_bn = state.batch_stats is not None
        # build the jitted step fns ONCE per task: rebuilding them each
        # execute() would retrace/recompile on every normalize_times run
        if getattr(self, "_step_fns", None) is None:
            self._step_fns = _make_step_fns(p.module, p.adj_device, has_bn)
        train_step, eval_step, train_step_raw, eval_step_raw = self._step_fns

        full_graph = p.adj_device is not None
        if full_graph:
            train_in = val_in = test_in = p.inputs
            train_sel = jnp.asarray(self.train_idx)
            val_sel = jnp.asarray(self.val_idx)
            test_sel = jnp.asarray(self.test_idx)
        else:
            train_in = self._slice_inputs(self.train_idx)
            val_in = self._slice_inputs(self.val_idx)
            test_in = self._slice_inputs(self.test_idx)
            train_sel = val_sel = test_sel = None

        y_train = self.labels[self.train_idx]
        y_val = self.labels[self.val_idx]
        y_test = self.labels[self.test_idx]

        best_val = best_test = 0.0
        minibatch = cfg.train_batch_size is not None and not full_graph

        use_scan = (
            cfg.scan_epochs
            and not minibatch
            and not has_bn
            and (cfg.eval_batch_size is None or full_graph)
        )
        if cfg.scan_epochs and not use_scan:
            from ssrg_tpu.logger import get_logger

            why = (
                "minibatch training (train_batch_size set)" if minibatch
                else "BatchNorm model (mutable batch_stats)" if has_bn
                else "batched evaluation (eval_batch_size set)"
            )
            get_logger().warning(
                "scan_epochs requested but falling back to the host epoch "
                "loop: %s is not scan-eligible", why,
            )
        if use_scan:
            state, best_val, best_test, best_params, best_epoch, history = (
                self._execute_scanned(
                    state, train_step_raw, eval_step_raw,
                    train_in, y_train, train_sel,
                    val_in, y_val, val_sel,
                    test_in, y_test, test_sel,
                    rng,
                )
            )
            if self.verbose and cfg.normalize_times == 1:
                for epoch, (loss, av, at) in enumerate(zip(*history)):
                    print(
                        f"Epoch: {epoch + 1:03d}, loss_train: {loss:.4f}, "
                        f"acc_val: {av:.4f}, acc_test: {at:.4f}"
                    )
            if cfg.checkpoint_path:
                from ssrg_tpu.cache import save_params

                save_params(
                    best_params, cfg.checkpoint_path,
                    metadata={
                        "epoch": best_epoch + 1, "val_acc": best_val,
                        "test_acc": best_test, "model": self.spec.name,
                        "has_bn": False,  # scan path requires BN-free models
                    },
                )
            if self.post_graph_op is not None:
                acc_val, acc_test = self._postprocess(state, eval_step)
                if acc_val > best_val:
                    best_val, best_test = acc_val, acc_test
            self.record["val_acc"].append(best_val)
            self.record["test_acc"].append(best_test)
            self.state = state
            return best_val, best_test

        for epoch in range(cfg.num_epochs):
            rng, step_rng = jax.random.split(rng)
            if minibatch:
                losses = []
                for batch, w in batch_iterator(
                    self.train_idx, cfg.train_batch_size, np_rng
                ):
                    rng, step_rng = jax.random.split(rng)
                    state, loss, _ = train_step(
                        state,
                        self._slice_inputs(batch),
                        self.labels[batch],
                        jnp.asarray(w),
                        None,
                        step_rng,
                    )
                    losses.append(float(loss))
                loss = float(np.mean(losses))
            else:
                state, loss, _ = train_step(
                    state, train_in, y_train, None, train_sel, step_rng
                )
            if cfg.eval_batch_size is not None and not full_graph:
                acc_val = self._batched_eval(
                    state, eval_step, self.val_idx, cfg.eval_batch_size
                )
                acc_test = self._batched_eval(
                    state, eval_step, self.test_idx, cfg.eval_batch_size
                )
            else:
                acc_val = float(eval_step(state, val_in, y_val, val_sel)[0])
                acc_test = float(eval_step(state, test_in, y_test, test_sel)[0])
            if self.verbose and cfg.normalize_times == 1:
                print(
                    f"Epoch: {epoch + 1:03d}, loss_train: {float(loss):.4f}, "
                    f"acc_val: {acc_val:.4f}, acc_test: {acc_test:.4f}"
                )
            if acc_val > best_val:
                best_val, best_test = acc_val, acc_test
                if cfg.checkpoint_path:
                    from ssrg_tpu.cache import save_params

                    # BN models must checkpoint their running statistics too
                    payload = (
                        {"params": state.params,
                         "batch_stats": state.batch_stats}
                        if has_bn else state.params
                    )
                    save_params(
                        payload, cfg.checkpoint_path,
                        metadata={
                            "epoch": epoch + 1, "val_acc": best_val,
                            "test_acc": best_test, "model": self.spec.name,
                            "has_bn": has_bn,
                        },
                    )

        if self.post_graph_op is not None:
            acc_val, acc_test = self._postprocess(state, eval_step)
            if acc_val > best_val:
                best_val, best_test = acc_val, acc_test

        self.record["val_acc"].append(best_val)
        self.record["test_acc"].append(best_test)
        self.state = state
        return best_val, best_test

    def _execute_scanned(
        self, state, train_step_raw, eval_step_raw,
        train_in, y_train, train_sel, val_in, y_val, val_sel,
        test_in, y_test, test_sel, rng,
    ):
        """Whole-training-run-in-one-dispatch: ``lax.scan`` over epochs with
        train step + val/test eval + device-side best-val/param tracking.

        The idiomatic TPU trainer shape: one compiled program, no per-epoch
        host round-trips (the reference's epoch loop is host-driven,
        ``tasks/node_classification.py:72-92``; on a high-RTT backend the
        host loop pays ~4 dispatches/epoch). Params are tiny MLP heads, so
        carrying a best-params copy costs nothing."""
        p = self.prepared
        num_epochs = self.cfg.num_epochs
        adj = p.adj_device

        # the jitted runner is built ONCE per task (cached on self): a fresh
        # function object per execute() would retrace on every run
        if getattr(self, "_scan_runner", None) is None:

            @partial(jax.jit, static_argnames=("epochs",))
            def run(adj, state, train_in, y_train, train_sel, val_in, y_val,
                    val_sel, test_in, y_test, test_sel, rng0, epochs):
                def epoch(carry, i):
                    state, best_val, best_test, best_params, best_epoch = carry
                    step_rng = jax.random.fold_in(rng0, i)
                    state, loss, _ = train_step_raw(
                        adj, state, train_in, y_train, None, train_sel,
                        step_rng,
                    )
                    acc_val, _ = eval_step_raw(
                        adj, state, val_in, y_val, val_sel
                    )
                    acc_test, _ = eval_step_raw(
                        adj, state, test_in, y_test, test_sel
                    )
                    better = acc_val > best_val
                    best_val = jnp.where(better, acc_val, best_val)
                    best_test = jnp.where(better, acc_test, best_test)
                    best_epoch = jnp.where(better, i, best_epoch)
                    best_params = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(better, a, b),
                        state.params, best_params,
                    )
                    return (
                        (state, best_val, best_test, best_params, best_epoch),
                        (loss, acc_val, acc_test),
                    )

                init = (
                    state, jnp.float32(0.0), jnp.float32(0.0), state.params,
                    jnp.int32(0),
                )
                carry, history = jax.lax.scan(
                    epoch, init, jnp.arange(epochs), length=epochs
                )
                return carry, history

            self._scan_runner = run

        (state, bv, bt, best_params, best_epoch), history = self._scan_runner(
            adj, state, train_in, y_train, train_sel, val_in, y_val, val_sel,
            test_in, y_test, test_sel, rng, num_epochs,
        )
        history = tuple(np.asarray(h) for h in history)
        return (
            state, float(bv), float(bt),
            jax.device_get(best_params), int(best_epoch), history,
        )

    def _postprocess(self, state, eval_step) -> Tuple[float, float]:
        """Label-propagation postprocess: re-propagate softmax outputs through
        a (non-learnable) post graph op and re-score
        (reference ``base_model.postprocess`` + task ``postprocess``,
        ``node_classification.py:121-146``). Runs on device, unlike the
        reference's CPU numpy detour."""
        from ssrg_tpu.models.zoo import GRAPH_OPS

        p = self.prepared
        all_idx = np.arange(self.dataset.num_node)
        if p.adj_device is not None:
            _, logits = eval_step(state, p.inputs, self.labels, jnp.asarray(all_idx))
        else:
            _, logits = eval_step(
                state, self._slice_inputs(all_idx), self.labels, None
            )
        probs = jax.nn.softmax(logits, axis=1)
        post_adj = GRAPH_OPS[self.post_graph_op](self.dataset.adj, self.model_cfg)
        # p.engine is the RESOLVED engine: cfg.spmm_engine may be a
        # meta-engine ("autotune"/"reorder_banded"/"reorder_tiled") that device_adjacency
        # does not accept
        post_dev = device_adjacency(post_adj, p.engine)
        hops = propagate(post_dev, probs, self.spec.prop_steps)
        msg = make_message_op(self.post_msg_aggr)
        out = msg.apply(msg.init(jax.random.PRNGKey(0), hops), hops)
        val_acc = accuracy(out[self.val_idx], self.labels[self.val_idx])
        test_acc = accuracy(out[self.test_idx], self.labels[self.test_idx])
        return float(val_acc), float(test_acc)
