"""Solver base: config handling, checkpoint/tracker/logger plumbing.

Parity with the reference Solver (src/trainer.py:33-195): per-module
checkpoint paths under ``<ckpdir>/<name>/``, a resumable ``tracker.json``,
per-module log streams, config defaulting via ``set_if_exists``, and the
``genpath`` in/out checkpoint-relay helper used for cross-trainer parameter
sharing.  Device selection is replaced by JAX's backend (TPU when present;
the mesh wiring lives in ss_asr_tpu.parallel).
"""

from __future__ import annotations

import os
from types import SimpleNamespace
from typing import Callable, Optional, Tuple

import jax

from ss_asr_tpu.utils import checkpoint as ckpt
from ss_asr_tpu.utils.logging import MetricLogger
from ss_asr_tpu.utils.tracker import Tracker


def make_solver_mesh(config: dict):
    """Build the (data x model) mesh from the ``parallel`` config section.

    ``n_data: auto`` uses every visible device (divided by ``n_model`` when
    tensor parallelism is on); ``n_data: 1`` (default) keeps the
    single-device jit path. Returns None when no mesh is needed, so the
    degenerate case has zero sharding machinery in it (SURVEY §2.3: single
    device is the 1-chip case of the mesh design).
    """
    par = config.get("parallel") or {}
    n_data = par.get("n_data", 1)
    n_model = int(par.get("n_model", 1))
    if n_data in ("auto", -1):
        n_data = max(len(jax.devices()) // n_model, 1)
    n_data = int(n_data)
    if n_data * n_model <= 1:
        return None
    from ss_asr_tpu.parallel import mesh as pmesh

    return pmesh.make_mesh(n_data=n_data, n_model=n_model)


def make_paras(
    name: str = "experiment_1",
    logdir: str = "runs/",
    ckpdir: str = "result/",
    seed: int = 1,
    verbose: bool = True,
) -> SimpleNamespace:
    return SimpleNamespace(name=name, logdir=logdir, ckpdir=ckpdir, seed=seed, verbose=verbose)


class Solver:
    def __init__(self, config: dict, paras, module_id: str):
        self.config = config
        self.paras = paras
        self.module_id = module_id

        self.ckpdir = os.path.join(paras.ckpdir, paras.name)
        os.makedirs(self.ckpdir, exist_ok=True)

        # multi-host: only process 0 writes tracker.json / npz checkpoints —
        # N processes sharing one ckpdir must not race on the same files
        # (every process still tracks the state in memory; steps are
        # host-consistent because all hosts dispatch the same step count)
        self.is_writer = jax.process_index() == 0
        self.tr = Tracker(
            os.path.join(self.ckpdir, "tracker.json"), module_id,
            writer=self.is_writer,
        )
        # metric streams are per-process too: non-zero processes write into a
        # rank subdirectory so N hosts sharing one logdir never interleave
        # into the same metrics.jsonl / tfevents files
        log_dir = os.path.join(paras.logdir, paras.name, module_id)
        if not self.is_writer:
            log_dir = os.path.join(log_dir, f"rank{jax.process_index()}")
        self.lg = MetricLogger(log_dir, module_id)

        # checkpoint backend: flat .npz per module (reference layout parity,
        # src/trainer.py:58-71) or orbax directories (sharded/multi-host
        # safe) via a top-level `checkpoint_backend: orbax` config key.
        # Optimizer state stays npz: its NamedTuple treedef is rebuilt from a
        # fresh init at load (see checkpoint.load_opt_state).
        backend = config.get("checkpoint_backend", "npz")
        self.ckpt_ext = ckpt.ORBAX_SUFFIX if backend == "orbax" else ".npz"
        self.ckppath = os.path.join(self.ckpdir, module_id + self.ckpt_ext)
        self.best_ckppath = os.path.join(self.ckpdir, module_id + "_best" + self.ckpt_ext)
        self.opt_ckppath = os.path.join(self.ckpdir, module_id + "_opt.npz")

        # multi-chip: a (data x model) mesh; None = single-device jit (the
        # degenerate case). Config:
        #   parallel: {n_data: auto | <int>, n_model: <int>}
        # n_model > 1 = tensor parallelism of the wide gate/projection
        # matmuls, jit+GSPMD path (ASR trainer; the aux models are too small
        # to shard and assert n_model == 1).
        self.mesh = make_solver_mesh(config)
        self.n_model = int((config.get("parallel") or {}).get("n_model", 1))

        # multi-host input pipeline (SURVEY §2.3: "host data loading sharded
        # per-process"): each process reads a strided shard of the training
        # index. Auto-derived from jax.distributed when multiple processes
        # exist; overridable as parallel: {host_shard: [host_id, num_hosts]}
        # (also how single-process tests exercise the path).
        par = config.get("parallel") or {}
        hs = par.get("host_shard")
        if hs is not None:
            self.host_shard: Optional[Tuple[int, int]] = (int(hs[0]), int(hs[1]))
        elif jax.process_count() > 1:
            self.host_shard = (jax.process_index(), jax.process_count())
        else:
            self.host_shard = None

        # keep_snapshots: K > 0 additionally retains the K most recent
        # step-stamped checkpoints (<module_id>.snap-<step>.npz) on every
        # cadence save, enabling checkpoint averaging at decode time
        # (utils/checkpoint.average_pytrees, cli/avg_ckpt.py). Default off:
        # the reference keeps only latest+best (src/trainer.py:448-451).
        self.keep_snapshots = int(self.set_if_exists("keep_snapshots", 0))
        self.valid_step = self.set_if_exists("valid_step", 500)
        self.logging_step = self.set_if_exists("logging_step", 250)
        self.save_step = self.set_if_exists("save_step", 1000)
        self.n_epochs = self.set_if_exists("n_epochs", 5)
        self.train_batch_size = self.set_if_exists("train_batch_size", 32)
        self.valid_batch_size = self.set_if_exists("valid_batch_size", 32)
        self.test_batch_size = self.set_if_exists("test_batch_size", 1)

        # stable per-module seed offset (python hash() is process-salted,
        # which would make runs non-reproducible)
        import zlib

        offset = zlib.crc32(module_id.encode()) % 2**16
        self._key = jax.random.key(int(getattr(paras, "seed", 1)) + offset)
        self.verbose_summary()

    # ------------------------------------------------------------------
    def next_key(self) -> jax.Array:
        self._key, k = jax.random.split(self._key)
        return k

    def set_if_exists(self, key: str, default):
        section = self.config.get(self.module_id, {})
        return section.get(key, default)

    def verbose(self, msg, progress: bool = False) -> None:
        if not getattr(self.paras, "verbose", True):
            return
        if progress:
            print(str(msg) + " " * 10, end="\r")
        else:
            print(f"[INFO ({self.module_id} / {self.paras.name})] {msg}")

    def verbose_summary(self) -> None:
        self.verbose("-------SUMMARY-------")
        self.verbose(f"Current step : {self.tr.step}")
        self.verbose(f"Best metric value : {self.tr.get_best()}")
        self.verbose(f"Number of epochs: {self.n_epochs}")
        self.verbose(
            f"Steps: [Logging {self.logging_step}], [Saving {self.save_step}], "
            f"[Validation {self.valid_step}]"
        )
        self.verbose(
            f"Batch sizes: [Train {self.train_batch_size}], "
            f"[Validation {self.valid_batch_size}], [Testing {self.test_batch_size}]"
        )
        self.verbose("---------------------")

    # ------------------------------------------------------------------
    def setup_params(self, init_fn: Callable[[jax.Array], dict], ckp_path: str) -> dict:
        """Init a param tree, loading the checkpoint at ckp_path if present.

        A loaded tree is validated against the config's shapes (via
        ``jax.eval_shape`` — no compute): a stale checkpoint from a
        different model size otherwise surfaces hundreds of frames deep as
        a dot_general shape error inside the forward pass."""
        if ckpt.exists_auto(ckp_path):
            self.verbose(f"Loading a pretrained model from {ckp_path}")
            import jax.numpy as jnp

            loaded = jax.tree.map(jnp.asarray, ckpt.load_auto(ckp_path))
            want = jax.eval_shape(init_fn, jax.random.key(0))
            if jax.tree.structure(loaded) != jax.tree.structure(want):
                raise ValueError(
                    f"checkpoint {ckp_path} does not match the model config "
                    "(different parameter tree — wrong mdl section or a "
                    "checkpoint from another model?); delete the ckpdir or "
                    "fix the config"
                )
            for (path, have), exp in zip(
                jax.tree_util.tree_leaves_with_path(loaded),
                jax.tree.leaves(want),
            ):
                if have.shape != exp.shape:
                    keys = jax.tree_util.keystr(path)
                    raise ValueError(
                        f"checkpoint {ckp_path} does not match the model "
                        f"config: leaf {keys} has shape {have.shape}, the "
                        f"config expects {exp.shape}; delete the ckpdir or "
                        "fix the mdl section"
                    )
            self.loaded_ckpt = True
            return loaded
        self.verbose(f"No model found at {ckp_path}. A new model will be created")
        self.loaded_ckpt = False
        return init_fn(self.next_key())

    def place_batch(self, tree):
        """Device-place one batch: sharded over the data axis under a mesh,
        plain transfer otherwise.

        Multi-host: each process holds only its host-shard's rows, so the
        global array is assembled with
        ``jax.make_array_from_process_local_data`` — the per-host batch is
        this process's slice of a (train_batch_size * process_count)-row
        global batch. Single-host device_put of local data onto a global
        mesh would silently drop every other host's rows.
        """
        import jax.numpy as jnp

        if self.mesh is None:
            return jax.tree.map(jnp.asarray, tree)
        from ss_asr_tpu.parallel import mesh as pmesh

        if jax.process_count() > 1:
            import numpy as np

            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    pmesh.batch_sharding(self.mesh, np.ndim(x)), np.asarray(x)
                ),
                tree,
            )
        return pmesh.shard_batch(tree, self.mesh)

    def to_local(self, arr):
        """Host-local numpy rows of a batch-sharded step output.

        Single-process: plain ``np.asarray``. Multi-host: the step outputs
        are global arrays sharded over DATA_AXIS and span non-addressable
        (other-process) devices, which ``np.asarray`` refuses to fetch —
        gather only this process's shards (exactly the rows this host
        contributed via ``place_batch``) in index order, so the result
        lines up with the host-local batch's labels.
        """
        import numpy as np

        if self.mesh is None or jax.process_count() == 1:
            return np.asarray(arr)
        if arr.is_fully_replicated:
            return np.asarray(arr)
        # General reconstruction from the addressable shards: under tensor
        # parallelism outputs can be sharded on trailing dims too (e.g.
        # logits P(data, None, model)), so every shard is written into its
        # full index slot — a batch-axis-only dedup would silently DROP the
        # other model-axis slices. This process's rows must be contiguous
        # along axis 0 (true for meshes built by make_mesh from the default
        # device order); asserted below instead of assumed, since a custom
        # device order would otherwise silently misalign gathered rows with
        # host-local labels.
        shards = list(arr.addressable_shards)
        offset = min((s.index[0].start or 0) for s in shards)
        n_rows = max(
            (s.index[0].stop if s.index[0].stop is not None else arr.shape[0])
            for s in shards
        ) - offset
        spans = sorted(
            {((s.index[0].start or 0),
              (s.index[0].stop if s.index[0].stop is not None else arr.shape[0]))
             for s in shards}
        )
        covered = offset
        for start, stop in spans:
            if start > covered:
                raise AssertionError(
                    "to_local: this process's batch rows are not contiguous "
                    f"along axis 0 (spans {spans}); use the default device "
                    "order from parallel.mesh.make_mesh"
                )
            covered = max(covered, stop)
        assert covered == offset + n_rows
        out = np.zeros((n_rows,) + arr.shape[1:], dtype=arr.dtype)
        for s in shards:
            idx = tuple(s.index)
            r = idx[0]
            rs = slice(
                (r.start or 0) - offset,
                (r.stop if r.stop is not None else arr.shape[0]) - offset,
            )
            out[(rs,) + idx[1:]] = np.asarray(s.data)
        return out

    def global_min_batches(self, n: int) -> int:
        """The number of train steps EVERY process can dispatch this epoch.

        Multi-host index shards can differ by one row (strided split) and
        per-host bucketing can pack equal rows into different batch counts;
        a host entering a collective train step the others never reach
        would hang the job on the cross-process pmean. All processes agree
        on the minimum; single-process returns ``n`` unchanged.
        """
        if self.mesh is None or jax.process_count() <= 1:
            return n
        import jax.numpy as jnp
        from jax.experimental import multihost_utils

        m = int(multihost_utils.process_allgather(jnp.int32(n)).min())
        if m < n:
            # not silent: these local batches are skipped this epoch (the
            # per-epoch shard rotation in ASRDataset.set_epoch cycles which
            # rows are affected, so no row is stranded forever)
            self.verbose(
                f"multi-host step cap: skipping {n - m} of {n} local batches "
                f"this epoch (other hosts have fewer)"
            )
        return m

    @staticmethod
    def _mh_put(x, sh):
        """Place one host-consistent value onto a (possibly multi-host)
        sharding. ``jax.device_put`` refuses global meshes with
        non-addressable devices in multi-controller mode;
        ``make_array_from_process_local_data`` with the full array per
        process builds the global array instead. Typed PRNG keys go through
        their raw key data (numpy cannot hold them)."""
        import numpy as np

        dt = getattr(x, "dtype", None)
        if dt is not None and jax.dtypes.issubdtype(dt, jax.dtypes.prng_key):
            data = jax.make_array_from_process_local_data(
                sh, np.asarray(jax.random.key_data(x))
            )
            return jax.random.wrap_key_data(data)
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    def place_replicated(self, tree):
        """Replicate params/opt-state/keys across the mesh (no-op unmeshed)."""
        if self.mesh is None:
            return tree
        from ss_asr_tpu.parallel import mesh as pmesh

        sh = pmesh.replicated(self.mesh)
        if jax.process_count() > 1:
            return jax.tree.map(lambda x: self._mh_put(x, sh), tree)
        return jax.device_put(tree, sh)

    def place_tp(self, tree):
        """Tensor-parallel placement: wide (4H/vocab/mel) dims sharded over
        the model axis, everything else replicated (parallel.mesh rules).
        Works for param trees and for optimizer states whose accumulators
        mirror the param shapes; scalars/vectors stay replicated."""
        from ss_asr_tpu.parallel import mesh as pmesh

        shs = pmesh.param_shardings(tree, self.mesh)
        if jax.process_count() > 1:
            return jax.tree.map(self._mh_put, tree, shs)
        return jax.device_put(tree, shs)

    def run_in_mesh(self, fn):
        """Wrap a jitted step so it traces under ``jax.set_mesh(self.mesh)``
        — required for the jit+GSPMD path: the Pallas kernels' dispatch gate
        (ops.rnn._gspmd_axes_live) and their custom_partitioning rules both
        read the ambient abstract mesh."""
        mesh = self.mesh

        def run(*args):
            with jax.set_mesh(mesh):
                return fn(*args)

        return run

    def setup_opt_state(self, optim, params):
        """Init optimizer state, restoring saved accumulators on resume.

        Beats the reference, which always reinitializes the optimizer when
        resuming from a checkpoint (src/trainer.py:150-168).
        """
        state = optim.init(params)
        if getattr(self, "loaded_ckpt", False) and ckpt.exists(self.opt_ckppath):
            self.verbose(f"Restoring optimizer state from {self.opt_ckppath}")
            state = ckpt.load_opt_state(self.opt_ckppath, state)
        return state

    @staticmethod
    def _gather_for_save(tree):
        """Make every leaf fully addressable on every process.

        Under multi-host tensor parallelism a param leaf can be sharded
        across processes; ``np.asarray`` on such a leaf throws. Replicating
        via a jit identity (GSPMD inserts the all-gather over ICI) makes the
        npz flatten safe. All processes MUST call this (it is a collective);
        single-host / fully-addressable trees pass through untouched.
        """
        from jax.sharding import NamedSharding, PartitionSpec

        def rep(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                sh = NamedSharding(x.sharding.mesh, PartitionSpec())
                return jax.jit(lambda a: a, out_shardings=sh)(x)
            return x

        return jax.tree.map(rep, tree)

    @staticmethod
    def _save_barrier() -> None:
        """Cross-process barrier after checkpoint writes.

        Without it a non-writer can immediately read a checkpoint path the
        writer has not finished (or started) writing — e.g. the Seed
        pipeline's relay: process 1 finishes TAE, constructs the ADV
        trainer, and probes asr_2.npz while process 0 is still flushing it,
        silently initializing fresh params instead. All processes execute
        the same save call sequence, so a constant barrier name is safe.
        """
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("ss_asr_tpu.save")

    def save_tree(self, path: str, tree) -> None:
        """Multi-host-safe checkpoint write for any param pytree.

        Non-addressable (TP-sharded) leaves are all-gathered on EVERY
        process (collective — all hosts must call this), then only process 0
        writes npz files; the orbax backend coordinates across hosts itself,
        so every process calls it. A barrier follows the write so
        non-writers never observe a half-written (or missing) checkpoint.
        Single-host: a plain save.
        """
        if jax.process_count() > 1:
            tree = self._gather_for_save(tree)
        if path.endswith(ckpt.ORBAX_SUFFIX) or self.is_writer:
            ckpt.save_auto(path, tree)
        self._save_barrier()

    def save_opt(self, path: str, opt_state) -> None:
        """Writer-gated optimizer-state write (same contract as save_tree)."""
        if jax.process_count() > 1:
            opt_state = self._gather_for_save(opt_state)
        if self.is_writer:
            ckpt.save_opt_state(path, opt_state)
        self._save_barrier()

    def save_state(self, params, opt_state=None, path: Optional[str] = None) -> None:
        """Save params (and optimizer accumulators) atomically.

        With ``keep_snapshots: K`` and a default-path save (the save_step
        cadence / close()), also writes a step-stamped snapshot and prunes
        to the K most recent — the inputs to checkpoint averaging."""
        self.save_tree(path or self.ckppath, params)
        if opt_state is not None and path is None:
            self.save_opt(self.opt_ckppath, opt_state)
        if path is None and self.keep_snapshots > 0:
            snap = ckpt.snapshot_path(self.ckpdir, self.module_id,
                                      self.tr.step, self.ckpt_ext)
            self.save_tree(snap, params)
            if self.is_writer:
                ckpt.prune_snapshots(self.ckpdir, self.module_id,
                                     self.keep_snapshots)

    def genpath(self, p, module_id: str) -> Tuple[str, str]:
        """In/out checkpoint path pair for parameter relays (trainer.py:170-191)."""
        if p is None:
            q = os.path.join(self.ckpdir, f"{module_id}.npz")
            return (q, q)
        if isinstance(p, str):
            return (p, p)
        assert len(p) == 2
        return tuple(p)

    def close(self) -> None:
        return None
