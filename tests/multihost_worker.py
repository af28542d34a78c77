"""Multi-host test worker: N deterministic UMPR-R train steps + an eval.

Runs identically in a single-process runtime (the test process, 8 virtual
CPU devices) and in a multi-process one (two 4-device processes joined via
jax.distributed + gloo collectives over localhost -- a real DCN-style
runtime).  The test asserts the per-step losses match across the two,
the multi-host analogue of tests/test_parallel.py's N-device == 1-device
invariant (which the reference's DataParallel bug violated,
reference readme.md:154-160).

Invoked as a script by tests/test_multihost.py:
    python multihost_worker.py <process_id> <num_processes> <port> <out>
"""

from __future__ import annotations

import json
import sys


def run_steps(n_steps=3, global_batch=16, shard_embedding=False):
    """Deterministic mini-train: returns per-step losses + a final eval.

    shard_embedding=True places the frozen vocab table row-sharded over the
    mesh axis (tensor parallel) -- under multi-host that table spans
    processes, the hardest layout this framework supports."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tests.ref_oracle import random_batch
    from umpr_tpu.models.umpr import ModelDims, init_umpr
    from umpr_tpu.parallel import multihost
    from umpr_tpu.parallel.mesh import make_mesh, replicated, batch_sharded
    from umpr_tpu.train.optim import make_optimizer, split_frozen
    from umpr_tpu.train.step import make_train_step, make_eval_step

    mesh = make_mesh()
    rep, dp = replicated(mesh), batch_sharded(mesh)

    rng = np.random.default_rng(5)
    dims = ModelDims(review_net_only=True)
    params = init_umpr(jax.random.PRNGKey(0), dims,
                       rng.standard_normal((60, 16)).astype(np.float32))
    trainable, frozen = split_frozen(params)
    trainable = jax.device_put(trainable, rep)
    if shard_embedding:
        emb = frozen["embedding"]
        pad = (-emb.shape[0]) % jax.device_count()
        if pad:
            emb = jnp.concatenate(
                [emb, jnp.zeros((pad, emb.shape[1]), emb.dtype)])
        frozen = {"embedding": jax.device_put(
            emb, NamedSharding(mesh, P("dp", None)))}
    else:
        frozen = jax.device_put(frozen, rep)
    tx = make_optimizer(1e-3)
    opt_state = jax.device_put(tx.init(trainable), rep)
    step = make_train_step(dims, tx, donate=False)
    eval_step = make_eval_step(dims)

    losses = []
    for i in range(n_steps):
        batch_np = random_batch(np.random.default_rng(100 + i), B=global_batch,
                                S=5, L=10, S_ui=2, vocab=60, emb=16)
        batch = multihost.put_global(batch_np, dp)
        trainable, opt_state, loss, _ = step(trainable, frozen, opt_state,
                                             batch, 1e-3, jax.random.PRNGKey(1))
        losses.append(float(loss))
    batch = multihost.put_global(
        random_batch(np.random.default_rng(999), B=global_batch,
                     S=5, L=10, S_ui=2, vocab=60, emb=16), dp)
    sq, n = eval_step(trainable, frozen, batch)
    return {"losses": losses, "eval_sq": float(sq), "eval_n": float(n),
            "n_devices": jax.device_count()}


def run_trainer(device_dataset, work_dir, tag, photos=False):
    """Trainer-level fit under `--device_dataset` mode: returns an exact
    digest (per-leaf sums) of the final trainable params.  Multi-host
    resident mode replicates the packed arrays per process and ships
    per-process row blocks of the global index matrices; its digest must
    EQUAL the streaming path's (same jitted math on the same rows)."""
    import os

    import jax
    import numpy as np
    from umpr_tpu.config import Config
    from umpr_tpu.train.trainer import Trainer
    from umpr_tpu.utils.logging import get_logger
    from umpr_tpu.parallel import multihost
    from tests.test_device_dataset import packed_dataset, _W2v, _photo_dataset

    argv = ["--device", "cpu", "--multi_gpu", "True",
            "--batch_size", "8", "--train_epochs", "2", "--eval_every", "2",
            "--steps_per_dispatch", "2", "--learning_rate", "0.01",
            "--min_sent_count", "1", "--seed", "2",
            "--device_dataset", device_dataset]
    if photos:
        argv += ["--review_net_only", "False", "--photo_size", "32",
                 "--views", "['unknown']", "--photo_count", "1",
                 "--train_epochs", "1"]
    else:
        argv += ["--review_net_only", "True"]
    cfg = Config(argv=argv)
    if photos:
        import pathlib
        pdir = pathlib.Path(work_dir) / "photos"
        if multihost.is_primary():
            os.makedirs(pdir, exist_ok=True)
            _photo_dataset(2, pdir, seed=3)  # write the JPEGs ONCE, primary only
        multihost.barrier(f"photos-ready-{tag}")
        # write_photos=False on every build past the barrier: a rewrite here
        # would race the peer's decode (it may already be inside fit) and
        # flake the resident-vs-streaming digest assertion
        train = _photo_dataset(16, pdir, seed=3, write_photos=False)
        valid = _photo_dataset(8, pdir, seed=4, write_photos=False)
    else:
        train, valid = packed_dataset(48), packed_dataset(16)
    t = Trainer(cfg, get_logger(logger_name=f"mh-{tag}"), _W2v())
    t.fit(train, valid, os.path.join(work_dir, f"model_{tag}"))
    if device_dataset == "on":
        assert t._resident, "resident mode must engage multi-host now"
    return [float(np.sum(np.asarray(x)))
            for x in jax.tree.leaves(jax.tree.map(np.asarray, t.trainable))]


def main():
    process_id, num_processes, port, out = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")  # beat any TPU sitecustomize
    from umpr_tpu.parallel import multihost
    assert multihost.initialize(f"127.0.0.1:{port}", num_processes, process_id)
    assert jax.process_count() == num_processes
    # run-name agreement + rendezvous helpers (used by main.py for
    # timestamped checkpoint dirs and the primary-only dataset-cache build)
    stamp = multihost.broadcast_str(f"stamp-from-p{process_id}")
    assert stamp == "stamp-from-p0", stamp
    multihost.barrier("worker-rendezvous")
    # checkpoint-restore shipping: primary's pytree must reach every host
    # verbatim (trainer test()/resume use this when hosts don't share disk)
    import numpy as np
    src = {"w": np.full((3, 2), 7.0 + process_id, np.float32),
           "b": np.arange(4, dtype=np.int32) * (process_id + 1)}
    got = multihost.broadcast_pytree(src)
    assert float(got["w"][0, 0]) == 7.0, got["w"]
    assert got["b"][3] == 3, got["b"]
    result = run_steps()
    # the cross-process tensor-parallel layout: vocab rows sharded over a
    # mesh axis that spans both processes
    result["tp_losses"] = run_steps(shard_embedding=True)["losses"]
    # trainer-level resident-corpus mode across processes: replicated
    # packed arrays + per-process index-row blocks must train identically
    # to the streaming per-process row-slice path (and, with photos, the
    # primary-decoded broadcast bank must match streaming local decodes)
    import os
    shared = os.path.dirname(os.path.abspath(out))
    result["trainer_resident"] = run_trainer("on", shared, "res")
    result["trainer_streaming"] = run_trainer("off", shared, "str")
    result["trainer_resident_photos"] = run_trainer(
        "on", shared, "resp", photos=True)
    result["trainer_streaming_photos"] = run_trainer(
        "off", shared, "strp", photos=True)
    result["process_id"] = jax.process_index()
    result["local_devices"] = jax.local_device_count()
    result["stamp"] = stamp
    with open(out, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
