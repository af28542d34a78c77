"""UMPR-TPU entry point.

Public CLI surface identical to the reference main.py:102-135 (--data_dir,
--views, --review_net_only, --test_only, --model_path, plus every Config
hyperparameter as a flag), with the same log-line surface.  The torch-pickle
dataset cache (reference main.py:66-73) becomes packed-array .npz caches per
split.
"""

import os
import sys

from umpr_tpu.config import Config
from umpr_tpu.data.dataset import UMPRDataset, build_dataset
from umpr_tpu.text.vocab import Word2vec
from umpr_tpu.train.trainer import Trainer
from umpr_tpu.utils.logging import get_logger, date


def load_split(name, csv_path, photo_json, photo_dir, w2v, config, logger):
    """Load a packed split from cache or build it.

    Multi-host: only process 0 writes the cache (concurrent memmap writers
    on a shared filesystem would corrupt it); everyone else waits at a
    barrier, then reads the cache -- or builds in memory if the filesystem
    is not shared.  Every process passes the barrier exactly once per
    split, on every path, so the rendezvous cannot deadlock."""
    import jax
    from umpr_tpu.parallel import multihost

    cache_dir = os.path.join(config.data_dir, f"dataset_{name}.cache")
    legacy = os.path.join(config.data_dir, f"dataset_{name}.npz")

    def try_cache():
        if not config.cache_dataset:
            return None
        for cache in (cache_dir, legacy):
            try:
                ds = UMPRDataset.load(cache)
                logger.info(f"Loaded {name} dataset from {cache}!")
                return ds
            except (FileNotFoundError, NotADirectoryError):
                continue
        return None

    def build(write_cache):
        logger.debug(f"Loading {name} dataset.")
        # with caching on, the streaming build writes its packed arrays
        # straight into the cache dir as memmaps (no 2nd copy in RSS)
        ds = build_dataset(csv_path, photo_json, photo_dir, w2v, config,
                           mmap_dir=cache_dir if write_cache else None)
        if write_cache and not os.path.exists(
                os.path.join(cache_dir, "complete.marker")):
            ds.save(cache_dir)  # full-memory fallback path: persist explicitly
        return ds

    if jax.process_count() == 1:
        # `is not None`, not `or`: a legitimately empty split (every row
        # filtered out) is falsy but still a valid cache hit.
        ds = try_cache()
        return ds if ds is not None else build(write_cache=config.cache_dataset)

    ds = try_cache()
    if ds is not None:
        multihost.barrier(f"dataset_{name}")
        return ds
    if multihost.is_primary():
        ds = build(write_cache=config.cache_dataset)
        multihost.barrier(f"dataset_{name}")
        return ds
    multihost.barrier(f"dataset_{name}")  # wait for the primary's cache
    ds = try_cache()
    return ds if ds is not None else build(write_cache=False)


def main():
    config = Config()

    import jax
    if config.device == "cpu":
        # Must happen before first backend use; overrides any TPU plugin that
        # force-registered itself (see tests/conftest.py note).
        jax.config.update("jax_platforms", "cpu")
    from umpr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(os.path.dirname(os.path.abspath(__file__)))

    # Multi-host: join the global runtime BEFORE any device query, so the
    # trainer's mesh spans every host's chips (no-op when single-host).
    from umpr_tpu.parallel import multihost
    multihost.initialize(config.coordinator_address or None,
                         config.num_processes or None,
                         None if config.process_id < 0 else config.process_id)

    if config.test_only:
        if not os.path.exists(config.model_path):
            print(f"{config.model_path} is not exist! Please train first "
                  f"(set test_only=False in config.py)!")
            sys.exit(-1)
    else:
        # abspath so `--data_dir .` names the run after the real directory
        # (the reference's basename(".") yields a hidden ".<stamp>" dir)
        save_name = os.path.basename(os.path.abspath(config.data_dir)) + (
            "_review_net" if config.review_net_only else "")
        # multi-host: every process must agree on the run's directory names,
        # so the stamp is process 0's clock; log files stay per-process
        # (concurrent writers would interleave).
        stamp = multihost.broadcast_str(date("%Y%m%d_%H%M%S"))
        proc = (f".p{jax.process_index()}" if jax.process_count() > 1 else "")
        if config.log_path:
            if proc:
                # user-supplied paths get the per-process suffix too: N
                # hosts appending to ONE file would interleave mid-record
                root, ext = os.path.splitext(config.log_path)
                config.log_path = f"{root}{proc}{ext}"
        else:
            config.log_path = f"./log/{save_name}{stamp}{proc}.txt"
        config.model_path = config.model_path or f"./model/{save_name}{stamp}"
        log_dir = os.path.dirname(config.log_path)
        if log_dir:  # a bare filename has no directory to create
            os.makedirs(log_dir, exist_ok=True)
        os.makedirs(config.model_path, exist_ok=True)

    photo_dir = os.path.join(config.data_dir, "photos")
    photo_json = os.path.join(config.data_dir, "photos.json")
    train_path = os.path.join(config.data_dir, "train.csv")
    valid_path = os.path.join(config.data_dir, "valid.csv")
    test_path = os.path.join(config.data_dir, "test.csv")

    logger = get_logger(config.log_path)
    logger.info(config)
    logger.info(f"Logging to {config.log_path}")
    logger.info(f"Save model {config.model_path}")
    logger.info(f"Photo path {photo_dir}")
    logger.info(f"Photo json {photo_json}")
    logger.info(f"Train file {train_path}")
    logger.info(f"Valid file {valid_path}")
    logger.info(f"Test  file {test_path}\n")

    w2v = Word2vec(config.word2vec_file)
    trainer = Trainer(config, logger, w2v)

    if not config.test_only:
        train_data = load_split("train", train_path, photo_json, photo_dir, w2v, config, logger)
        valid_data = load_split("valid", valid_path, photo_json, photo_dir, w2v, config, logger)
        logger.info(f"Training dataset contains {len(train_data)} samples.")
        trainer.fit(train_data, valid_data, config.model_path)

    test_data = load_split("test", test_path, photo_json, photo_dir, w2v, config, logger)
    trainer.test(test_data, config.model_path)


if __name__ == "__main__":
    main()
