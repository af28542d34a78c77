"""AOT model export: serialize the jitted predict function to a portable
StableHLO artifact (jax.export) and run inference from the artifact alone.

The reference deploys by unpickling the whole torch module (reference
main.py:94-97), which requires the exact model code at load time.  The
TPU-native analogue is an ahead-of-time compiled artifact: the forward
graph is lowered once (optionally cross-platform, e.g. for TPU from a CPU
build host), serialized, and served by any process with jax installed --
no umpr_tpu model code needed on the serving side.

    # export (shapes are static, the TPU way; one artifact per batch spec)
    python -m umpr_tpu.export --model_path model/<run> --output umpr.jexp \
        --data_dir data/music --word2vec_file glove.txt [--platforms tpu,cpu]

    # serve from the artifact
    from umpr_tpu.export import load_predict
    predict, params = load_predict("umpr.jexp")   # params from the sidecar
    preds = predict(params, batch)

Weights are NOT baked into the graph: the artifact takes (params, batch)
as inputs and a sidecar .npz carries the checkpoint's parameters, so a
re-trained model reuses the compiled artifact when shapes match.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jex

from umpr_tpu.models.umpr import ModelDims, init_umpr, umpr_forward


def batch_spec(config, dims: ModelDims):
    """ShapeDtypeStructs of the loader's batch dict at the config's static
    shapes (umpr_tpu/data/loader.py output contract)."""
    B = config.batch_size
    S, L = config.max_sent_count, config.max_sent_length
    S_ui = config.max_ui_sent_count
    i32 = jnp.int32
    spec = {
        "u_tokens": ((B, S, L), i32), "u_lengths": ((B, S), i32),
        "u_counts": ((B,), i32),
        "i_tokens": ((B, S, L), i32), "i_lengths": ((B, S), i32),
        "i_counts": ((B,), i32),
        "ui_tokens": ((B, S_ui, L), i32), "ui_lengths": ((B, S_ui), i32),
        "ui_counts": ((B,), i32),
        "ratings": ((B,), jnp.float32), "sample_mask": ((B,), jnp.float32),
    }
    if not dims.review_net_only:
        V, P, img = dims.view_size, config.photo_count, dims.photo_size
        spec["photos"] = ((B, V, P, img, img, 3), jnp.uint8)
    return {k: jax.ShapeDtypeStruct(shape, dt) for k, (shape, dt) in spec.items()}


def export_predict(params, dims: ModelDims, spec, platforms=None):
    """-> serialized bytes of the no-grad predict fn (params, batch) -> pred."""

    def predict(params, batch):
        pred, _, _ = umpr_forward(params, batch, dims, train=False)
        return pred

    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype), params)
    exp = jex.export(jax.jit(predict),
                     platforms=tuple(platforms) if platforms else None)(p_spec, spec)
    return exp.serialize()


def _key_part(k):
    """Pytree path element -> string: dict keys verbatim, list indices as
    '#i' (the params tree mixes dicts and lists, e.g. vgg16 'features')."""
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return f"#{k.idx}"
    raise TypeError(f"unsupported pytree key {k!r}")


def _unflatten(flat):
    root = {}
    for key, v in flat.items():
        node = root
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def fix(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            return [fix(node[f"#{i}"]) for i in range(len(node))]
        return {k: fix(v) for k, v in node.items()}

    return fix(root)


def save_artifact(path, serialized, params, meta=None):
    """Artifact = <path> (StableHLO) + <path>.params.npz (weights sidecar,
    path-keyed) + <path>.json (metadata)."""
    with open(path, "wb") as f:
        f.write(serialized)
    flat = {"/".join(_key_part(k) for k in kp): np.asarray(v)
            for kp, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez(path + ".params.npz", **flat)
    with open(path + ".json", "w") as f:
        json.dump(meta or {}, f, indent=2)


def load_predict(path):
    """-> (callable(params, batch) -> pred, params from the sidecar)."""
    with open(path, "rb") as f:
        exp = jex.deserialize(f.read())
    with np.load(path + ".params.npz") as z:
        params = _unflatten({key: jnp.asarray(z[key]) for key in z.files})
    return exp.call, params


def main(argv=None):
    from umpr_tpu.config import Config
    from umpr_tpu.text.vocab import Word2vec
    from umpr_tpu.train import checkpoint as ckpt

    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--output", required=True)
    parser.add_argument("--platforms", default="",
                        help="comma list, e.g. 'tpu,cpu' (cross-platform "
                             "lowering); empty = current backend")
    args, rest = parser.parse_known_args(argv)
    config = Config(rest)
    assert config.model_path, "--model_path is required for export"
    if config.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    w2v = Word2vec(config.word2vec_file)
    # The lax.scan GRU path is the portable lowering (the Pallas kernel's
    # interpret-mode fallback is host-specific and would be baked in when
    # exporting from a non-TPU host); eval-path throughput on the composite
    # paths matches the kernels (BENCH_DETAILS.md serving numbers).
    dims = ModelDims.from_config(config, use_pallas=False)
    like = init_umpr(jax.random.PRNGKey(0), dims, w2v.embedding)
    params = ckpt.restore_best(config.model_path, like)

    platforms = [p for p in args.platforms.split(",") if p] or None
    spec = batch_spec(config, dims)
    serialized = export_predict(params, dims, spec, platforms)
    save_artifact(args.output, serialized, params, meta={
        "batch_size": config.batch_size, "review_net_only": dims.review_net_only,
        "platforms": platforms or [jax.default_backend()],
        "input_keys": sorted(spec.keys()),
    })
    print(f"Exported predict fn ({len(serialized)} bytes) + params sidecar "
          f"to {args.output}")


if __name__ == "__main__":
    main()
