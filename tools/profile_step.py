"""Capture a jax.profiler trace of the full-UMPR train step and print a
per-HLO-op time attribution (top-k ops + category rollup).

Parses the .xplane.pb with the installed tensorboard_plugin_profile/xprof
converters -- no TensorBoard UI needed.

Usage: python tools/profile_step.py [--batch 64] [--steps 5] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(trace_dir, B, steps, dtype, img, review_only=False,
            eval_only=False):
    import jax
    import jax.numpy as jnp
    from umpr_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from umpr_tpu.models.umpr import ModelDims, init_umpr
    from umpr_tpu.train.optim import make_optimizer, split_frozen
    from umpr_tpu.train.step import make_train_step, make_eval_step
    from __graft_entry__ import _tiny_batch

    dims = ModelDims(review_net_only=review_only, view_size=1,
                     use_pallas=jax.default_backend() == "tpu",
                     photo_size=img, compute_dtype=dtype)
    rng = np.random.default_rng(0)
    batch = _tiny_batch(rng, B=B, S=20, L=20, S_ui=5, V=1, P=1, img=img,
                        with_photos=not review_only)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = init_umpr(jax.random.PRNGKey(0), dims,
                       rng.standard_normal((5000, 50)).astype(np.float32))
    trainable, frozen = split_frozen(params)
    if eval_only:  # the serving path (no-grad predict)
        estep = make_eval_step(dims)
        sq, n = estep(trainable, frozen, batch)
        float(sq)  # compile + sync
        with jax.profiler.trace(trace_dir):
            for _ in range(steps):
                sq, n = estep(trainable, frozen, batch)
            float(sq)
        return
    tx = make_optimizer(1e-3)
    opt_state = tx.init(trainable)
    step = make_train_step(dims, tx, donate=False)
    key = jax.random.PRNGKey(0)

    trainable, opt_state, loss, _ = step(trainable, frozen, opt_state, batch, 1e-6, key)
    float(loss)  # compile + sync
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            trainable, opt_state, loss, _ = step(trainable, frozen, opt_state,
                                                 batch, 1e-6, key)
        float(loss)


def parse_xplane_direct(path, top):
    """Direct XSpace-proto parse (the tensorboard plugin converters are
    version-broken in this environment): aggregate TPU XLA-op durations."""
    import collections
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        agg = collections.Counter()
        total = 0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                agg[meta.get(ev.metadata_id, str(ev.metadata_id))] += ev.duration_ps
                total += ev.duration_ps
        if not total:
            continue
        print(f"\n== {plane.name}: total XLA-op time {total/1e9:.2f} ms "
              f"(all profiled steps) ==")
        for name, d in agg.most_common(top):
            print(f"  {d/total:6.2%} {d/1e9:9.3f} ms  {name[:110]}")
        return True
    return False


def parse(trace_dir, top):
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print("no xplane.pb found under", trace_dir)
        return
    print("xplane:", paths[-1])
    try:
        if parse_xplane_direct(paths[-1], top):
            return
    except Exception as e:
        print(f"direct xplane parse failed ({type(e).__name__}: {e}); "
              "falling back to the tensorboard plugin converters")
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    # framework_op_stats gives per-op totals; fall back across tool names
    for tool in ("hlo_stats", "framework_op_stats", "op_profile"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [paths[-1]], tool, {"tqx": "out:csv;"})
        except Exception as e:
            print(f"[{tool}] failed: {type(e).__name__}: {e}")
            continue
        if isinstance(data, bytes):
            try:
                data = gzip.decompress(data).decode()
            except Exception:
                data = data.decode(errors="replace")
        out = os.path.join(trace_dir, f"{tool}.out")
        with open(out, "w") as f:
            f.write(data if isinstance(data, str) else json.dumps(data))
        print(f"[{tool}] wrote {out} ({len(data)} bytes)")
        if tool == "hlo_stats" and isinstance(data, str) and "," in data:
            summarize_hlo_csv(data, top)
            return


def summarize_hlo_csv(csv_text, top):
    import csv as csvmod
    import io
    rows = list(csvmod.reader(io.StringIO(csv_text)))
    hdr = rows[0]
    print("columns:", hdr)
    try:
        i_cat = hdr.index("category")
        i_name = [i for i, h in enumerate(hdr) if "name" in h.lower()][0]
        time_cols = [i for i, h in enumerate(hdr)
                     if "total_time" in h.lower() or "self_time" in h.lower()
                     or h.lower().endswith("_us")]
        i_time = time_cols[0]
    except (ValueError, IndexError):
        print(csv_text[:3000])
        return
    cats, ops = {}, []
    for r in rows[1:]:
        if len(r) <= max(i_cat, i_time):
            continue
        try:
            t = float(r[i_time])
        except ValueError:
            continue
        cats[r[i_cat]] = cats.get(r[i_cat], 0.0) + t
        ops.append((t, r[i_cat], r[i_name][:110]))
    total = sum(cats.values())
    print(f"\n== category rollup (total {total:.0f}) ==")
    for c, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {t:12.0f}  {t/total:6.1%}  {c}")
    print(f"\n== top {top} ops ==")
    for t, c, n in sorted(ops, key=lambda x: -x[0])[:top]:
        print(f"  {t:12.0f}  {t/total:6.1%}  [{c}] {n}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--photo_size", type=int, default=224)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--trace_dir", default="/tmp/umpr_trace")
    ap.add_argument("--parse_only", action="store_true")
    ap.add_argument("--review_only", action="store_true",
                    help="profile the UMPR-R (text-only) step instead")
    ap.add_argument("--eval_only", action="store_true",
                    help="profile the no-grad eval/serving step instead of "
                         "the train step")
    args = ap.parse_args()
    if not args.parse_only:
        os.makedirs(args.trace_dir, exist_ok=True)
        capture(args.trace_dir, args.batch, args.steps, args.dtype,
                args.photo_size, args.review_only, args.eval_only)
    parse(args.trace_dir, args.top)


if __name__ == "__main__":
    main()
