"""Shared layer primitives with torch-default initialization parity.

The reference relies on PyTorch default initializers (nn.Linear /
nn.Conv1d: kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in));
bare nn.Parameter(torch.randn): N(0,1)).  Matching the init distributions
keeps training dynamics comparable at the reference's very small learning
rate (1e-6).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def uniform_fan_in(key, fan_in, shape):
    k = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -k, k)


def init_linear(key, in_size, out_size, bias=True):
    """torch nn.Linear default init; kernel stored (in, out)."""
    k_w, k_b = jax.random.split(key)
    p = {"kernel": uniform_fan_in(k_w, in_size, (in_size, out_size))}
    if bias:
        p["bias"] = uniform_fan_in(k_b, in_size, (out_size,))
    return p


def linear(p, x):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def init_conv1d(key, in_ch, out_ch, kernel_size, bias=True):
    """torch nn.Conv1d default init; kernel stored (width, in, out) [WIO]."""
    k_w, k_b = jax.random.split(key)
    fan_in = in_ch * kernel_size
    p = {"kernel": uniform_fan_in(k_w, fan_in, (kernel_size, in_ch, out_ch))}
    if bias:
        p["bias"] = uniform_fan_in(k_b, fan_in, (out_ch,))
    return p


def conv1d_same(p, x):
    """x: (N, L, C) -> (N, L_out, C_out) with torch padding=(k-1)//2.

    For odd k this is SAME padding; for even k the output shrinks by one,
    matching torch Conv1d with that padding (reference model.py:93).
    """
    k = p["kernel"].shape[0]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, p["kernel"],
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "bias" in p:
        y = y + p["bias"]
    return y


def randn(key, shape):
    """bare nn.Parameter(torch.randn(...)) equivalent."""
    return jax.random.normal(key, shape, jnp.float32)
