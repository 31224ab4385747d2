"""Pallas TPU kernel: fused NeRF MLP (the tinycudann replacement).

The reference runs its renderer MLPs through tinycudann's fused CUDA
``CutlassMLP`` (src_3dff feature_fields.py:221-243): encoder 768 -> 768+1
(2 hidden LeakyReLU layers, LeakyReLU out), residual add, decoder 768 -> 768
(2 hidden layers, linear out).  This kernel fuses the whole 4-matmul chain in
VMEM: all weights (~4 x 768 x 768 bf16 ~= 4.7 MB) stay resident, activations
never touch HBM between layers, and the grid tiles only the row dimension.

Matches models/render/nerf.py:nerf_mlp numerically (bf16 storage, f32
accumulation); that function dispatches here on TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _leaky(x):
    return jnp.where(x >= 0, x, 0.01 * x)


def _kernel(x_ref, e0_ref, e1_ref, eo_ref, d0_ref, d1_ref, do_ref,
            out_ref, dens_ref):
    x = x_ref[:]                                                   # [T,D] bf16
    h = x
    for w_ref in (e0_ref, e1_ref):
        h = _leaky(
            jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
        ).astype(jnp.bfloat16)
    eo = _leaky(jnp.dot(h, eo_ref[:], preferred_element_type=jnp.float32))
    enc, density = eo[:, :-1], eo[:, -1:]
    h = (enc + x.astype(jnp.float32)).astype(jnp.bfloat16)          # residual
    for w_ref in (d0_ref, d1_ref):
        h = _leaky(
            jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
        ).astype(jnp.bfloat16)
    out = jnp.dot(h, do_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = out.astype(jnp.bfloat16)
    dens_ref[:] = density.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_nerf_mlp(
    x: jnp.ndarray,            # [N,D]
    enc_hidden0: jnp.ndarray,  # [D,D]
    enc_hidden1: jnp.ndarray,
    enc_out: jnp.ndarray,      # [D,D+1]
    dec_hidden0: jnp.ndarray,
    dec_hidden1: jnp.ndarray,
    dec_out: jnp.ndarray,      # [D,D]
    tile: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    N, D = x.shape
    pad = (-N) % tile
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, pad), (0, 0)))
    Do1 = enc_out.shape[1]
    w = [
        enc_hidden0.astype(jnp.bfloat16),
        enc_hidden1.astype(jnp.bfloat16),
        enc_out.astype(jnp.bfloat16),
        dec_hidden0.astype(jnp.bfloat16),
        dec_hidden1.astype(jnp.bfloat16),
        dec_out.astype(jnp.bfloat16),
    ]
    grid = (xp.shape[0] // tile,)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
    out, dens = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [full(a) for a in w],
        out_specs=[
            pl.BlockSpec((tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((xp.shape[0], D), jnp.bfloat16),
            jax.ShapeDtypeStruct((xp.shape[0], 1), jnp.bfloat16),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * xp.shape[0] * D * (4 * D + Do1 + D),
            bytes_accessed=xp.shape[0] * D * 4 + sum(int(a.size) * 2 for a in w),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(xp, *w)
    del Do1
    return out[:N], dens[:N, 0]
