"""Pallas TPU kernel: fused Hough vote histogram.

The XLA formulation of the vote histogram (ops/hough.py `_vote_histogram`)
materializes (B, NX, N) one-hot operands in HBM before the matmul — at
granularity 4 that is ~400 MB of write+read traffic per extraction round,
which dominates the cost.  This kernel fuses the one-hot construction with
the per-direction matmul inside VMEM: the only HBM traffic is the (B, N)
bin indices in and the (B, NX, NX) counts out.

Per grid step (one tile of directions), for each direction row:
    X1[x, n] = (xi[n] == x)          built in VMEM, bf16
    Y1[n, y] = (yi[n] == y)
    votes    = X1 @ Y1               MXU, f32 accumulation (exact counts)

Inactive points carry an out-of-range xi sentinel, so their one-hot row is
zero — the active mask costs nothing here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# directions per grid step; VMEM per step ~ 2 * (NX * N) bf16 one-hots
_BT = 16


def _kernel(nx: int, xi_ref, yi_ref, votes_ref):
    n = xi_ref.shape[1]
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (nx, n), 0)
    y_iota = jax.lax.broadcasted_iota(jnp.int32, (n, nx), 1)

    def body(i, _):
        row_x = xi_ref[i, :]
        row_y = yi_ref[i, :]
        x1 = (x_iota == row_x[None, :]).astype(jnp.bfloat16)
        y1 = (y_iota == row_y[:, None]).astype(jnp.bfloat16)
        votes_ref[i, :, :] = jnp.dot(x1, y1, preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, xi_ref.shape[0], body, 0)


@functools.partial(jax.jit, static_argnames=("num_x_static", "interpret"))
def vote_histogram_pallas(xi: jnp.ndarray, yi: jnp.ndarray,
                          num_x_static: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Exact (B, NX, NX) float32 vote counts.

    xi, yi: (B, N) int32 bins; inactive points must carry xi == num_x_static
    (or any out-of-range value).  B must be a multiple of 16 (the caller
    pads the direction table).
    """
    B, N = xi.shape
    bt = _BT if B % _BT == 0 else (8 if B % 8 == 0 else 1)
    grid = (B // bt,)
    kernel = functools.partial(_kernel, num_x_static)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, num_x_static, num_x_static),
                               lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, num_x_static, num_x_static),
                                       jnp.float32),
        interpret=interpret,
    )(xi, yi)
