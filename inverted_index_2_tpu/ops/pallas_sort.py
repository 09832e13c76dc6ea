"""Pallas TPU kernel: in-VMEM bitonic row sort (uint32, ascending).

STATUS: validated alternative, NOT the production sort. On-chip A/B
(within-process): (2048, 2048) 33.0ms vs jnp.sort 35.2ms (1.07x);
(2048, 16384) 45.2ms vs 58.4ms (1.29x). The hypothesis that XLA's sort
was HBM-stage-bound proved wrong — both implementations run at ~0.5 Tops
effective, i.e. near the v5e VPU's real throughput for this op mix, so
keeping the network in VMEM buys little. Production paths keep jnp.sort;
this ships as the documented roll-butterfly pattern (the only way to
express lane-level compare-exchange this Mosaic accepts) for future
kernels that need in-VMEM ordering fused with other work.

Butterfly layout: each row of M = S*128 elements lives as an (S, 128)
tile in row-major order (element e = s*128 + l). A compare-exchange at
distance j is two rotations + selects:
  * j < 128: lane-axis rolls (partner lane l XOR j),
  * j >= 128: sublane-axis rolls (partner sublane s XOR j/128),
with direction masks from iota bit tests — no gathers, no dynamic shapes.
Values sort in the sign-flipped int32 domain (order-preserving bijection;
Mosaic implements no unsigned min/max), flipped back on store.

Mosaic notes: pltpu.roll requires non-negative shifts (use size - j for
the backward rotation); everything else per ops/pallas_bool.py's list.

No off-TPU fallback: off-TPU callers pass interpret=True (tests) or use
jnp.sort.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 8        # rows per program
LANES = 128


def _kernel_factory(S: int):
    M = S * LANES

    def _kernel(x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1)
        x = jax.lax.bitcast_convert_type(
            x_ref[:] ^ np.uint32(0x80000000), jnp.int32
        )                                               # (TQ, S, 128)

        k = 2
        while k <= M:
            j = k // 2
            while j >= 1:
                if j < LANES:
                    up = pltpu.roll(x, LANES - j, 2)
                    dn = pltpu.roll(x, j, 2)
                    is_lo = (lane & j) == 0
                else:
                    js = j // LANES
                    up = pltpu.roll(x, S - js, 1)
                    dn = pltpu.roll(x, js, 1)
                    is_lo = (sub & js) == 0
                partner = jnp.where(is_lo, up, dn)
                if k >= LANES * 2:
                    asc = (sub & (k // LANES)) == 0
                elif k < LANES:
                    asc = (lane & k) == 0
                else:  # k == 128: (e & k) toggles with sublane parity
                    asc = (sub & 1) == 0
                m1 = jnp.minimum(x, partner)
                m2 = jnp.maximum(x, partner)
                x = jnp.where(is_lo == asc, m1, m2)
                j //= 2
            k *= 2

        o_ref[:] = (
            jax.lax.bitcast_convert_type(x, jnp.uint32) ^ np.uint32(0x80000000)
        )

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_rows_pallas(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Sort each row of x (Q, M) uint32 ascending. Q % TQ == 0, M % 128 == 0
    with M/128 a power of two (callers pad with 0xFFFFFFFF sentinels)."""
    Q, M = x.shape
    assert Q % TQ == 0, f"Q={Q} must be a multiple of {TQ}"
    S = M // LANES
    assert S * LANES == M and (S & (S - 1)) == 0, f"M={M} must be 128*2^k"

    out = pl.pallas_call(
        _kernel_factory(S),
        out_shape=jax.ShapeDtypeStruct((Q, S, LANES), jnp.uint32),
        grid=(Q // TQ,),
        in_specs=[
            pl.BlockSpec(
                (TQ, S, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (TQ, S, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x.reshape(Q, S, LANES))
    return out.reshape(Q, M)
