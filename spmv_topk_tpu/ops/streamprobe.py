"""Same-process HBM stream-floor probe.

Measures the achievable HBM->VMEM streaming bandwidth on the SAME word
stream the Top-K kernel reads, with near-zero compute (one add per chunk),
so a benchmark can report its throughput as a fraction of the chip's
same-day deliverable bandwidth. The chip's effective bandwidth varies with
tenancy (measured 485-870 GB/s on the same v5e across days), so absolute
Gnnz/s alone under-identifies kernel quality; pct-of-floor is the
chip-state-independent score. This is the TPU counterpart of the
reference's roofline normalization (plot_roofline.py:197-209, which plots
kernel points against the 13.2 GB/s/channel HBM2 ceiling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import LANES

_S = 8


def _stream_kernel(salt_ref, words_ref, out_ref, acc, *,
                   block_sublanes: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.broadcast_to(salt_ref[0:1, :], acc.shape)

    accs = [jnp.zeros((_S, LANES), jnp.int32) for _ in range(2)]
    for u in range(block_sublanes // _S):
        accs[u % 2] = accs[u % 2] + words_ref[pl.ds(u * _S, _S), :]
    acc[:] = acc[:] + accs[0] + accs[1]

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:]


@functools.partial(jax.jit, static_argnames=("block_sublanes", "num_blocks",
                                             "interpret"))
def stream_words_device(words, salt, *, block_sublanes: int, num_blocks: int,
                        interpret: bool = False):
    """Stream the packed words once; returns an (8, 128) checksum.

    `salt` is a (1, 128) int32 that seeds the accumulator — vary it per
    timed iteration so XLA cannot hoist the call out of a timing scan."""
    return pl.pallas_call(
        functools.partial(_stream_kernel, block_sublanes=block_sublanes),
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_sublanes, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_S, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_S, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_S, LANES), jnp.int32)],
        interpret=interpret,
    )(salt, words)
