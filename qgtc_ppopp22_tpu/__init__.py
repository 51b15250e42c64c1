"""QGTC-TPU: arbitrary-bit quantized GNN inference, TPU-native.

A from-scratch JAX/Pallas re-design of the capabilities of QGTC
(PPoPP'22, YukeWang96/QGTC_PPoPP22): 1-8 bit quantized GNN inference
where matrices live in a bit-plane domain and arbitrary-bit GEMMs are
computed exactly on the MXU, with quantize/re-pack fused into the GEMM
epilogue, zero-tile jumping over all-zero adjacency tiles, METIS-style
cluster batching (Cluster-GCN / batched-GIN dataflow), and multi-chip
scaling over a `jax.sharding.Mesh`.

Design stance (vs. the CUDA reference):

* The reference decomposes a w-bit x a-bit integer GEMM into ``w*a``
  1-bit Ampere BMMA GEMMs (reference ``QGTC_module/kernel.h:245-391``).
  The TPU MXU natively multiplies int8, so we decompose into base-16
  *digits* instead: at most ``ceil(w/4) * ceil(a/4)`` int8 GEMMs
  (1 for <=4-bit operands, 4 for 8-bit) -- exact integer arithmetic,
  identical results, far fewer passes.
* Bit planes are packed 32 *rows* per uint32 word (``[bits, M/32, K]``)
  so Pallas in-kernel unpack is a sublane-only reshape; the reference
  packs 32 K-elements per word via warp ballots
  (``kernel.h:204-242``), which has no efficient TPU analogue.
* Zero-tile jumping is a real block-sparse scalar-prefetch grid; in the
  reference the production kernels compile the dense path and the skip
  logic lives only in an instrumented counter kernel
  (``kernel.h:304``, ``kernel.h:572-592``).
"""

__version__ = "0.1.0"

from qgtc_ppopp22_tpu.ops.quantize import quantize, requantize
from qgtc_ppopp22_tpu.ops.bitpack import (
    BitTensor,
    pack_bits,
    unpack_bits,
    val2bit,
    bit2val,
)
from qgtc_ppopp22_tpu.ops.bitgemm import bitmm_to_bits, bitmm_to_int
from qgtc_ppopp22_tpu.ops.digits import DigitTensor, to_digit_tensor, digit_pack
from qgtc_ppopp22_tpu.ops.digitmm import digitmm_to_digits, digitmm_to_f32

__all__ = [
    "quantize",
    "requantize",
    "BitTensor",
    "pack_bits",
    "unpack_bits",
    "val2bit",
    "bit2val",
    "bitmm_to_bits",
    "bitmm_to_int",
    "DigitTensor",
    "to_digit_tensor",
    "digit_pack",
    "digitmm_to_digits",
    "digitmm_to_f32",
]
