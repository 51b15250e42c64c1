from qgtc_ppopp22_tpu.ops.quantize import quantize, requantize, dequantize_levels
from qgtc_ppopp22_tpu.ops.bitpack import (
    BitTensor,
    pack_bits,
    unpack_bits,
    val2bit,
    bit2val,
    to_digits,
)
from qgtc_ppopp22_tpu.ops.bitgemm import (
    bitmm_to_bits,
    bitmm_to_int,
    TileMap,
    build_tile_map,
    zero_tile_stats,
    flops_convention,
)
from qgtc_ppopp22_tpu.ops.digits import (
    DigitTensor,
    to_digit_tensor,
    digit_pack,
    digit_unpack,
)
from qgtc_ppopp22_tpu.ops.digitmm import (
    digitmm_to_digits,
    digitmm_to_f32,
    digitmm_to_i32,
    build_tile_map_digits,
    zero_tile_stats_digits,
)
from qgtc_ppopp22_tpu.ops.packmm import (
    PackedTensor,
    pack_rows,
    unpack_rows,
    pack_digit_tensor,
    packmm_to_f32,
    packmm_to_digits,
    packmm_to_packed,
    build_tile_map_packed,
)
