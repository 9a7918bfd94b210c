from picdexer_spark.index.codec import (
    BLOCK_SIZE,
    varint_encode,
    varint_decode,
    delta_encode,
    delta_decode,
    encode_blocks,
    decode_block,
)

__all__ = [
    "BLOCK_SIZE",
    "varint_encode",
    "varint_decode",
    "delta_encode",
    "delta_decode",
    "encode_blocks",
    "decode_block",
]
