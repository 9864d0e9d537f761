from ela_lib_spark.index.codecs import (  # noqa: F401
    bitpack_decode,
    bitpack_encode,
    decode_block,
    encode_block,
    pfor_decode,
    pfor_encode,
    varint_decode,
    varint_encode,
)
