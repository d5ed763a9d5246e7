from lrce_tpu.ops.nn import (
    dense,
    dense_init,
    dropout,
    gelu,
    layer_norm,
    layer_norm_init,
    mha,
    mha_init,
)
