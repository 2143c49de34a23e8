from genefaceplusplus_tpu.ops.trunc_exp import trunc_exp
from genefaceplusplus_tpu.ops.freq_encoder import freq_encode, freq_output_dim
from genefaceplusplus_tpu.ops.sh_encoder import sh_encode
from genefaceplusplus_tpu.ops.grid_encoder import GridSpec, grid_encode, init_grid_embeddings

__all__ = [
    "trunc_exp",
    "freq_encode",
    "freq_output_dim",
    "sh_encode",
    "GridSpec",
    "grid_encode",
    "init_grid_embeddings",
]
