from tqdne_tpu.utils.tree import append_dims, count_params, to_numpy

__all__ = ["append_dims", "count_params", "to_numpy"]
