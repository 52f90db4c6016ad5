from shrimp_tpu.ops.params import SWParams  # noqa: F401
