from shrimp_tpu.io import fastx  # noqa: F401
