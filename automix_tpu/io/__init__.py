from automix_tpu.io import mixfile, reports  # noqa: F401
