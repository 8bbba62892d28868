from automix_tpu.ops import linalg, randoms  # noqa: F401
