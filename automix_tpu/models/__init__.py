from automix_tpu.models import builtin, tutorial  # noqa: F401
