from metavoice_tpu.models import transformer  # noqa: F401
