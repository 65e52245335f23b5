from metavoice_tpu.core import config, sampling, text, tokens  # noqa: F401
