from metavoice_tpu.ops import audio  # noqa: F401
