from metavoice_tpu.parallel import mesh, sharding  # noqa: F401
