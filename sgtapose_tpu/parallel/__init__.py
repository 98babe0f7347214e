from sgtapose_tpu.parallel import mesh  # noqa: F401
