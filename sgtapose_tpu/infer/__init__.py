from sgtapose_tpu.infer import detector  # noqa: F401
