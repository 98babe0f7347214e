from sgtapose_tpu.data import discovery, loaders, pipeline, synthetic  # noqa: F401
