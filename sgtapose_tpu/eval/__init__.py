from sgtapose_tpu.eval import metrics  # noqa: F401
