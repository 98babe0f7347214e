from sgtapose_tpu.ops import attention_kernel  # noqa: F401
