from sgtapose_tpu.core import geometry, pnp  # noqa: F401
