from sgtapose_tpu.train import loss, schedule, trainer  # noqa: F401
