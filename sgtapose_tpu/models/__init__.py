from sgtapose_tpu.models import attention, deform_conv, dla, sgta  # noqa: F401
from sgtapose_tpu.models.sgta import create_model  # noqa: F401
