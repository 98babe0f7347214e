from sgtapose_tpu.decode import peaks  # noqa: F401
from sgtapose_tpu.decode.peaks import decode_heatmaps, decode_heatmaps_batch  # noqa: F401
