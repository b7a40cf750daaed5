from pygat_tpu.models.gat import GATConfig, init_gat, apply_gat  # noqa: F401
from pygat_tpu.models.presets import PRESETS, TRAIN_PRESETS  # noqa: F401
