from flashvtg_tpu.models.flashvtg import FlashVTGModel, ModelConfig
from flashvtg_tpu.models.points import generate_points, pyramid_level_sizes
