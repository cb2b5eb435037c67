from flashvtg_tpu.data.dataset import DataConfig, VTGDataset
from flashvtg_tpu.data.collate import Collator
