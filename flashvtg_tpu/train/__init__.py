from flashvtg_tpu.train.config import ExperimentConfig, PRESETS, load_model_cfg_file
