from flashvtg_tpu.losses.criterion import LossConfig, compute_losses, weighted_total
