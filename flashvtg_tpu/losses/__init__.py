from flashvtg_tpu.losses.criterion import LossConfig, compute_losses, weighted_total


def declared_loss_keys(loss_cfg):
    """Static, sorted key order of the stacked loss vector for `loss_cfg`
    (core or _ms; () for None), including the appended weighted total.
    Single source of the packed-vector convention shared by the train
    step's loss buffer (train/loop.py) and the packed eval step's loss
    block (train/infer.py) — declared up front, no trace-time side channel.
    """
    from flashvtg_tpu.losses.criterion import loss_keys
    from flashvtg_tpu.losses.criterion_ms import MSLossConfig, loss_keys_ms

    if loss_cfg is None:
        return ()
    base = (
        loss_keys_ms(loss_cfg)
        if isinstance(loss_cfg, MSLossConfig)
        else loss_keys(loss_cfg)
    )
    return tuple(sorted(base + ("weighted_loss_overall",)))
