from flashvtg_tpu.eval.metrics import eval_submission
