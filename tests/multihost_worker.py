"""Worker process for the REAL 2-process `jax.distributed` train() test.

Launched by tests/test_multihost.py as `python multihost_worker.py '<json>'`.
Each worker joins the coordination service, gets its own 4 virtual CPU
devices (8 global across 2 processes), runs the PRODUCTION train() loop —
global batch assembly via jax.make_array_from_process_local_data, gloo
cross-host collectives, per-host redundant eval, process-0-gated file
writes, checkpoint barriers — and dumps its final parameters for the parent
test to compare against a single-process run.
"""

import json
import sys


def main():
    args = json.loads(sys.argv[1])

    import jax

    # the axon TPU plugin's sitecustomize latches JAX_PLATFORMS=axon; the
    # config updates below win (same trick as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_num_cpu_devices", int(args["local_devices"]))
    jax.distributed.initialize(
        args["coordinator"],
        num_processes=int(args["num_processes"]),
        process_id=int(args["process_id"]),
    )

    import numpy as np

    sys.path.insert(0, args["repo_root"])

    from flashvtg_tpu.train.config import from_preset
    from flashvtg_tpu.train.loop import train

    assert jax.process_count() == int(args["num_processes"]), (
        jax.process_count()
    )
    assert len(jax.devices()) == int(args["num_processes"]) * int(
        args["local_devices"]
    )

    cfg = from_preset(args["preset"], **args["overrides"])
    params, score, results_dir = train(cfg, results_dir=args["results_dir"])

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {
        jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat
    }
    np.savez(args["out"], **out)
    with open(args["out"] + ".score", "w") as f:
        json.dump({"score": float(score), "results_dir": results_dir}, f)
    print(f"worker {args['process_id']} done score={score}", flush=True)


if __name__ == "__main__":
    main()
