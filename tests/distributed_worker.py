"""One process of the 2-process × 4-virtual-CPU-device multi-host harness
(tests/test_distributed.py). Launched as::

    python tests/distributed_worker.py <pid> <nproc> <port> <data_root> <out>

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 8-device runtime, and the finetune driver runs over a
``data=8`` mesh exactly like the single-process harness — the coordinator
writes metrics/checkpoints, and the parent test asserts equality with the
single-process run.
"""

import json
import os
import sys


def main():
    pid, nproc, port, data_root, out_dir = sys.argv[1:6]
    # CPU backend with 4 local virtual devices, set before first jax USE
    # (sitecustomize may have imported jax already — CLAUDE.md gotcha)
    for k in list(os.environ):
        if k.startswith(("PALLAS_AXON", "AXON_")):
            del os.environ[k]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["VIDSUM_TPU_CACHE_DIR"] = "off"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4"
                               ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from vidsum_tpu.config import (
        Config, DataConfig, MeshConfig, ModelConfig, TrainConfig,
    )
    from vidsum_tpu.parallel.distributed import (
        DistributedConfig, global_mesh, init_distributed, is_coordinator,
    )
    from vidsum_tpu.train import finetune

    init_distributed(DistributedConfig(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=int(nproc), process_id=int(pid)))
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    cfg = Config(
        model=ModelConfig(d_model=32, num_heads=4, num_layers=1,
                          dropout=0.0, max_len=256),
        data=DataConfig(root=data_root, ex_dataset="tvsum",
                        datasets="tvsum", length_bucket=128),
        train=TrainConfig(lr=1e-3, weight_decay=1e-4, batch_size=8,
                          max_epoch=2),
    )
    splits = [{"train_keys": [f"x/video_{i}" for i in range(6)],
               "test_keys": ["x/video_6", "x/video_7"]}]
    mesh = global_mesh(MeshConfig(data=8, model=1))
    result = finetune(cfg, splits, workdir=out_dir, export_summary=False,
                      metrics_path=os.path.join(out_dir, "metrics.jsonl"),
                      mesh=mesh)

    if is_coordinator():
        with open(os.path.join(out_dir, "result.json"), "w") as f:
            json.dump({"fscore": result.fscore,
                       "kendall_tau": result.kendall_tau,
                       "spearman_rho": result.spearman_rho}, f)


if __name__ == "__main__":
    main()
