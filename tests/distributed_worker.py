"""One process of the 2-process × 4-virtual-CPU-device multi-host harness
(tests/test_distributed.py). Launched as::

    python tests/distributed_worker.py <pid> <nproc> <port> <data_root> <out> \
        [max_epoch] [resume] [kill_after_state_saves]

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 8-device runtime, and the finetune driver runs over a
``data=8`` mesh exactly like the single-process harness — the coordinator
writes metrics/checkpoints, and the parent test asserts equality with the
single-process run.

The optional tail arguments drive the multi-host failure-recovery test:
``kill_after_state_saves=k`` makes the COORDINATOR hard-exit (``os._exit``,
no cleanup — a genuine crash) right after its k-th ``train_state.ckpt``
write lands on disk, mid-protocol; ``resume=1`` restarts from that
checkpoint. VERDICT r3 #2.
"""

import json
import os
import sys


def main():
    pid, nproc, port, data_root, out_dir = sys.argv[1:6]
    max_epoch = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    resume = len(sys.argv) > 7 and sys.argv[7] == "1"
    kill_after = int(sys.argv[8]) if len(sys.argv) > 8 else 0
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

    if kill_after > 0 and is_coordinator():
        # Simulate a coordinator crash mid-protocol: hard-exit (no atexit,
        # no distributed shutdown handshake) the moment the k-th full-state
        # checkpoint is ON DISK. The non-coordinator is orphaned mid-
        # collective — the parent test reaps it like an operator would.
        from vidsum_tpu.train import checkpoint as ckpt_mod

        orig_save = ckpt_mod.AsyncCheckpointer.save
        n_state = {"saves": 0}

        def save_then_die(self, path, host_tree, meta=None):
            orig_save(self, path, host_tree, meta)
            if os.path.basename(path) == "train_state.ckpt":
                n_state["saves"] += 1
                if n_state["saves"] >= kill_after:
                    self.flush()     # the write must be durable first
                    os._exit(137)
        ckpt_mod.AsyncCheckpointer.save = save_then_die

    cfg = Config(
        model=ModelConfig(d_model=32, num_heads=4, num_layers=1,
                          dropout=0.0, max_len=256),
        data=DataConfig(root=data_root, ex_dataset="tvsum",
                        datasets="tvsum", length_bucket=128),
        train=TrainConfig(lr=1e-3, weight_decay=1e-4, batch_size=8,
                          max_epoch=max_epoch),
    )
    splits = [{"train_keys": [f"x/video_{i}" for i in range(6)],
               "test_keys": ["x/video_6", "x/video_7"]}]
    mesh = global_mesh(MeshConfig(data=8, model=1))
    result = finetune(cfg, splits, workdir=out_dir, export_summary=False,
                      metrics_path=os.path.join(out_dir, "metrics.jsonl"),
                      mesh=mesh, resume=resume)

    if is_coordinator():
        with open(os.path.join(out_dir, "result.json"), "w") as f:
            json.dump({"fscore": result.fscore,
                       "kendall_tau": result.kendall_tau,
                       "spearman_rho": result.spearman_rho}, f)


if __name__ == "__main__":
    main()
