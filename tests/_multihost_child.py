"""Child process for tests/test_multihost_spawn.py (not collected by
pytest — leading underscore).

role=worker: one rank of a REAL 2-process ``jax.distributed`` run (2
local CPU devices each, Gloo collectives) driving the production train
CLI with --multihost.

role=ref: the single-process reference for the same GLOBAL computation —
one process, 4 local CPU devices, with the CLI's loader factory patched
to yield the exact global batches the 2-process run sees (rank shards
interleaved in mesh order), so final params must match the distributed
run's within float tolerance.
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", choices=["worker", "ref"], required=True)
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--port", default="")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--ckpt_backend", default="msgpack")
    ap.add_argument("--shared_expt", action="store_true",
                    help="all ranks share one expt dir (models a pod's "
                         "shared filesystem — required for orbax, whose "
                         "collective save must see one path)")
    a = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    if a.role == "worker":
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        # explicit-coordinates branch of parallel.init_distributed
        os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{a.port}"
        os.environ["JAX_NUM_PROCESSES"] = str(a.nproc)
        os.environ["JAX_PROCESS_ID"] = str(a.rank)
    else:
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    # the axon TPU plugin force-appends itself; pin CPU after import
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

    from mfcnet_tpu.cli import train_multiframe_detection as cli

    if a.role == "ref":
        from mfcnet_tpu.data import loader as loader_mod

        real_gdl = loader_mod.get_data_loader

        def patched(dataset_name, data_dir, mode, prediction_task,
                    num_input_frames, batch_size, num_workers=4,
                    fold_index=-1, add_depth_inputs=False, seed=0,
                    shard=None, packed_dir=None):
            """Global batches = [rank0 batch; rank1 batch] — identical
            composition and order to the 2-process run's assembled
            global array (shard_host_local_batch stitches process-local
            shards in process order)."""
            import numpy as np

            tr0, va = real_gdl(
                dataset_name, data_dir, mode, prediction_task,
                num_input_frames, batch_size // 2, num_workers=num_workers,
                fold_index=fold_index, add_depth_inputs=add_depth_inputs,
                seed=seed, shard=(0, 2),
            )
            tr1, _ = real_gdl(
                dataset_name, data_dir, mode, prediction_task,
                num_input_frames, batch_size // 2, num_workers=num_workers,
                fold_index=fold_index, add_depth_inputs=add_depth_inputs,
                seed=seed, shard=(1, 2),
            )

            class Interleaved:
                @property
                def drop_last(self):
                    return tr0.drop_last

                @drop_last.setter
                def drop_last(self, v):
                    tr0.drop_last = v
                    tr1.drop_last = v

                def __len__(self):
                    return min(len(tr0), len(tr1))

                def set_epoch(self, epoch, skip_batches=0):
                    tr0.set_epoch(epoch, skip_batches)
                    tr1.set_epoch(epoch, skip_batches)

                def __iter__(self):
                    for b0, b1 in zip(tr0, tr1):
                        yield {
                            k: np.concatenate([b0[k], b1[k]]) for k in b0
                        }

            return Interleaved(), va

        cli.get_data_loader = patched

    args = [
        "--data_dir", a.data_dir,
        "--dataset", "JIGSAWS",
        "--prediction_task", "toolpose_segmentation",
        "--num_input_frames", "3",
        "--expt_savedir", os.path.join(
            a.out_dir,
            "runs_shared" if a.shared_expt else f"runs_{a.role}{a.rank}",
        ),
        "--expt_name", "mh",
        # worker: per-PROCESS batch; ref: the equal global batch
        "--batch_size", "2" if a.role == "worker" else "4",
        "--num_workers", "1",
        "--num_classes", "5",
        "--loss_fns", "nll", "soft_jaccard",
        "--loss_wts", "0.7", "0.3",
        "--class_weights", "1", "1000", "1000", "1000", "1000",
        "--lr", "1e-3",
        "--num_epochs", "1",
        "--save_freq", "1",
        "--print_freq", "10",
        "--input_height", "32",
        "--input_width", "32",
        "--model_type", "TernausNetMulti-Basic",
        "--model_scale", "0.1",
        "--train_base_model", "true",
        "--seed", "42",
        "--ckpt_backend", a.ckpt_backend,
    ]
    if a.role == "worker":
        args += ["--multihost", "true"]
    state = cli.main(args)

    from mfcnet_tpu.utils.checkpoint import save_params

    tag = f"{a.role}{a.rank}"
    save_params(
        os.path.join(a.out_dir, f"params_{tag}.msgpack"),
        jax.device_get(state.params),
    )
    save_params(
        os.path.join(a.out_dir, f"stats_{tag}.msgpack"),
        jax.device_get(state.batch_stats),
    )
    with open(os.path.join(a.out_dir, f"info_{tag}.json"), "w") as f:
        json.dump({
            "process_count": jax.process_count(),
            "process_index": jax.process_index(),
            "n_devices": len(jax.devices()),
            "n_local_devices": len(jax.local_devices()),
            "step": int(state.step),
        }, f)


if __name__ == "__main__":
    main()
