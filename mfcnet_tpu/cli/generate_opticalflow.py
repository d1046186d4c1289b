"""Offline optical-flow precompute (reference:
scripts/generate_opticalflow_raft.py and generate_opticalflow_unflow.py,
merged into one CLI with ``--optflow_model {RAFT,UnFlow}``).

Walks a dataset's images/ directories in order, computes flow between each
consecutive frame pair (first frame of each video gets zero flow —
reference generate_opticalflow_raft.py:67-68), and writes ``.flo`` files
plus optional color visualizations into a sibling directory.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import jax
import numpy as np

from mfcnet_tpu.data.files import get_dataset_filenames
from mfcnet_tpu.data.masks import write_flo
from mfcnet_tpu.utils.jitinit import jit_init
from mfcnet_tpu.utils.vis import flow_to_color


def build_parser():
    p = argparse.ArgumentParser(description="Offline optical-flow precompute")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--dataset", type=str, default="JIGSAWS",
                   choices=["MICCAI2015", "MICCAI2017", "JIGSAWS"])
    p.add_argument("--mode", type=str, default="training",
                   choices=["training", "testing"])
    p.add_argument("--optflow_model", type=str, default="RAFT",
                   choices=["RAFT", "UnFlow"])
    p.add_argument("--optflow_dir", type=str, default=None,
                   help="Output dir name replacing 'images' "
                        "(default optflow_<model>)")
    p.add_argument("--input_height", type=int, default=480)
    p.add_argument("--input_width", type=int, default=640)
    p.add_argument("--load_wts_model", type=str, default=None,
                   help="Flow-model weights (msgpack)")
    p.add_argument("--save_viz", type=lambda v: v.lower() in ("true", "1"),
                   default=True)
    p.add_argument("--raft_iters", type=int, default=12)
    p.add_argument("--batch", type=int, default=1,
                   help="frame pairs per provider forward (batching "
                        "amortizes dispatch and fills the MXU; every op "
                        "in both providers is per-sample at eval, so "
                        "results are identical for any batch)")
    return p


def main(argv=None):
    import jax.numpy as jnp

    args = build_parser().parse_args(argv)
    out_name = args.optflow_dir or f"optflow_{args.optflow_model.lower()}"
    H, W = args.input_height, args.input_width

    if args.optflow_model == "RAFT":
        from mfcnet_tpu.models.raft import RAFT

        if H % 8 or W % 8:
            raise SystemExit(
                f"--input_height/--input_width must be divisible by 8 for "
                f"RAFT (got {H}x{W}); torchvision raft_large has the same "
                f"requirement"
            )
        model = RAFT(iters=args.raft_iters)
    else:
        from mfcnet_tpu.models.unflow import UnFlow

        model = UnFlow()
    dummy = np.zeros((1, H, W, 3), np.float32)
    variables = jit_init(model, jax.random.PRNGKey(0), dummy, dummy)
    if args.load_wts_model:
        from mfcnet_tpu.utils.checkpoint import load_params

        variables = {"params": load_params(
            args.load_wts_model, template=variables["params"]
        )}

    BATCH = max(1, args.batch)

    @jax.jit
    def flow_batch(prev_u8, curr_u8):  # (BATCH, H, W, 3) uint8
        a = prev_u8.astype(jnp.float32) / 255.0
        b = curr_u8.astype(jnp.float32) / 255.0
        return model.apply(variables, a, b)

    n_written = 0
    files, _ = get_dataset_filenames(args.dataset, args.data_dir, args.mode)

    def emit(path, flow):
        nonlocal n_written
        out_flo = Path(
            str(path).replace("images", out_name)
        ).with_suffix(".flo")
        out_flo.parent.mkdir(parents=True, exist_ok=True)
        write_flo(out_flo, flow)
        if args.save_viz:
            viz = flow_to_color(flow)
            cv2.imwrite(
                str(out_flo.with_suffix(".png")),
                cv2.cvtColor(viz, cv2.COLOR_RGB2BGR),
            )
        n_written += 1
        if n_written % 100 == 0:
            print(f"[{n_written}/{len(files)}] {out_flo}")

    pending = []  # (path, prev_arr, curr_arr) pairs awaiting one forward

    def flush():
        if not pending:
            return
        n = len(pending)
        # pad the final partial chunk to the compiled batch shape
        prevs = np.stack(
            [p for _, p, _ in pending]
            + [pending[-1][1]] * (BATCH - n)
        )
        currs = np.stack(
            [c for _, _, c in pending]
            + [pending[-1][2]] * (BATCH - n)
        )
        flows = np.asarray(flow_batch(prevs, currs))
        for i in range(n):
            emit(pending[i][0], flows[i])
        pending.clear()

    prev_path = None
    prev_arr = None
    for path in files:
        curr = cv2.cvtColor(cv2.imread(str(path)), cv2.COLOR_BGR2RGB)
        curr = cv2.resize(curr, (W, H))
        if prev_path is None or path.parent != prev_path.parent:
            # per-video first frame: zero flow (emit in file order)
            flush()
            emit(path, np.zeros((H, W, 2), np.float32))
        else:
            pending.append((path, prev_arr, curr))
            if len(pending) == BATCH:
                flush()
        prev_path, prev_arr = path, curr
    flush()
    print(f"Wrote {n_written} flow files under '{out_name}'")
    return n_written


if __name__ == "__main__":
    main()
