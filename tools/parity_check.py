"""One-command real-checkpoint parity harness (BASELINE accuracy gate).

Usage::

    python tools/parity_check.py <ref.pth> [--frames DIR] [--arch auto]
        [--height 480 --width 640] [--max_frames 8] [--json OUT.json]

Loads a reference PyTorch checkpoint (``{model, optimizer, epoch}`` blob or
bare state_dict, DataParallel prefixes tolerated —
reference utils/model_utils.py:14-39), auto-detects the architecture from
its state_dict keys, converts it with :mod:`mfcnet_tpu.compat.torch_convert`,
runs the reference-semantics forward on real frames (or synthetic ones when
no ``--frames`` is given), and reports:

  * max-abs probability-heatmap difference vs a PyTorch forward of the SAME
    weights through the reference-naming oracle modules in ``tests/``
    (gate: <= 1e-3, BASELINE.json), and
  * tool-tip / base keypoint decode agreement (identical detections + RMSE
    <= 0.5 px) for 5-class toolpose checkpoints.

When torch or the oracle cannot run (missing dep, unexpected naming), the
flax half still runs and the report says the torch side was skipped — the
tool degrades to a conversion smoke check instead of failing.

Exit code 0 iff every computed comparison is within the gates.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# gates (BASELINE.json north_star)
HEATMAP_GATE = 1e-3
TIP_RMSE_GATE = 0.5


# ---------------------------------------------------------------------------
# architecture detection from state_dict keys
# ---------------------------------------------------------------------------
def detect_arch(sd: dict) -> str:
    """Return the reference model-type string for a state_dict.

    Signatures are structural key prefixes unique to each family (see the
    reference model files cited per branch)."""
    keys = set(sd)

    def has(prefix):
        return any(k.startswith(prefix) for k in keys)

    if has("base_model.") and has("multiframe_net."):
        base = detect_arch(
            {k[len("base_model."):]: v for k, v in sd.items()
             if k.startswith("base_model.")}
        )
        fam = {
            "TernausNet16": "TernausNetMulti", "TernausNet11": "TernausNetMulti",
            "DeepLab_v3": "DeepLabMulti", "FCN": "FCNMulti",
            "SegFormer": "SegFormerMulti", "HRNet": "HRNetMulti",
        }.get(base)
        if fam is None:
            raise SystemExit(f"multiframe wrapper over unsupported base {base}")
        # Basic vs Large share parameter shapes (the warp has no params,
        # models/multiframe_model.py:89-139); default to the flagship
        return f"{fam}-Basic", base
    if has("moduleFlownets."):                     # models/unflow_model.py
        return "UnFlow"
    if has("memory_encoder.") and has("memory_decoder."):  # FlowFormer++
        return "FlowFormerPlusPlus"
    if has("feature_encoder.") and has("update_block."):   # torchvision RAFT
        return "RAFT"
    if has("att5."):                               # models/tap_model.py
        return "TAPNet16" if "encoder.28.weight" in keys else "TAPNet11"
    if "encoder.28.weight" in keys and has("dec5"):  # models/ternausnet.py
        return "TernausNet16"
    if "encoder.18.weight" in keys and has("dec5"):
        return "TernausNet11"
    if has("stage4.") or has("last_layer."):       # models/hrnet.py
        return "HRNet"
    if has("backbone.layer4."):                    # torchvision seg models
        return ("DeepLab_v3" if any(".convs." in k for k in keys)
                else "FCN")
    if has("init_conv.") or has("downs.0."):       # models/resunet.py
        return "ResUNet"
    if has("encoder.patch_embed1.") or has("decoder.mlp_stage."):  # smp
        return "SegFormer"
    raise SystemExit(
        "could not detect architecture; pass --arch explicitly "
        f"(sample keys: {sorted(keys)[:5]})"
    )


def _num_classes(sd, arch):
    """Output channels of the final projection, per family."""
    finals = {
        "TernausNet16": "final.weight", "TernausNet11": "final.weight",
        "TAPNet16": "final.weight", "TAPNet11": "final.weight",
        "HRNet": "last_layer.3.weight",
        "DeepLab_v3": "classifier.4.weight", "FCN": "classifier.4.weight",
        "SegFormer": "decoder.final_conv.weight",
        "ResUNet": "output_layer.weight",
    }
    if arch.endswith(("-Basic", "-Large")):
        return sd["multiframe_net.multiframe_net.9.weight"].shape[0]
    key = finals.get(arch)
    if key is not None:
        for cand in (key, "segmentation_head.0.weight"):
            if cand in sd:
                return sd[cand].shape[0]
    return None


def _multiframe_config(sd, num_classes):
    """Solve head-in-channels = T*C + 2(T-1)*flow + T*depth for
    (T, flow, depth) (reference in_channels bookkeeping,
    models/multiframe_model.py:14-35)."""
    in_c = sd["multiframe_net.multiframe_net.0.weight"].shape[1]
    sols = []
    for T in range(2, 9):
        for f in (0, 1):
            for d in (0, 1):
                if T * num_classes + f * 2 * (T - 1) + d * T == in_c:
                    sols.append((T, bool(f), bool(d)))
    if not sols:
        raise SystemExit(
            f"cannot infer (num_frames, flow, depth) from head "
            f"in_channels={in_c} with num_classes={num_classes}"
        )
    if len(sols) > 1:
        print(f"[parity] ambiguous multiframe config {sols}; "
              f"using {sols[0]} (override with CLI flags)")
    return sols[0]


# ---------------------------------------------------------------------------
# frames
# ---------------------------------------------------------------------------
def load_frames(frames_dir, H, W, max_frames):
    import cv2

    if frames_dir is None:
        from mfcnet_tpu.data.synthetic import make_synthetic_frames

        print("[parity] no --frames given; using synthetic frames "
              "(layout/semantics check only — rerun with real JIGSAWS "
              "frames for the dataset-accuracy gate)")
        return make_synthetic_frames(
            num_frames=max_frames, height=H, width=W, seed=0
        )
    paths = sorted(
        p for p in Path(frames_dir).iterdir()
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )[:max_frames]
    if not paths:
        raise SystemExit(f"no images in {frames_dir}")
    out = []
    for p in paths:
        img = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
        out.append(cv2.resize(img, (W, H)))
    return np.stack(out)


def preprocess(frames_u8):
    x = frames_u8.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


# ---------------------------------------------------------------------------
# model construction (both sides)
# ---------------------------------------------------------------------------
def build_flax(arch, base, C, T, flow, depth):
    from mfcnet_tpu.models import (
        get_multiframe_segmentation_model,
        get_tooltip_segmentation_model,
    )

    if arch.endswith(("-Basic", "-Large")):
        return get_multiframe_segmentation_model(
            arch, num_classes=C, num_input_frames=T,
            add_optflow_inputs=flow, add_depth_inputs=depth,
        )
    if arch == "UnFlow":
        from mfcnet_tpu.models.unflow import UnFlow

        return UnFlow()
    if arch == "RAFT":
        from mfcnet_tpu.models.raft import RAFT

        return RAFT(iters=12)
    if arch == "FlowFormerPlusPlus":
        from mfcnet_tpu.models.flowformerpp import FlowFormerPP

        return FlowFormerPP(iters=12)
    if arch == "ResUNet":
        from mfcnet_tpu.models.resunet import ResUNetVB

        return ResUNetVB(out_channels=C)
    return get_tooltip_segmentation_model(arch, num_classes=C)


def convert(arch, base, sd):
    from mfcnet_tpu.compat import torch_convert as tc

    if arch.endswith(("-Basic", "-Large")):
        return tc.convert_multiframe(sd, base)
    return {
        "TernausNet16": lambda s: tc.convert_ternausnet(s, "TernausNet16"),
        "TernausNet11": lambda s: tc.convert_ternausnet(s, "TernausNet11"),
        "TAPNet16": lambda s: tc.convert_tapnet(s, "TAPNet16"),
        "TAPNet11": lambda s: tc.convert_tapnet(s, "TAPNet11"),
        "HRNet": tc.convert_hrnet,
        "DeepLab_v3": tc.convert_deeplabv3_resnet101,
        "FCN": tc.convert_fcn_resnet101,
        "SegFormer": tc.convert_segformer,
        "ResUNet": tc.convert_resunet,
        "UnFlow": tc.convert_unflow,
        "RAFT": tc.convert_raft,
        "FlowFormerPlusPlus": tc.convert_flowformerpp,
    }[arch](sd)


def _single_torch_oracle(arch, C):
    """(module, output_kind) for a single-frame backbone; output_kind is
    the reference wrapper's per-frame adapter: 'exp' (TernausNet emits
    log-probs, wrappers .exp() them — multiframe_model.py:227), 'dict'
    (torchvision seg models return {'out': ...}), or 'raw'."""
    if arch in ("TernausNet16",):
        from tests.torch_ref import TernausNet16Torch

        return TernausNet16Torch(C), "exp"
    if arch in ("TAPNet16",):
        from tests.torch_tapnet_ref import TAPNet16Torch

        return TAPNet16Torch(C), "exp"
    if arch in ("DeepLab_v3", "FCN"):
        from tests.torch_resnet_ref import SegModelTorch

        return SegModelTorch(
            "fcn" if arch == "FCN" else "deeplab", C,
            layers=(3, 4, 23, 3), width=64,
        ), "dict"
    if arch == "HRNet":
        from tests.torch_hrnet_ref import HRNetTorch

        return HRNetTorch(
            C, channels=(48, 96, 192, 384), stage_modules=(1, 4, 3),
            num_blocks=4, stage1_width=64,
        ), "raw"
    if arch == "SegFormer":
        from tests.torch_segformer_ref import SegformerTorch

        return SegformerTorch(C), "raw"
    if arch == "ResUNet":
        from tests.torch_resunet_ref import ResUnetVBTorch

        return ResUnetVBTorch(out_dim=C), "raw"
    raise KeyError(arch)


def build_torch_oracle(arch, base, sd, C, T, flow, depth):
    """Reference-naming oracle module loaded with the real weights
    (strict) — the stand-in for the reference implementation. Returns
    None (with a reason) when unsupported/unloadable."""
    import torch

    try:
        if arch.endswith(("-Basic", "-Large")) and not flow:
            import torch.nn as nn

            from tests.torch_ref import MultiFrameNetBasicTorch

            base_m, out_kind = _single_torch_oracle(base, C)

            class GenericMultiTorch(nn.Module):
                """Reference Multi wrapper composition
                (multiframe_model.py:207-540): per-frame base forwards
                with the family adapter, channel-concat (+depth), fusion
                head; state_dict naming matches the real checkpoints
                (base_model.*, multiframe_net.multiframe_net.*)."""

                def __init__(self):
                    super().__init__()
                    self.base_model = base_m
                    self.multiframe_net = MultiFrameNetBasicTorch(
                        C, T, with_depth=depth
                    )

                def forward(self, frames, depth=None):
                    ys = []
                    for f in frames:
                        y = self.base_model(f)
                        if isinstance(y, dict):
                            y = y["out"]
                        if out_kind == "exp":
                            y = y.exp()
                        ys.append(y)
                    if depth is not None:
                        ys += list(depth)
                    return self.multiframe_net(torch.cat(ys, 1))

            m = GenericMultiTorch()
        elif arch == "UnFlow":
            from tests.torch_unflow_ref import UnFlowTorch

            m = UnFlowTorch()
        elif arch == "RAFT":
            from tests.torch_raft_ref import RAFTTorch

            m = RAFTTorch()
        elif arch == "FlowFormerPlusPlus":
            from tests.torch_ffpp_ref import FlowFormerTorch

            m = FlowFormerTorch()
        else:
            m, _ = _single_torch_oracle(arch, C)
        m.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
            strict=True,
        )
        return m.eval(), None
    except KeyError:
        return None, f"no torch oracle wired for {arch}"
    except Exception as e:  # degrade to flax-only smoke check
        return None, f"{type(e).__name__}: {e}"


# ---------------------------------------------------------------------------
# forwards -> probability heatmaps (N, H, W, C) or flows (N, H, W, 2)
# ---------------------------------------------------------------------------
def _to_probs(arr, arch):
    """Reference per-family output adapters
    (scripts/train_toolpose_segmentation.py:160-170): single-frame
    TernausNet/TAPNet/SegFormer already emit log-probs (exp); every other
    head emits logits (softmax)."""
    if (arch.startswith(("TernausNet", "TAPNet", "SegFormer"))
            and not arch.endswith(("-Basic", "-Large"))):
        return np.exp(arr)
    e = np.exp(arr - arr.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def run_flax(model, variables, arch, frames_u8, C, T, depth):
    import jax
    import jax.numpy as jnp

    x = preprocess(frames_u8)
    N = len(frames_u8)
    if arch in ("UnFlow", "RAFT", "FlowFormerPlusPlus"):
        scale = 0.225 / 0.5 if arch == "FlowFormerPlusPlus" else 1.0
        fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))
        flows = [
            np.asarray(fwd(variables, jnp.asarray(x[i: i + 1] * scale),
                           jnp.asarray(x[i - 1: i] * scale)))[0]
            for i in range(1, N)
        ]
        return np.stack(flows)
    if arch.endswith(("-Basic", "-Large")):
        fwd = jax.jit(lambda v, f, **kw: model.apply(v, f, **kw))
        outs = []
        for i in range(T - 1, N):
            win = x[i: i - T: -1] if i - T >= 0 else x[i::-1][:T]
            kw = {}
            if depth:
                kw["depth"] = jnp.zeros((1, T) + x.shape[1:3] + (1,),
                                        jnp.float32)
            outs.append(np.asarray(
                fwd(variables, jnp.asarray(win[None]), **kw))[0])
        return _to_probs(np.stack(outs), arch)
    if arch.startswith("TAPNet"):
        att = jnp.zeros((1,) + x.shape[1:3] + (1,), jnp.float32)
        fwd = jax.jit(lambda v, f, a: model.apply(v, f, a))
        outs = [np.asarray(fwd(variables, jnp.asarray(x[i: i + 1]), att))[0]
                for i in range(N)]
        return _to_probs(np.stack(outs), arch)
    fwd = jax.jit(lambda v, f: model.apply(v, f))
    outs = [np.asarray(fwd(variables, jnp.asarray(x[i: i + 1])))[0]
            for i in range(N)]
    return _to_probs(np.stack(outs), arch)


def run_torch(tmodel, arch, frames_u8, C, T, depth):
    import torch

    x = preprocess(frames_u8)
    xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    N = len(frames_u8)
    with torch.no_grad():
        if arch in ("UnFlow", "RAFT", "FlowFormerPlusPlus"):
            scale = 0.225 / 0.5 if arch == "FlowFormerPlusPlus" else 1.0
            flows = []
            for i in range(1, N):
                a, b = xt[i: i + 1] * scale, xt[i - 1: i] * scale
                out = tmodel(a, b)
                if isinstance(out, (list, tuple)):
                    out = out[-1]
                flows.append(np.moveaxis(out.numpy(), 1, -1)[0])
            return np.stack(flows)
        if arch.endswith(("-Basic", "-Large")):
            outs = []
            for i in range(T - 1, N):
                idx = [max(0, i - j) for j in range(T)]  # newest first
                frames = [xt[k: k + 1] for k in idx]
                kw = {}
                if depth:
                    kw["depth"] = [torch.zeros_like(xt[:1, :1])] * T
                outs.append(np.moveaxis(
                    tmodel(frames, **kw).numpy(), 1, -1)[0])
            return _to_probs(np.stack(outs), arch)
        if arch.startswith("TAPNet"):
            att = torch.zeros_like(xt[:, :1])
            outs = [np.moveaxis(tmodel(xt[i: i + 1], att[:1]).numpy(),
                                1, -1)[0] for i in range(N)]
            return _to_probs(np.stack(outs), arch)
        outs = []
        for i in range(N):
            out = tmodel(xt[i: i + 1])
            if isinstance(out, dict):
                out = out["out"]
            outs.append(np.moveaxis(out.numpy(), 1, -1)[0])
        return _to_probs(np.stack(outs), arch)


# ---------------------------------------------------------------------------
# keypoint decode comparison (5-class toolpose checkpoints)
# ---------------------------------------------------------------------------
def decode_rows(probs):
    from mfcnet_tpu.track.tracker import KeypointTracker, TrackerConfig

    H, W = probs.shape[1:3]
    cfg = TrackerConfig(num_classes=probs.shape[-1], input_height=H,
                        input_width=W, overlay=False)
    tr = KeypointTracker(len(probs), cfg)
    for p in probs:
        mask = p.argmax(axis=-1)
        tr.update(mask, p[..., 4], p[..., 2])
    return tr.rows


def compare_tips(pa, pb):
    ra, rb = decode_rows(pa), decode_rows(pb)
    same_pattern = bool(np.array_equal(np.isnan(ra), np.isnan(rb)))
    both = ~(np.isnan(ra) | np.isnan(rb))
    rmse = (float(np.sqrt(np.mean((ra[both] - rb[both]) ** 2)))
            if both.any() else 0.0)
    return {
        "identical_detection_pattern": same_pattern,
        "tip_rmse_px": rmse,
        "n_compared_coords": int(both.sum()),
    }


# ---------------------------------------------------------------------------
def _export_artifact(path, arch, model, variables, C, T, flow, depth,
                     H, W, epoch, ckpt):
    """Freeze the converted model as a serving artifact (bfloat16, the
    serving default). Flow providers and TAPNet have no artifact form."""
    from mfcnet_tpu.serve import (
        export_serving, export_singleframe, save_exported,
    )

    if arch in ("UnFlow", "RAFT", "FlowFormerPlusPlus"):
        print("[parity] flow providers are consumed in-graph by the "
              "segmentation artifacts; not exported standalone — skipping")
        return
    # one source of truth for the per-family adapters (same registry
    # cli/export_model.py uses)
    from mfcnet_tpu.cli.train_toolpose_segmentation import OUTPUT_MODES

    if not arch.endswith(("-Basic", "-Large")) and (
        OUTPUT_MODES.get(arch) == "tapnet"
    ):
        print("[parity] TAPNet not exportable (its attention-map input "
              "comes from the host warp pipeline) — skipping")
        return
    meta = {
        "model_type": arch, "num_classes": C, "input_height": H,
        "input_width": W, "compute_dtype": "bfloat16",
        "checkpoint": str(ckpt), "epoch": int(epoch),
    }
    if arch.endswith(("-Basic", "-Large")):
        if flow:
            print("[parity] checkpoint expects optical-flow inputs; use "
                  "cli.export_model --add_optflow_inputs with provider "
                  "weights instead — skipping")
            return
        exported = export_serving(
            model, variables, height=H, width=W, num_frames=T,
            dtype="bfloat16", add_depth_inputs=depth,
        )
        meta.update({
            "task": "multiframe", "serving_mode": "full",
            "num_input_frames": T, "add_depth_inputs": depth,
            "add_optflow_inputs": False,
        })
    else:
        output_mode = OUTPUT_MODES.get(arch, "logits")
        exported = export_singleframe(
            model, variables, height=H, width=W,
            output_mode=output_mode, dtype="bfloat16",
        )
        meta.update({
            "task": "singleframe", "serving_mode": "full",
            "num_input_frames": 1, "output_mode": output_mode,
        })
    header = save_exported(path, exported, meta=meta)
    print(f"[parity] serving artifact -> {path} "
          f"(platforms={header['platforms']})")


def main(argv=None):
    # Honor an explicit JAX_PLATFORMS request: the environment's axon TPU
    # plugin force-appends itself to jax_platforms, so a caller exporting
    # JAX_PLATFORMS=cpu would otherwise still initialize (and, with the
    # tunnel down, hang on) the TPU backend. Same workaround as
    # tests/conftest.py.
    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("checkpoint", help="reference .pth")
    ap.add_argument("--frames", default=None,
                    help="directory of frames (jpg/png); synthetic if unset")
    ap.add_argument("--arch", default="auto")
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--max_frames", type=int, default=8)
    ap.add_argument("--num_classes", type=int, default=None)
    ap.add_argument("--json", default=None, help="write report here")
    ap.add_argument("--save", default=None,
                    help="write the converted checkpoint here as a flax "
                         "msgpack file loadable by the CLIs' "
                         "--load_wts_model / --load_wts_base_model "
                         "(epoch sidecar .json written alongside)")
    ap.add_argument("--skip_torch", action="store_true",
                    help="conversion + flax forward only")
    ap.add_argument("--export_artifact", default=None,
                    help="also freeze the converted model into a serving "
                         "artifact (jax.export StableHLO; see "
                         "mfcnet_tpu.serve) at this path — reference "
                         ".pth to deployable TPU artifact in one command")
    args = ap.parse_args(argv)

    from mfcnet_tpu.compat.torch_convert import load_torch_state_dict

    sd, epoch = load_torch_state_dict(args.checkpoint)
    base = None
    if args.arch == "auto":
        det = detect_arch(sd)
        arch, base = det if isinstance(det, tuple) else (det, None)
    else:
        arch = args.arch
        if arch.endswith(("-Basic", "-Large")):
            det = detect_arch(sd)
            base = det[1]
    C = args.num_classes or _num_classes(sd, arch) or 5
    T, flow, depth = 1, False, False
    if arch.endswith(("-Basic", "-Large")):
        T, flow, depth = _multiframe_config(sd, C)
    print(f"[parity] arch={arch} base={base} classes={C} frames_win={T} "
          f"flow={flow} depth={depth} epoch={epoch}")
    if flow:
        print("[parity] checkpoint expects optical-flow inputs; this "
              "harness compares the no-flow forward path only")

    variables = convert(arch, base, sd)
    if args.save:
        from flax import serialization

        out = Path(args.save)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_bytes(serialization.msgpack_serialize({
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "opt_state": {}, "step": 0,
        }))
        out.with_suffix(".json").write_text(json.dumps({"epoch": epoch}))
        print(f"[parity] converted checkpoint -> {out}")
    model = build_flax(arch, base, C, T, flow, depth)
    if args.export_artifact:
        _export_artifact(
            args.export_artifact, arch, model, variables, C, T, flow,
            depth, args.height, args.width, epoch, args.checkpoint,
        )
    frames_u8 = load_frames(args.frames, args.height, args.width,
                            args.max_frames)

    flax_out = run_flax(model, variables, arch, frames_u8, C, T, depth)
    report = {
        "checkpoint": str(args.checkpoint), "arch": arch, "classes": C,
        "num_frames_window": T, "epoch": epoch,
        "frames": len(frames_u8), "source": args.frames or "synthetic",
        "flax_output_shape": list(flax_out.shape),
        "flax_output_finite": bool(np.isfinite(flax_out).all()),
    }

    torch_skipped = None
    if args.skip_torch:
        torch_skipped = "--skip_torch"
    else:
        try:
            import torch  # noqa: F401
        except Exception as e:
            torch_skipped = f"torch unavailable: {e}"
    if torch_skipped is None:
        tmodel, reason = build_torch_oracle(arch, base, sd, C, T, flow,
                                            depth)
        if tmodel is None:
            torch_skipped = reason
        else:
            torch_out = run_torch(tmodel, arch, frames_u8, C, T, depth)
            diff = float(np.abs(flax_out - torch_out).max())
            is_flow = arch in ("UnFlow", "RAFT", "FlowFormerPlusPlus")
            report["max_abs_diff" + ("_px" if is_flow else "")] = diff
            report["heatmap_gate" if not is_flow else "flow_note"] = (
                f"<= {HEATMAP_GATE}" if not is_flow
                else "flow in px; gate applies to downstream heatmaps"
            )
            ok = diff <= (HEATMAP_GATE if not is_flow else 1e-2)
            if not is_flow and C == 5:
                tips = compare_tips(flax_out, torch_out)
                report.update(tips)
                ok = ok and tips["identical_detection_pattern"] \
                    and tips["tip_rmse_px"] <= TIP_RMSE_GATE
            report["within_gates"] = bool(ok)
    if torch_skipped is not None:
        report["torch_side"] = f"skipped: {torch_skipped}"
        report["within_gates"] = None  # nothing compared

    print(json.dumps(report, indent=1))
    if args.json:
        Path(args.json).write_text(json.dumps(report, indent=1))
    if report.get("within_gates") is False:
        sys.exit(1)


if __name__ == "__main__":
    main()
