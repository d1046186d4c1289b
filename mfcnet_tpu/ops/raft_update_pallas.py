"""Fused RAFT update iteration as one Pallas TPU kernel.

The flow-conditioned tracking path is floored by RAFT's 12 recurrent
update iterations at 1/8 resolution (30x40 for the tracker's 240x320
half-res input). Each iteration is 13 small convolutions (motion encoder
5, SepConvGRU 6, flow head 2) whose XLA lowering is RELAYOUT-bound at
this size: tools/raft_iter_probe.py measures the full iteration at
~0.53 ms (f32) while the sub-stages in isolation sum to ~0.15 ms and the
matmul FLOP floor is ~0.03 ms (bf16) — the difference is layout
transitions between conv ops that XLA cannot schedule away, and casting
to bf16 makes it WORSE (0.52 -> 0.82 ms: (16,128) tiling at 30x40).

Design (v2 — after measuring v1 at 0.27 ms/iter):
  * Token-major layout: every tensor is (N, C) with N = H8*W8 pixel
    rows per image and channels on lanes. Convolutions are shift-
    matmuls — for each tap (dy, dx), one static row-shift + boundary
    mask on the VPU, one MXU matmul (N, Cin) @ (Cin, Cout) accumulated
    in f32. No NHWC layouts exist anywhere; the recurrent state stays
    in VMEM for the whole update.
  * The two convs whose inputs exist BEFORE the kernel runs — convc1
    (1x1 on the corr lookup) and convf1 (7x7 on the 2-channel flow) —
    are hoisted to XLA in :func:`fused_update_step`. convf1's 49 taps
    on 2 channels were 98 of v1's 164 per-image kernel matmuls for <1%
    of the FLOPs (Mosaic issues ops serially, so op COUNT, not FLOPs,
    dominated), and hoisting convc1 makes the kernel's big input a
    clean 256-lane tensor needing no channel pad at the boundary.
  * Concat convs run as ONE matmul over a pre-concatenated weight
    matrix (wcv over [c2, f2]; each GRU gate over hx = [net, inp, y,
    flow] at 512 lanes), and the z/r gates share each shifted hx tap.
    75 matmuls + 56 shifts per image vs v1's 164 + 116.

Hard-won Mosaic constraints (each cost one compile attempt):
  * VMEM stack: a value-space `acc = acc + dot(...)` chain made Mosaic
    stack-allocate all tap partials at once (46.8 MB scoped);
    accumulating INTO an f32 scratch ref keeps each partial transient.
  * Double buffering: a grid=(B,) layout double-buffers even
    constant-index weight blocks (weights counted twice); a single
    program with a static Python loop over images keeps one copy.
  * Lane alignment: every ref slice must be 128-lane aligned — all
    channel counts are padded to multiples of 128 with zero-padded
    weights (so padded channels stay exactly zero through relu).
  * The default 16 MB scoped-vmem cap is far below the chip's real
    VMEM; CompilerParams(vmem_limit_bytes=100MB) admits the ~17 MB
    resident set.

Semantics target: torchvision raft_large's update block (the reference
loads it at scripts/train_multiframe_detection.py:77-83), i.e. exactly
``models/raft.py::UpdateBlock`` — parity pinned in tests/test_ops.py.
The corr-pyramid LOOKUP stays outside (XLA one-hot einsums, measured
0.08 ms/iter — already cheap), as does the final-iteration mask head and
convex upsample (they run once, not 12 times).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# weight order in the flattened kernel argument list. Shapes
# (taps, cin_padded, cout_padded) in compute dtype; biases
# (1, cout_padded) f32.
_WEIGHT_NAMES = (
    "wc2", "bc2",          # c1(256) -> 256p (192 real)
    "wf2", "bf2",          # f1(128) -> 128p (64 real)
    "wcv", "bcv",          # [c2(256p), f2(128p)] (384) -> 128p (126)
    # GRU gates x2 directions over hx = [net, inp, y, flow] (512 lanes;
    # the q gate's net rows multiply r*net instead)
    "wz_h", "bz_h", "wr_h", "br_h", "wq_h", "bq_h",
    "wz_v", "bz_v", "wr_v", "br_v", "wq_v", "bq_v",
    "wfl1", "bfl1",        # net(128) -> 256
    "wfl2", "bfl2",        # 256 -> 128p (2 real)
)

_T3 = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))
_T1x5 = tuple((0, dx) for dx in range(-2, 3))
_T5x1 = tuple((dy, 0) for dy in range(-2, 3))


def _pad_to(x, axis, size):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, size - x.shape[axis])
    return jnp.pad(x, pad) if pad[axis][1] else x


def _taps(tree, name):
    k = jnp.asarray(tree[name]["kernel"])
    kh, kw, ci, co = k.shape
    return k.reshape(kh * kw, ci, co)


def pack_update_weights(ub_params, compute_dtype=jnp.bfloat16):
    """update_block param tree (models/raft.py:194-208 naming) ->
    flat dict of matmul-ready, 128-lane-padded kernel weights (see
    module docstring; convc1/convf1 are consumed XLA-side by
    :func:`fused_update_step` and are not packed). Works on tracers;
    all padding is jnp with static shapes."""
    cdt = compute_dtype

    def bias(tree, name, cop):
        b = jnp.asarray(tree[name]["bias"])
        return _pad_to(b.reshape(1, -1), 1, cop).astype(jnp.float32)

    def pad_w(k, cip, cop):
        return _pad_to(_pad_to(k, 1, cip), 2, cop).astype(cdt)

    enc, gru = ub_params["encoder"], ub_params["gru"]
    wc2 = _taps(enc, "convc2")         # (9, 256, 192)
    wf2 = _taps(enc, "convf2")         # (9, 128, 64)
    wcv = _taps(enc, "conv")           # (9, 256, 126): rows 0:192 = c2,
    #                                     rows 192:256 = f2
    # wcv over the kernel's [c2(256p: 192 real), f2(128p: 64 real)]
    # concat: rows 0:192 real c2, 192:256 zero, 256:320 real f2 rows,
    # 320:384 zero
    wcv_cat = jnp.zeros((9, 384, 128), cdt)
    wcv_cat = wcv_cat.at[:, 0:192, :126].set(wcv[:, :192].astype(cdt))
    wcv_cat = wcv_cat.at[:, 256:320, :126].set(
        wcv[:, 192:256].astype(cdt)
    )
    out = {
        "wc2": pad_w(wc2, 256, 256), "bc2": bias(enc, "convc2", 256),
        "wf2": pad_w(wf2, 128, 128), "bf2": bias(enc, "convf2", 128),
        "wcv": wcv_cat, "bcv": bias(enc, "conv", 128),
    }

    # GRU gate weights over the 512-lane hx = [net(128), inp(128),
    # y(128p: 126 real), flow(128p: 2 real)]: original kernel rows
    # (5, 384, 128) laid out [net 0:128 | inp 128:256 | y 256:382 |
    # flow 382:384]
    for d in ("h", "v"):
        for g in ("z", "r", "q"):
            k = _taps(gru, f"conv{g}_{d}").astype(cdt)
            w = jnp.zeros((5, 512, 128), cdt)
            w = w.at[:, 0:256].set(k[:, 0:256])
            w = w.at[:, 256:382].set(k[:, 256:382])
            w = w.at[:, 384:386].set(k[:, 382:384])
            out[f"w{g}_{d}"] = w
            out[f"b{g}_{d}"] = bias(gru, f"conv{g}_{d}", 128)

    out["wfl1"] = _taps(ub_params, "flow1").astype(cdt)  # (9, 128, 256)
    out["bfl1"] = bias(ub_params, "flow1", 256)
    out["wfl2"] = pad_w(_taps(ub_params, "flow2"), 256, 128)
    out["bfl2"] = bias(ub_params, "flow2", 128)
    return out


def _update_kernel(c1_ref, f1_ref, inp_ref, net_ref, flow_ref, *refs,
                   B, H8, W8, N, cdt):
    """RAFT update from precomputed c1/f1 activations; single program,
    static loop over the B independent images."""
    wr = dict(zip(_WEIGHT_NAMES, refs[: len(_WEIGHT_NAMES)]))
    net_out_ref, delta_out_ref, accA, accB = refs[len(_WEIGHT_NAMES):]

    n_iota = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    col = n_iota % W8
    row = n_iota // W8  # per-image tokens: no batch modulo

    for b in range(B):
        _update_one_image(
            c1_ref.at[b], f1_ref.at[b], inp_ref.at[b], net_ref.at[b],
            flow_ref.at[b], wr, net_out_ref.at[b],
            delta_out_ref.at[b], accA, accB,
            col=col, row=row, H8=H8, W8=W8, N=N, cdt=cdt,
        )


def _update_one_image(c1_ref, f1_ref, inp_ref, net_ref, flow_ref, wr,
                      net_out_ref, delta_out_ref, accA, accB,
                      *, col, row, H8, W8, N, cdt):
    f32 = jnp.float32
    c1 = c1_ref[:]              # (N, 256) cdt, relu'd convc1 output
    f1 = f1_ref[:]              # (N, 128) cdt, relu'd convf1 output
    inp = inp_ref[:]            # (N, 128) cdt
    net = net_ref[:].astype(f32)
    fl = flow_ref[:]            # (N, 128) cdt, 2 real lanes

    def shifted(x, dy, dx):
        """x as an (H8, W8) image: out[n] = x[(y+dy, x+dx)] or 0. Row
        offset o = dy*W8 + dx lands on that pixel whenever the bounds
        hold, so one static slice + one mask implements the 2-D shift
        (pad rows beyond H8*W8 are zeros and always masked)."""
        o = dy * W8 + dx
        if o > 0:
            s = jnp.concatenate(
                [x[o:], jnp.zeros((o, x.shape[1]), x.dtype)], axis=0
            )
        elif o < 0:
            s = jnp.concatenate(
                [jnp.zeros((-o, x.shape[1]), x.dtype), x[:o]], axis=0
            )
        else:
            s = x
        mask = (
            (col + dx >= 0) & (col + dx < W8)
            & (row + dy >= 0) & (row + dy < H8)
        )
        return jnp.where(mask, s, jnp.zeros_like(s))

    def mm(x, w):
        return jax.lax.dot_general(
            x, w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    def conv(acc, lo, x, wname, bname, taps):
        """Σ_t shifted(x, t) @ w[t] + b into acc[:, lo:lo+co] (f32);
        returns the accumulated value."""
        w = wr[wname]
        co = w.shape[-1]
        sl = slice(lo, lo + co)
        acc[:, sl] = jnp.broadcast_to(wr[bname][:], (N, co))
        for t, (dy, dx) in enumerate(taps):
            xt = x if (dy == 0 and dx == 0) else shifted(x, dy, dx)
            acc[:, sl] += mm(xt, w[t])
        return acc[:, sl]

    relu = jax.nn.relu

    # ---- motion encoder tail (models/raft.py:157-166; c1/f1 hoisted)
    c2 = relu(conv(accA, 0, c1, "wc2", "bc2", _T3)).astype(cdt)
    f2 = relu(conv(accB, 0, f1, "wf2", "bf2", _T3)).astype(cdt)
    cf = jnp.concatenate([c2, f2], axis=-1)                 # (N, 384)
    y = relu(conv(accA, 0, cf, "wcv", "bcv", _T3)).astype(cdt)

    # ---- SepConvGRU (models/raft.py:169-191): horizontal then vertical
    for d, taps in (("h", _T1x5), ("v", _T5x1)):
        net_c = net.astype(cdt)
        hx = jnp.concatenate([net_c, inp, y, fl], axis=-1)  # (N, 512)
        # z -> accA[:, 0:128], r -> accA[:, 128:256]; the shifted hx
        # tap is computed once and feeds BOTH gates
        wz, wrr = wr[f"wz_{d}"], wr[f"wr_{d}"]
        accA[:, 0:128] = jnp.broadcast_to(wr[f"bz_{d}"][:], (N, 128))
        accA[:, 128:256] = jnp.broadcast_to(wr[f"br_{d}"][:], (N, 128))
        for t, (dy, dx) in enumerate(taps):
            xt = hx if (dy == 0 and dx == 0) else shifted(hx, dy, dx)
            accA[:, 0:128] += mm(xt, wz[t])
            accA[:, 128:256] += mm(xt, wrr[t])
        r = jax.nn.sigmoid(accA[:, 128:256])
        rhx = jnp.concatenate(
            [(r * net).astype(cdt), inp, y, fl], axis=-1
        )
        q = jnp.tanh(conv(accB, 0, rhx, f"wq_{d}", f"bq_{d}", taps))
        z = jax.nn.sigmoid(accA[:, 0:128])
        net = (1.0 - z) * net + z * q

    # ---- flow head (models/raft.py:202-205) ----
    fh = relu(conv(accA, 0, net.astype(cdt), "wfl1", "bfl1", _T3))
    delta = conv(accB, 0, fh.astype(cdt), "wfl2", "bfl2", _T3)

    net_out_ref[:] = net
    delta_out_ref[:] = delta  # (N, 128), 2 real lanes


@functools.partial(
    jax.jit,
    static_argnames=("H8", "W8", "compute_dtype", "interpret"),
)
def raft_update_pallas(c1, f1, inp, net, flow, packed, H8: int, W8: int,
                       compute_dtype=jnp.bfloat16,
                       interpret: bool | None = None):
    """The fused in-kernel part of one RAFT update step.

    c1 (B, H8, W8, 256) = relu(convc1(corr lookup)), f1 (B, H8, W8, 128)
    = relu(convf1(flow)) — both computed XLA-side (see
    :func:`fused_update_step`, which most callers want instead);
    inp/net (B, H8, W8, 128); flow (B, H8, W8, 2). Returns (net',
    delta) shaped like (net, flow). Matmuls run in ``compute_dtype``
    with f32 accumulation; the GRU state math is f32 throughout."""
    B = c1.shape[0]
    N = H8 * W8
    Np = -(-N // 8) * 8  # pad token rows to the f32 sublane tile
    cdt = compute_dtype

    def tok(x, lanes, to_cdt=True):
        x = x.reshape(B, N, x.shape[-1])
        if Np != N or lanes != x.shape[-1]:
            x = jnp.pad(
                x, ((0, 0), (0, Np - N), (0, lanes - x.shape[-1]))
            )
        return x.astype(cdt if to_cdt else jnp.float32)

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    kernel = functools.partial(
        _update_kernel, B=B, H8=H8, W8=W8, N=Np, cdt=cdt
    )
    weights = [packed[k] for k in _WEIGHT_NAMES]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    net2, delta = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, 128), jnp.float32),
        ),
        in_specs=[vmem] * (5 + len(weights)),
        out_specs=(vmem, vmem),
        scratch_shapes=[
            pltpu.VMEM((Np, 256), jnp.float32),  # accA
            pltpu.VMEM((Np, 256), jnp.float32),  # accB
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tok(c1, 256), tok(f1, 128), tok(inp, 128),
      tok(net, 128, to_cdt=False), tok(flow, 128), *weights)
    net2 = net2[:, :N].reshape(B, H8, W8, 128)
    delta = delta[:, :N, :2].reshape(B, H8, W8, 2)
    return net2, delta


def fused_update_step(ub_params, packed, corr, inp, net, flow,
                      compute_dtype=jnp.bfloat16,
                      interpret: bool | None = None,
                      max_tokens: int = 9600):
    """One full RAFT update step == ``UpdateBlock()(net, inp, corr,
    flow)`` minus the mask head: XLA-side convc1 (1x1 matmul on the
    lookup) + convf1 (7x7 conv on the 2-channel flow), then the fused
    Pallas kernel for everything else."""
    cdt = compute_dtype
    enc = ub_params["encoder"]
    B, H8, W8, _ = corr.shape
    # VMEM stack budget: the kernel holds its token-major state in
    # VMEM; the tracker's 2x1200 tokens fit trivially, but the
    # frozen-flow TRAIN step runs full-resolution batched pairs
    # (8 x 4800 tokens hit a 122 MB stack vs the 100 MB scoped limit,
    # and even 5 x 4800 still overflowed — the stack is NOT linear in
    # tokens; 9600 is the measured-safe budget). Chunk the batch axis
    # so each kernel invocation stays under it — outputs are
    # concatenated, values identical (the kernel is per-token).
    if B > 1 and B * H8 * W8 > max_tokens:
        cb = max(1, max_tokens // (H8 * W8))
        nets, deltas = [], []
        for s in range(0, B, cb):
            nc, dc = fused_update_step(
                ub_params, packed, corr[s : s + cb], inp[s : s + cb],
                net[s : s + cb], flow[s : s + cb],
                compute_dtype=compute_dtype, interpret=interpret,
                max_tokens=max_tokens,
            )
            nets.append(nc)
            deltas.append(dc)
        return (
            jnp.concatenate(nets, axis=0),
            jnp.concatenate(deltas, axis=0),
        )

    wc1 = jnp.asarray(enc["convc1"]["kernel"])[0, 0].astype(cdt)
    c1 = jax.nn.relu(
        jnp.einsum(
            "bhwc,co->bhwo", corr.astype(cdt), wc1,
            preferred_element_type=jnp.float32,
        ) + jnp.asarray(enc["convc1"]["bias"], jnp.float32)
    )

    kf1 = jnp.asarray(enc["convf1"]["kernel"]).astype(cdt)
    dn = jax.lax.conv_dimension_numbers(
        (B, H8, W8, 2), kf1.shape, ("NHWC", "HWIO", "NHWC")
    )
    f1 = jax.nn.relu(jax.lax.conv_general_dilated(
        flow.astype(cdt), kf1, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ) + jnp.asarray(enc["convf1"]["bias"], jnp.float32))

    return raft_update_pallas(
        c1, f1, inp, net, flow, packed, H8, W8,
        compute_dtype=cdt, interpret=interpret,
    )


def fused_flow_from_features(variables, f1, f2, net, inp,
                             iters: int = 12, corr_levels: int = 4,
                             corr_radius: int = 4,
                             compute_dtype=jnp.bfloat16,
                             interpret: bool | None = None):
    """RAFT.flow_from_features with the fused Pallas update step.

    Drop-in for ``model.apply(variables, f1, f2, net, inp,
    method="flow_from_features")`` (models/raft.py:270-291): same
    pyramid, same lookup, same final mask head + convex upsample — only
    the 12 update iterations run through :func:`fused_update_step`.
    """
    from mfcnet_tpu.models.raft import (
        build_corr_pyramid,
        build_patch_pyramid,
        convex_upsample,
        lookup_corr_patches,
    )

    pyramid = build_corr_pyramid(f1, f2, corr_levels)
    patches = build_patch_pyramid(pyramid, f1.shape[1:3], corr_radius)
    B, H8, W8, _ = f1.shape
    xs = jnp.arange(W8, dtype=jnp.float32)
    ys = jnp.arange(H8, dtype=jnp.float32)
    coords0 = jnp.stack(
        jnp.meshgrid(xs, ys, indexing="xy"), axis=-1
    )[None].repeat(B, axis=0)

    ub = variables["params"]["update_block"]
    packed = pack_update_weights(ub, compute_dtype)
    net = net.astype(jnp.float32)
    inp = inp.astype(jnp.float32)
    flow = jnp.zeros((B, H8, W8, 2), jnp.float32)
    for _ in range(iters):
        corr = lookup_corr_patches(
            patches, pyramid, coords0 + flow, corr_radius
        )
        net, delta = fused_update_step(
            ub, packed, corr, inp, net, flow,
            compute_dtype=compute_dtype, interpret=interpret,
        )
        flow = flow + delta

    # final-iteration mask head (runs once; XLA convs are fine here)
    dn = jax.lax.conv_dimension_numbers(
        net.shape, ub["mask1"]["kernel"].shape, ("NHWC", "HWIO", "NHWC")
    )
    m = jax.nn.relu(jax.lax.conv_general_dilated(
        net, jnp.asarray(ub["mask1"]["kernel"], jnp.float32),
        (1, 1), "SAME", dimension_numbers=dn,
    ) + jnp.asarray(ub["mask1"]["bias"], jnp.float32))
    dn2 = jax.lax.conv_dimension_numbers(
        m.shape, ub["mask2"]["kernel"].shape, ("NHWC", "HWIO", "NHWC")
    )
    mask = (jax.lax.conv_general_dilated(
        m, jnp.asarray(ub["mask2"]["kernel"], jnp.float32),
        (1, 1), "SAME", dimension_numbers=dn2,
    ) + jnp.asarray(ub["mask2"]["bias"], jnp.float32)) * 0.25
    return convex_upsample(flow, mask)
