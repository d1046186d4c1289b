"""Microbenchmark: XLA direct 3x3 conv vs Winograd F(2x2,3x3) via batched matmul.

Motivation (docs/PERFORMANCE.md): XLA's convs run at 40-60 TFLOP/s on the
TernausNet stages while a large matmul reaches 156 TFLOP/s on the same chip.
The round-3 conv3x3_pallas experiment showed the small-cout stages sit at the
N-padded MXU floor -- which Winograd cannot beat (it pads BOTH K=cin and
N=cout to 128). But the wide stages (cin, cout >= 128: dec4/dec3/dec2 convs,
encoder conv3-conv5) fill both lane dimensions, where F(2x2,3x3)'s 2.25x MAC
reduction maps to full-lane batched matmuls.

Winograd F(2x2,3x3): output in 2x2 tiles; each tile reads a 4x4 input patch
(stride 2). With transforms B^T d B (data, +/-1 coeffs), G g G^T (weights,
exact halves), A^T M A (output, +/-1):
    y = A^T [ (G g G^T) . (B^T d B) ] A        elementwise over 16 components
Each of the 16 components is an (N*tiles, cin) @ (cin, cout) matmul.

Run:  python tools/winograd_probe.py [--dtype bfloat16] [--iters 60]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

# F(2x2, 3x3) transform matrices (exact in binary floating point).
BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def winograd_conv3x3(x, w, accum_dtype=jnp.float32, transform_dtype=None):
    """3x3 SAME conv via Winograd F(2x2,3x3). x: (N,H,W,Ci) w: (3,3,Ci,Co).

    H and W must be even. Matmul dtype follows x; transforms run in
    ``transform_dtype`` (default x.dtype) — pass float32 to keep the
    +/-add transform chains full-precision and cast only at the matmul.
    """
    out_dtype = x.dtype
    matmul_dtype = x.dtype
    if transform_dtype is not None:
        x = x.astype(transform_dtype)
    N, H, W, Ci = x.shape
    Co = w.shape[-1]
    tH, tW = H // 2, W // 2
    # SAME padding for 3x3 plus one extra row/col so every 4x4 tile exists:
    # padded (H+2, W+2) -> tiles index 2ty+a for a<4 needs H+2 rows. OK.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # d[a,b]: (N, tH, tW, Ci) strided views
    d = [
        [xp[:, a : a + 2 * tH : 2, b : b + 2 * tW : 2, :] for b in range(4)]
        for a in range(4)
    ]
    # V[i,j] = sum_a sum_b BT[i,a] BT[j,b] d[a,b]  (coeffs 0/+1/-1)
    def bt_combine(vec4):
        # returns [v0-v2, v1+v2, v2-v1, v1-v3]
        return [
            vec4[0] - vec4[2],
            vec4[1] + vec4[2],
            vec4[2] - vec4[1],
            vec4[1] - vec4[3],
        ]

    t1 = [bt_combine([d[a][b] for b in range(4)]) for a in range(4)]  # [a][j]
    V = [bt_combine([t1[a][j] for a in range(4)]) for j in range(4)]  # [j][i]
    V = jnp.stack(
        [jnp.stack([V[j][i] for j in range(4)]) for i in range(4)]
    )  # (4,4,N,tH,tW,Ci)
    # U[i,j] = G w G^T over the spatial taps: (4,4,Ci,Co)
    U = jnp.einsum("ip,jq,pqco->ijco", G, G, w.astype(jnp.float32))
    U = U.astype(matmul_dtype)
    V = V.reshape(4, 4, N * tH * tW, Ci).astype(matmul_dtype)
    M = jnp.einsum(
        "ijpc,ijco->ijpo", V, U, preferred_element_type=accum_dtype
    )
    M = M.astype(x.dtype).reshape(4, 4, N, tH, tW, Co)
    # Y[u,v] = sum_i sum_j AT[u,i] AT[v,j] M[i,j]
    def at_combine(vec4):
        return [vec4[0] + vec4[1] + vec4[2], vec4[1] - vec4[2] - vec4[3]]

    t2 = [at_combine([M[i, j] for j in range(4)]) for i in range(4)]  # [i][v]
    Y = [at_combine([t2[i][v] for i in range(4)]) for v in range(2)]  # [v][u]
    # interleave 2x2 tiles back to (N, H, W, Co)
    y = jnp.stack(
        [jnp.stack([Y[v][u] for v in range(2)], axis=3) for u in range(2)],
        axis=2,
    )  # (N, tH, 2, tW, 2, Co)
    return y.reshape(N, H, W, Co).astype(out_dtype)


def direct_conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def timed(fn, x, w, iters):
    """Scan-loop timing: per-iter cost with dispatch amortized; a dependency
    chain through x (scaled re-use) prevents DCE."""

    @jax.jit
    def loop(x, w):
        def body(c, _):
            y = fn(c, w)
            # feed a same-shape function of y back as the next input
            reps = -(-x.shape[-1] // y.shape[-1])  # ceil
            c = jnp.concatenate([y] * reps, -1)[..., : x.shape[-1]]
            return c * 1e-3, y.mean()
        c, ms = jax.lax.scan(body, x, None, length=iters)
        return c.sum() + ms.sum()

    loop(x, w).block_until_ready()
    t0 = time.perf_counter()
    loop(x, w).block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)

    shapes = [
        # (H, W, Ci, Co)  -- the wide TernausNet16 stages @480x640
        (60, 80, 768, 512),    # dec4 conv
        (120, 160, 512, 256),  # dec3 conv
        (240, 320, 192, 128),  # dec2 conv
        (120, 160, 256, 256),  # encoder conv3
        (60, 80, 512, 512),    # encoder conv4/5
        (30, 40, 768, 512),    # dec5 conv
        (480, 640, 64, 64),    # control: lane-starved stage (expect no win)
    ]
    key = jax.random.PRNGKey(0)
    print(f"dtype={dt}  iters={args.iters}")
    for H, W, Ci, Co in shapes:
        kx, kw = jax.random.split(jax.random.fold_in(key, H * W + Ci))
        x = jax.random.normal(kx, (1, H, W, Ci), dt)
        w = jax.random.normal(kw, (3, 3, Ci, Co), dt) / float(np.sqrt(9 * Ci))
        # numerics check in this dtype
        import functools

        wino_mixed = functools.partial(
            winograd_conv3x3, transform_dtype=jnp.float32
        )
        # f32 ground truth for the error column (TPU f32 conv itself uses
        # reduced-precision passes, so compare both candidates to the
        # HIGHEST-precision f32 conv)
        ref = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.float32)
        scale = float(jnp.max(jnp.abs(ref)))
        errs = {}
        for name, fn in (
            ("direct", direct_conv3x3),
            ("wino", winograd_conv3x3),
            ("wino_f32t", wino_mixed),
        ):
            errs[name] = float(
                jnp.max(jnp.abs(fn(x, w).astype(jnp.float32) - ref))
            )
        td = timed(direct_conv3x3, x, w, args.iters)
        tw = timed(winograd_conv3x3, x, w, args.iters)
        tm = timed(wino_mixed, x, w, args.iters)
        fl = 2 * 9 * H * W * Ci * Co
        print(
            f"({H:4d},{W:4d},{Ci:4d}->{Co:4d})"
            f"  direct {td*1e3:7.3f} ms ({fl/td/1e12:5.1f} TF/s"
            f" err {errs['direct']:.1e})"
            f"  wino {tw*1e3:7.3f} ms ({td/tw:4.2f}x err {errs['wino']:.1e})"
            f"  wino_f32t {tm*1e3:7.3f} ms ({td/tm:4.2f}x"
            f" err {errs['wino_f32t']:.1e})  max|y| {scale:.2f}"
        )


if __name__ == "__main__":
    main()
