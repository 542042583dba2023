"""Winograd F(2x2, 3x3) convolution for lane-limited 3x3 convs.

Motivation (PERF.md "lane analysis"): the flagship HRNetV2-nodownsp encoder
(/root/reference/models/hrnetv2_nodownsp.py:279-443) spends ~60 % of its
FLOPs in 64-channel 3x3 stride-1 convs at 80x80. The MXU is 128 output
lanes wide, so those convs are capped at ~50 % utilization no matter how
XLA schedules them. Winograd F(2x2,3x3) attacks the *MAC count* instead of
the lane geometry: each 2x2 output tile costs 16 multiplies instead of 36
(2.25x fewer), at the price of cheap elementwise input/output transforms.

    Y = A^T [ (G w G^T) (.) (B^T d B) ] A          (Lavin & Gray, 2015)

with the standard F(2,3) matrices

    B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
    G   = [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]]
    A^T = [[1,1,1,0],[0,1,-1,-1]]

Mapping to the TPU: the 16 transform points become a batched matmul
``[16, B*T, C] @ [16, C, K]`` that the MXU executes directly; the
input/output transforms are strided-slice adds that XLA fuses into
neighbouring elementwise work. All ops are differentiable, so the same
path serves training.

Numerics: F(2,3) transform magnitudes are small (max |B^T|-row sum = 2),
so the reassociation error in bf16 is comparable to the conv itself;
the weight transform runs in f32 and is cast once. Exactness vs
``lax.conv_general_dilated`` is pinned by tests/test_winograd.py.

MEASURED RESULT (benchmarks/winograd_probe.py, real chip): a 16-layer
64-ch conv+BN+ReLU stack at 80x80 b8 runs 0.89 ms with XLA's direct conv
vs 7.61 ms with this kernel — an **8.5x in-context loss**. The input/
output transforms are 16 tensor-sized strided-slice copies of HBM traffic
that swamp the 2.25x MAC saving, and the 16-point batched matmul is still
N=64 lane-limited. Like TPU.conv_pack (models/layers.py), this is kept as
a correctness-tested, reproducible negative: the flagship encoder's
64-channel geometry is bounded by MXU lane width, not by MAC count or XLA
scheduling. NOT wired into any model path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_G = np.array(
    [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]],
    np.float32,
)


def winograd_weights(kernel) -> jnp.ndarray:
    """Transform a [3,3,cin,cout] conv kernel to Winograd domain [16,cin,cout].

    Runs in f32 regardless of input dtype (the transform is tiny — one pass
    over the weights) and returns f32; cast at the call site.
    """
    kh, kw = kernel.shape[:2]
    assert (kh, kw) == (3, 3), f"winograd_weights needs a 3x3 kernel, got {kernel.shape}"
    g = jnp.asarray(_G)
    # precision='highest': on TPU the default matmul precision is bf16, which
    # would put ~1e-3 relative error into every U entry; the transform is one
    # tiny pass over the weights, so full-f32 MXU passes are free here.
    u = jnp.einsum(
        "ai,ijck,bj->abck", g, kernel.astype(jnp.float32), g, precision="highest"
    )
    return u.reshape((16,) + u.shape[2:])


def winograd_conv3x3(x, kernel, *, u=None):
    """3x3 stride-1 pad-1 conv of NHWC ``x`` via Winograd F(2x2,3x3).

    Equivalent to ``lax.conv_general_dilated(x, kernel, (1,1), ((1,1),(1,1)))``
    for even H and W. ``u`` optionally supplies a pre-transformed
    [16,cin,cout] weight (see :func:`winograd_weights`) to hoist the weight
    transform out of a serving loop; otherwise it is computed in-graph
    (XLA hoists it when the kernel is loop-invariant).
    """
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, f"winograd needs even H,W, got {(h, w)}"
    k = kernel.shape[-1]
    th, tw = h // 2, w // 2
    if u is None:
        u = winograd_weights(kernel)
    u = u.astype(x.dtype)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # rows[i] = xp rows (2t + i) for tile index t — [4, B, TH, W+2, C]
    rows = jnp.stack([xp[:, i : i + 2 * th : 2] for i in range(4)])
    r0, r1, r2, r3 = rows
    # B^T along H
    bh = jnp.stack([r0 - r2, r1 + r2, r2 - r1, r1 - r3])  # [4h, B, TH, W+2, C]
    cols = jnp.stack([bh[:, :, :, j : j + 2 * tw : 2] for j in range(4)])
    c0, c1, c2, c3 = cols  # each [4h, B, TH, TW, C]
    # B^T along W -> V[a(h), b(w), B, TH, TW, C]
    v = jnp.stack([c0 - c2, c1 + c2, c2 - c1, c1 - c3], axis=1)

    vm = v.reshape(16, b * th * tw, c)
    m = jnp.einsum("pmc,pck->pmk", vm, u)  # the MXU batched matmul
    m = m.reshape(4, 4, b, th, tw, k)

    # A^T along H (axis 0): [2, 4, ...]
    ah = jnp.stack([m[0] + m[1] + m[2], m[1] - m[2] - m[3]])
    # A^T along W (axis 1): [2, 2, B, TH, TW, K]
    y = jnp.stack([ah[:, 0] + ah[:, 1] + ah[:, 2], ah[:, 1] - ah[:, 2] - ah[:, 3]], axis=1)

    # interleave tiles: [2h, 2w, B, TH, TW, K] -> [B, TH, 2h, TW, 2w, K]
    y = y.transpose(2, 3, 0, 4, 1, 5).reshape(b, h, w, k)
    return y
