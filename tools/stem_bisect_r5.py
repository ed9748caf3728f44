"""Bisect which Mosaic construct crashes the fused stem kernel (r5).

Each probe runs in its OWN subprocess: the failure mode is a hard abort in
the Mosaic compiler (layout.h check), which kills the process and can take
the TPU tunnel down for ~10 minutes — so after any non-zero exit we wait
for the chip to answer a trivial matmul before the next probe.

Run: python tools/stem_bisect_r5.py  (writes tools/stem_bisect_r5.log)
"""

import subprocess
import sys
import time

LOG = "tools/stem_bisect_r5.log"

COMMON = """
import sys
sys.path.insert(0, '/root/repo')
import functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np
import os, functools as ft
INTERP = os.environ.get('BISECT_INTERP') == '1'
assert INTERP or jax.default_backend() == 'tpu', jax.default_backend()
PC = ft.partial(pl.pallas_call, interpret=INTERP)

K, PAD, C = 7, 3, 64
N, H, W = 2, 32, 32
HP, WP = H + 2 * PAD, W + 2 * PAD
rng = np.random.default_rng(0)
xp = jnp.asarray(rng.normal(size=(N, 3, HP, WP)), jnp.bfloat16)
w2p = jnp.asarray(rng.normal(size=(148, C)) * 0.1, jnp.bfloat16)


def taps(x, h, w):
    for dr in range(K):
        for dc in range(K):
            yield jax.lax.slice(x, (0, dr, dc), (3, dr + h, dc + w))


def conv(x, w2):
    t = list(taps(x, H, W))
    t.append(jnp.ones((1, H, W), x.dtype))
    p = jnp.concatenate(t, axis=0)
    return jax.lax.dot_general(
        w2, p, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


IMG = pl.BlockSpec((1, 3, HP, WP), lambda i: (i, 0, 0, 0),
                   memory_space=pltpu.VMEM)
OUT = pl.BlockSpec((1, C, H, W), lambda i: (i, 0, 0, 0),
                   memory_space=pltpu.VMEM)
WSP = pl.BlockSpec((148, C), lambda i: (0, 0), memory_space=pltpu.VMEM)


def run(kernel, extra_in=(), extra_specs=()):
    f = PC(
        kernel, grid=(N,),
        in_specs=[IMG, WSP, *extra_specs],
        out_specs=OUT,
        out_shape=jax.ShapeDtypeStruct((N, C, H, W), jnp.bfloat16))
    y = jax.jit(f)(xp, w2p, *extra_in)
    jax.block_until_ready(y)
    print('OK', y.shape, bool(jnp.isfinite(y.astype(jnp.float32)).all()))
"""

PROBES = {
    # 1: concat 50 taps + rank-3 dot_general, store planar
    "p1_conv_only": COMMON + """
def k(x_ref, w_ref, o_ref):
    o_ref[0] = conv(x_ref[0], w_ref[:]).astype(o_ref.dtype)
run(k)
""",
    # 2: + relu
    "p2_conv_relu": COMMON + """
def k(x_ref, w_ref, o_ref):
    y = conv(x_ref[0], w_ref[:])
    o_ref[0] = jnp.maximum(y, 0.0).astype(o_ref.dtype)
run(k)
""",
    # 3: + IN via CHAINED single-axis keepdims reductions (lane, then sublane)
    "p3_in_chained": COMMON + """
def k(x_ref, w_ref, o_ref):
    y = conv(x_ref[0], w_ref[:])
    hw = H * W
    s1 = jnp.sum(y, axis=2, keepdims=True)            # [C, H, 1]
    mean = jnp.sum(s1, axis=1, keepdims=True) / hw    # [C, 1, 1]
    q1 = jnp.sum(y * y, axis=2, keepdims=True)
    m2 = jnp.sum(q1, axis=1, keepdims=True) / hw
    var = jnp.maximum(m2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + 1e-5)
    o_ref[0] = jnp.maximum((y - mean) * rstd, 0.0).astype(o_ref.dtype)
run(k)
""",
    # 4: + IN via the CURRENT two-axis keepdims reduction
    "p4_in_twoaxis": COMMON + """
def k(x_ref, w_ref, o_ref):
    y = conv(x_ref[0], w_ref[:])
    hw = H * W
    mean = jnp.sum(y, axis=(1, 2), keepdims=True) / hw
    m2 = jnp.sum(y * y, axis=(1, 2), keepdims=True) / hw
    var = jnp.maximum(m2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + 1e-5)
    o_ref[0] = jnp.maximum((y - mean) * rstd, 0.0).astype(o_ref.dtype)
run(k)
""",
    # 5: bwd building blocks — per-tap dW contraction [3,H,W]x[C,H,W]->[3,C]
    "p5_dw_taps": COMMON + """
def k(x_ref, w_ref, g_ref, o_ref, dw_ref):
    i = pl.program_id(0)
    x = x_ref[0]
    gc = g_ref[0]
    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
    parts = []
    for sl in taps(x, H, W):
        parts.append(jax.lax.dot_general(
            sl, gc, dimension_numbers=(((1, 2), (1, 2)), ((), ())),
            preferred_element_type=jnp.float32))
    parts.append(jax.lax.dot_general(
        jnp.ones((1, H, W), gc.dtype), gc,
        dimension_numbers=(((1, 2), (1, 2)), ((), ())),
        preferred_element_type=jnp.float32))
    dw_ref[:] += jnp.concatenate(parts, axis=0)
    o_ref[0] = gc

g = jnp.asarray(rng.normal(size=(N, C, H, W)), jnp.bfloat16)
f = PC(
    k, grid=(N,),
    in_specs=[IMG, WSP, OUT],
    out_specs=(OUT, pl.BlockSpec((148, C), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)),
    out_shape=(jax.ShapeDtypeStruct((N, C, H, W), jnp.bfloat16),
               jax.ShapeDtypeStruct((148, C), jnp.float32)))
y, dw = jax.jit(f)(xp, w2p, g)
jax.block_until_ready(dw)
print('OK', dw.shape, bool(jnp.isfinite(dw).all()))
""",
    # 6: bwd dX rotate-accumulate via .at[].add with static offsets
    "p6_dx_rotacc": COMMON + """
def k(x_ref, w_ref, g_ref, dx_ref):
    gc = g_ref[0]
    w2 = w_ref[:]
    acc = jnp.zeros((3, HP, WP), jnp.float32)
    t = 0
    for dr in range(K):
        for dc in range(K):
            wt = jax.lax.slice(w2, (3 * t, 0), (3 * t + 3, C))
            dpt = jax.lax.dot_general(
                wt, gc, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc.at[:, dr:dr + H, dc:dc + W].add(dpt)
            t += 1
    dx_ref[0] = acc.astype(dx_ref.dtype)

g = jnp.asarray(rng.normal(size=(N, C, H, W)), jnp.bfloat16)
f = PC(
    k, grid=(N,),
    in_specs=[IMG, WSP, OUT],
    out_specs=IMG,
    out_shape=jax.ShapeDtypeStruct((N, 3, HP, WP), jnp.bfloat16))
dx = jax.jit(f)(xp, w2p, g)
jax.block_until_ready(dx)
print('OK', dx.shape, bool(jnp.isfinite(dx.astype(jnp.float32)).all()))
""",
    # 9: variant-C conv — dot_general(p, w2p) -> [H, W, C] (channels on
    # lanes, the PROVEN norm-kernel layout), conv only
    "p9_convC_hwc": COMMON + """
OUTC = pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM)
def k(x_ref, w_ref, o_ref):
    x = x_ref[0]
    t = list(taps(x, H, W))
    t.append(jnp.ones((1, H, W), x.dtype))
    p = jnp.concatenate(t, axis=0)
    y = jax.lax.dot_general(
        p, w_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [H, W, C]
    o_ref[0] = y.astype(o_ref.dtype)
f = PC(
    k, grid=(N,), in_specs=[IMG, WSP], out_specs=OUTC,
    out_shape=jax.ShapeDtypeStruct((N, H, W, C), jnp.bfloat16))
y = jax.jit(f)(xp, w2p)
jax.block_until_ready(y)
print('OK', y.shape, bool(jnp.isfinite(y.astype(jnp.float32)).all()))
""",
    # 10: variant-C full — [H, W, C] conv + IN stats reducing to [1, 1, C]
    # (lanes preserved, the norm_kernels.py idiom) + relu
    "p10_fullC_hwc_in": COMMON + """
OUTC = pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM)
def k(x_ref, w_ref, o_ref):
    x = x_ref[0]
    t = list(taps(x, H, W))
    t.append(jnp.ones((1, H, W), x.dtype))
    p = jnp.concatenate(t, axis=0)
    y = jax.lax.dot_general(
        p, w_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [H, W, C]
    hw = H * W
    mean = jnp.sum(y, axis=(0, 1), keepdims=True) / hw    # [1, 1, C]
    m2 = jnp.sum(y * y, axis=(0, 1), keepdims=True) / hw
    var = jnp.maximum(m2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + 1e-5)
    o_ref[0] = jnp.maximum((y - mean) * rstd, 0.0).astype(o_ref.dtype)
f = PC(
    k, grid=(N,), in_specs=[IMG, WSP], out_specs=OUTC,
    out_shape=jax.ShapeDtypeStruct((N, H, W, C), jnp.bfloat16))
y = jax.jit(f)(xp, w2p)
jax.block_until_ready(y)
print('OK', y.shape, bool(jnp.isfinite(y.astype(jnp.float32)).all()))
""",
    # 11: in-kernel transpose [C, H, W] -> [H, W, C] after the planar dot
    "p11_transpose_chw_hwc": COMMON + """
OUTC = pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM)
def k(x_ref, w_ref, o_ref):
    y = conv(x_ref[0], w_ref[:])                          # [C, H, W]
    o_ref[0] = jnp.transpose(y, (1, 2, 0)).astype(o_ref.dtype)
f = PC(
    k, grid=(N,), in_specs=[IMG, WSP], out_specs=OUTC,
    out_shape=jax.ShapeDtypeStruct((N, H, W, C), jnp.bfloat16))
y = jax.jit(f)(xp, w2p)
jax.block_until_ready(y)
print('OK', y.shape, bool(jnp.isfinite(y.astype(jnp.float32)).all()))
""",
    # 7: full current fwd (norm=in) via the real module, tiny shape
    "p7_module_fwd_tiny": """
import sys
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
import numpy as np
from dwcgan_tpu.ops.pallas.stem_kernels import stem_conv7
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.1, jnp.float32)
b = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)
y = jax.jit(lambda x, w, b: stem_conv7(x, w, b, 'in', 'relu', 'reflect'))(x, w, b)
jax.block_until_ready(y)
print('OK', y.shape, bool(jnp.isfinite(y.astype(jnp.float32)).all()))
""",
    # 8: full current bwd via the real module, tiny shape
    "p8_module_bwd_tiny": """
import sys
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
import numpy as np
from dwcgan_tpu.ops.pallas.stem_kernels import stem_conv7
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.1, jnp.float32)
b = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)
def loss(x, w, b):
    return jnp.sum(stem_conv7(x, w, b, 'in', 'relu', 'reflect').astype(jnp.float32) ** 2)
dx, dw, db = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(x, w, b)
jax.block_until_ready(dx)
print('OK', dx.shape, dw.shape, db.shape,
      bool(jnp.isfinite(dx.astype(jnp.float32)).all() & jnp.isfinite(dw).all()))
""",
}


def log(msg):
    line = f"[{time.strftime('%H:%M:%SZ', time.gmtime())}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def wait_tpu():
    probe = ("import jax, jax.numpy as jnp;"
             "assert float((jnp.ones((64,64))@jnp.ones((64,64))).sum())"
             " == 64.0**3")
    while True:
        r = subprocess.run([sys.executable, "-c", probe],
                           capture_output=True, timeout=330)
        if r.returncode == 0:
            log("tpu up")
            return
        log("tpu down, waiting 60s")
        time.sleep(60)


def main():
    only = sys.argv[1:] or list(PROBES)
    for name in only:
        wait_tpu()
        log(f"probe {name} start")
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", PROBES[name]],
                               capture_output=True, text=True, timeout=420)
            tail = (r.stdout + r.stderr).strip().splitlines()[-6:]
            log(f"probe {name} exit={r.returncode} {time.time()-t0:.0f}s")
            for ln in tail:
                log(f"  | {ln}")
        except subprocess.TimeoutExpired:
            log(f"probe {name} TIMEOUT {time.time()-t0:.0f}s")
    log("bisect done")


if __name__ == "__main__":
    main()
